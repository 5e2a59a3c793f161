"""Facade robustness: every unary verb keeps the JSON error contract.

The serving contract (runtime/server.py): malformed or hostile payloads
come back as JSON `{"error": ...}` (or a harmless default for the verbs
that ignore their payload) — NEVER a raw exception surfacing as gRPC
UNKNOWN.  This fuzzes all unary verbs with a pile of adversarial payloads
straight against the servicer handlers (no socket needed — the gRPC layer
adds nothing to payload handling).
"""

import json

import numpy as np
import pytest

from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
from rs_face_detection_tpu.runtime.server import FacePipelineServicer

PAYLOADS = [
    b"",
    b"not json at all",
    b"\xff\xfe\x00garbage\x80",
    b"[]",
    b"42",
    b'"string"',
    b"{}",
    b'{"name": 17}',
    b'{"name": null}',
    b'{"name": {"nested": true}}',
    b'{"name": "nonexistent_model"}',
    b'{"unrelated": "field"}',
    json.dumps({"name": "m", "input": "!!!notbase64!!!"}).encode(),
    json.dumps({"name": "m", "input": "AAAA"}).encode(),  # b64 but not .npy
    json.dumps(
        {"name": "m", "input_shm": {"region": 5, "offset": "x"}}
    ).encode(),
    json.dumps({"name": "m", "input_shm": {}}).encode(),
    json.dumps({"card": "AAAA", "selfie": None}).encode(),
    json.dumps({"action": ["start"]}).encode(),
    json.dumps({"key": "../../etc/passwd", "name": "r", "byte_size": 1}).encode(),
    json.dumps({"key": "nope", "name": "r", "byte_size": -4}).encode(),
    json.dumps({"images": "notalist"}).encode(),
]

# Verbs whose happy path needs a built pipeline; with registry-only wiring
# they must still fail CLEANLY (JSON error), not crash the handler.
UNARY_VERBS = [
    "extract",
    "detect",
    "server_live",
    "server_ready",
    "model_ready",
    "model_config",
    "repository_index",
    "repository_model_load",
    "repository_model_unload",
    "model_statistics",
    "model_infer",
    "server_metadata",
    "model_metadata",
    "trace_setting",
    "ekyc_verify",
    "system_shared_memory_register",
    "system_shared_memory_status",
    "system_shared_memory_unregister",
    "cuda_shared_memory_register",
    "cuda_shared_memory_status",
    "cuda_shared_memory_unregister",
]


@pytest.fixture(scope="module")
def servicer():
    reg = ModelRegistry()

    def builder():
        spec = ModelSpec("m", (4,), "array")

        class M:
            def apply(self, variables, x, train=False):
                return np.asarray(x) * 1.0

        return spec, M(), {}

    reg.register_builder("m", builder)
    return FacePipelineServicer(None, reg)


@pytest.mark.parametrize("verb", UNARY_VERBS)
def test_unary_verbs_never_raise(servicer, verb):
    handler = getattr(servicer, verb)
    for payload in PAYLOADS:
        try:
            out = handler(payload)
        except Exception as e:  # noqa: BLE001 — the point of the test
            pytest.fail(f"{verb} raised on {payload[:40]!r}: {e!r}")
        # Every response must be valid JSON bytes (the wire contract).
        decoded = json.loads(out)
        assert isinstance(decoded, (dict, list)), (verb, payload, decoded)


def test_detect_stream_bad_payloads(servicer):
    """The stream reports a JSON error and terminates — no exception."""
    chunks = list(servicer.detect_stream(iter([b"\x00\x01notanimage"])))
    assert chunks, "stream yielded nothing"
    last = json.loads(chunks[-1])
    assert "error" in last

"""Triton wire-protocol tests: codec goldens vs protoc, service E2E.

Three layers of evidence that runtime/wire.py speaks genuine protobuf:

  1. hand-computed byte goldens for the proto3 primitives (no tooling);
  2. `protoc --encode` cross-checks: the same logical messages rendered to
     bytes by the real protobuf compiler from tests/fixtures/
     triton_subset.proto must match our encoder byte-for-byte, and our
     decoder must read protoc's bytes back (skipped when protoc is absent);
  3. a live gRPC round trip: TritonWireClient -> serve(triton_wire=True)
     runs detect/quality/embed-shaped models end-to-end, with the detection
     raw maps verified against the model's direct NHWC outputs using the
     REFERENCE's own permute/slice decode algebra
     (/root/reference/src/pipeline/module/face_detection.rs:296-345).
"""

import re
import shutil
import struct
import subprocess
import tempfile
import os

import numpy as np
import pytest

from rs_face_detection_tpu.runtime.proto3 import (
    Field,
    decode_message,
    encode_message,
)
from rs_face_detection_tpu.runtime import wire
from rs_face_detection_tpu.runtime.wire import (
    MODEL_CONFIG_RESPONSE,
    MODEL_INFER_REQUEST,
    MODEL_INFER_RESPONSE,
    SERVER_LIVE_RESPONSE,
    TritonWireClient,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PROTO = os.path.join(FIXTURES, "triton_subset.proto")


# ---------------------------------------------------------------------------
# 1. hand-computed primitives
# ---------------------------------------------------------------------------


def test_varint_bool_golden():
    # ServerLiveResponse{live: true} = field 1, wiretype 0, value 1
    assert encode_message(SERVER_LIVE_RESPONSE, {"live": True}) == b"\x08\x01"
    # proto3 default omitted
    assert encode_message(SERVER_LIVE_RESPONSE, {"live": False}) == b""
    assert decode_message(SERVER_LIVE_RESPONSE, b"\x08\x01") == {"live": True}
    assert decode_message(SERVER_LIVE_RESPONSE, b"") == {"live": False}


def test_string_and_packed_int64_golden():
    schema = {
        "name": Field(1, "string"),
        "shape": Field(3, "int64", repeated=True),
    }
    # name="ab" -> key 0x0A, len 2; shape=[1, 300] packed -> key 0x1A,
    # len 3, bytes 01 AC 02
    enc = encode_message(schema, {"name": "ab", "shape": [1, 300]})
    assert enc == b"\x0a\x02ab\x1a\x03\x01\xac\x02"
    assert decode_message(schema, enc) == {"name": "ab", "shape": [1, 300]}
    # unpacked encoding of the same repeated field must also decode
    unpacked = b"\x0a\x02ab\x18\x01\x18\xac\x02"
    assert decode_message(schema, unpacked) == {"name": "ab", "shape": [1, 300]}


def test_negative_int_sign_extension():
    schema = {"v": Field(1, "int64")}
    enc = encode_message(schema, {"v": -2})
    # two's complement 64-bit varint: 10 bytes ending 0x01
    assert enc == b"\x08" + b"\xfe" + b"\xff" * 8 + b"\x01"
    assert decode_message(schema, enc) == {"v": -2}
    schema32 = {"v": Field(1, "int32")}
    enc32 = encode_message(schema32, {"v": -1})
    assert decode_message(schema32, enc32) == {"v": -1}


def test_float_fixed32_golden():
    schema = {"x": Field(6, "float", repeated=True)}
    enc = encode_message(schema, {"x": [1.0]})
    # packed: key (6<<3|2)=0x32, len 4, LE float 1.0
    assert enc == b"\x32\x04" + struct.pack("<f", 1.0)
    out = decode_message(schema, enc)
    assert out["x"] == [1.0]


def test_unknown_fields_skipped():
    # ServerLiveResponse bytes plus an unknown field 9 (varint), unknown
    # field 10 (length-delimited) — decoder must skip both.
    extra = b"\x48\x2a" + b"\x52\x03abc"
    assert decode_message(SERVER_LIVE_RESPONSE, b"\x08\x01" + extra) == {
        "live": True
    }


def test_truncated_raises():
    with pytest.raises(ValueError):
        decode_message(SERVER_LIVE_RESPONSE, b"\x08")


def test_malformed_inputs_raise_value_error():
    """Every malformed shape must surface as ValueError (never struct.error
    or a silent mis-decode) so the gRPC deserializer layer can map it to
    INVALID_ARGUMENT: truncated fixed-width scalars, truncated unknown
    fields (protoc rejects those too), truncated map entries, and
    message/map tags carrying a non-length-delimited wire type (a varint
    tag whose payload byte happens to parse as a plausible size would
    otherwise mis-decode garbage as a submessage)."""
    from rs_face_detection_tpu.runtime.proto3 import (
        Field,
        _encode_varint,
        _key,
    )

    schema = {
        "a": Field(1, "int32"),
        "m": Field(2, "message", schema={"x": Field(1, "int32")}),
        "mp": Field(
            3, "message", map_entry=(Field(1, "string"), Field(2, "int32"))
        ),
        "f": Field(4, "float"),
        "d": Field(5, "double"),
    }
    cases = {
        "unknown truncated fixed64": _key(9, 1),
        "unknown truncated fixed32": _key(9, 5) + b"\x00",
        "unknown length-delim overrun": _key(9, 2) + _encode_varint(50) + b"ab",
        "truncated float": _key(4, 5) + b"\x00\x00",
        "truncated double": _key(5, 1) + b"\x00" * 7,
        "message wrong wire type": _key(2, 0) + b"\x02\x08\x01",
        "map wrong wire type": _key(3, 0) + b"\x02\x08\x01",
        "map entry overrun": _key(3, 2) + _encode_varint(100) + b"\x0a",
    }
    for label, buf in cases.items():
        with pytest.raises(ValueError):
            decode_message(schema, buf)
        # and embedded after a valid field (decoder mid-stream)
        with pytest.raises(ValueError):
            decode_message(schema, _key(1, 0) + b"\x07" + buf)


def test_packed_numeric_bulk_paths_roundtrip():
    """The fixed-width packed kinds (float/double/fixed32/fixed64) bulk-
    encode/decode via numpy (seconds -> ms at the production 1.2M-float
    ModelInfer shape); the varint kinds stay per-element.  Cross-check the
    bulk path against scalar semantics on randomized payloads, including
    ndarray inputs (truthiness of an ndarray would throw in a naive
    `if not value` emptiness check) and empty lists."""
    from rs_face_detection_tpu.runtime.proto3 import Field

    schema = {
        "f": Field(1, "float", repeated=True),
        "d": Field(2, "double", repeated=True),
        "x32": Field(3, "fixed32", repeated=True),
        "x64": Field(4, "fixed64", repeated=True),
        "v": Field(5, "int64", repeated=True),
    }
    rng = np.random.default_rng(11)
    for n in (0, 1, 7, 1000):
        f = rng.normal(size=n).astype(np.float32)
        msg = {
            "f": f,  # ndarray on purpose
            "d": [float(v) for v in rng.normal(size=n)],
            "x32": [int(v) for v in rng.integers(0, 2**32, size=n)],
            "x64": [int(v) for v in rng.integers(0, 2**63, size=n)],
            "v": [int(v) for v in rng.integers(-(2**31), 2**31, size=n)],
        }
        out = decode_message(schema, encode_message(schema, msg))
        assert out["f"] == list(f.astype(np.float64)) == [float(v) for v in f]
        assert out["d"] == msg["d"]
        assert out["x32"] == msg["x32"]
        assert out["x64"] == msg["x64"]
        assert out["v"] == msg["v"]


def test_map_roundtrip():
    enc = encode_message(
        MODEL_INFER_REQUEST,
        {
            "model_name": "m",
            "parameters": {"max_batch_size": {"int64_param": 4}},
        },
    )
    out = decode_message(MODEL_INFER_REQUEST, enc)
    assert out["model_name"] == "m"
    assert out["parameters"]["max_batch_size"]["int64_param"] == 4


# ---------------------------------------------------------------------------
# 2. protoc cross-checks
# ---------------------------------------------------------------------------

_PROTOC = shutil.which("protoc")


def _protoc_encode(message: str, textproto: str) -> bytes:
    return subprocess.run(
        [_PROTOC, f"--encode=inference.{message}", "-I", FIXTURES, PROTO],
        input=textproto.encode(),
        capture_output=True,
        check=True,
    ).stdout


def _protoc_decode(message: str, blob: bytes) -> str:
    return subprocess.run(
        [_PROTOC, f"--decode=inference.{message}", "-I", FIXTURES, PROTO],
        input=blob,
        capture_output=True,
        check=True,
    ).stdout.decode()


needs_protoc = pytest.mark.skipif(_PROTOC is None, reason="protoc not installed")


@needs_protoc
def test_protoc_golden_model_infer_request():
    request = {
        "model_name": "face_detection_retina",
        "model_version": "",
        "id": "req-1",
        "inputs": [
            {
                "name": "data",
                "datatype": "FP32",
                "shape": [1, 3, 4, 4],
                "contents": {"fp32_contents": [0.5, -1.25, 2.0]},
            }
        ],
        "outputs": [{"name": "out0"}],
        "raw_input_contents": [b"\x01\x02"],
    }
    text = """
model_name: "face_detection_retina"
id: "req-1"
inputs {
  name: "data"
  datatype: "FP32"
  shape: [1, 3, 4, 4]
  contents { fp32_contents: [0.5, -1.25, 2.0] }
}
outputs { name: "out0" }
raw_input_contents: "\\001\\002"
"""
    golden = _protoc_encode("ModelInferRequest", text)
    ours = encode_message(MODEL_INFER_REQUEST, request)
    assert ours == golden
    # and our decoder must read protoc's bytes back to the same dict
    decoded = decode_message(MODEL_INFER_REQUEST, golden)
    assert decoded["model_name"] == "face_detection_retina"
    assert decoded["inputs"][0]["shape"] == [1, 3, 4, 4]
    np.testing.assert_allclose(
        decoded["inputs"][0]["contents"]["fp32_contents"], [0.5, -1.25, 2.0]
    )
    assert decoded["raw_input_contents"] == [b"\x01\x02"]


@needs_protoc
def test_protoc_golden_model_infer_response():
    response = {
        "model_name": "face_quality",
        "model_version": "1",
        "id": "",
        "outputs": [
            {"name": "output", "datatype": "FP32", "shape": [1, 4]}
        ],
        "raw_output_contents": [struct.pack("<4f", 0.1, 0.2, 0.3, 0.4)],
    }
    raw = response["raw_output_contents"][0]
    octal = "".join(f"\\{b:03o}" for b in raw)
    text = f"""
model_name: "face_quality"
model_version: "1"
outputs {{ name: "output" datatype: "FP32" shape: [1, 4] }}
raw_output_contents: "{octal}"
"""
    golden = _protoc_encode("ModelInferResponse", text)
    assert encode_message(MODEL_INFER_RESPONSE, response) == golden


@needs_protoc
def test_protoc_golden_model_config_response():
    config = {
        "config": {
            "name": "face_detection_retina",
            "platform": "jax_xla",
            "backend": "rs_face_detection_tpu",
            "max_batch_size": 0,
            "input": [
                {
                    "name": "data",
                    "data_type": 11,
                    "format": 2,
                    "dims": [1, 3, 640, 640],
                }
            ],
            "output": [
                {
                    "name": "face_rpn_cls_prob_reshape_stride32",
                    "data_type": 11,
                    "dims": [1, 4, 20, 20],
                }
            ],
        }
    }
    text = """
config {
  name: "face_detection_retina"
  platform: "jax_xla"
  backend: "rs_face_detection_tpu"
  input {
    name: "data"
    data_type: TYPE_FP32
    format: FORMAT_NCHW
    dims: [1, 3, 640, 640]
  }
  output {
    name: "face_rpn_cls_prob_reshape_stride32"
    data_type: TYPE_FP32
    dims: [1, 4, 20, 20]
  }
}
"""
    golden = _protoc_encode("ModelConfigResponse", text)
    assert encode_message(MODEL_CONFIG_RESPONSE, config) == golden
    decoded = decode_message(MODEL_CONFIG_RESPONSE, golden)
    assert decoded["config"]["input"][0]["dims"] == [1, 3, 640, 640]
    assert decoded["config"]["max_batch_size"] == 0


@needs_protoc
def test_protoc_decodes_our_bytes():
    """protoc --decode must read our encoder's output (the reverse check)."""
    ours = encode_message(
        MODEL_INFER_REQUEST,
        {
            "model_name": "m",
            "inputs": [
                {
                    "name": "data",
                    "datatype": "FP32",
                    "shape": [2, 2],
                    "contents": {"fp32_contents": [1.0, 0.0, -3.5, 9.0]},
                }
            ],
        },
    )
    text = _protoc_decode("ModelInferRequest", ours)
    assert 'model_name: "m"' in text
    assert "shape: 2" in text
    assert "-3.5" in text


# ---------------------------------------------------------------------------
# 3. live service round trip
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wire_port():
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.server import serve

    reg = ModelRegistry()

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    def small_classifier(name, outs):
        def b():
            from rs_face_detection_tpu.models.heads import init_small_cnn

            model, variables = init_small_cnn(
                outs, (32, 32), widths=(8, 16)
            )
            return ModelSpec(name, (32, 32, 3), "probs"), model, variables

        return b

    reg.register_builder("face_detection_retina", small_detection_builder)
    reg.register_builder("face_quality", small_classifier("face_quality", 4))
    reg.register_builder(
        "face_identification", small_classifier("face_identification", 16)
    )
    for name in ("face_detection_retina", "face_quality", "face_identification"):
        reg.load(name)

    server = serve(None, reg, port=0)
    yield server._rsfd_port, reg
    server.stop(0)


def test_wire_health_and_ready(wire_port):
    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        assert client.server_live() is True
        assert client.server_ready() is True
        assert client.model_ready("face_quality") is True
        assert client.model_ready("nope") is False
    finally:
        client.close()


def test_wire_grpc_health_v1(wire_port):
    """The vendored standard health protocol (triton_proto/health.proto:
    grpc.health.v1.Health/Check) answers on the wire: whole-server and
    known-service checks are SERVING, unknown services NOT_FOUND per the
    gRPC health spec.  Bytes sanity: HealthCheckResponse{status=SERVING}
    is the canonical varint field-1 encoding."""
    import grpc

    from rs_face_detection_tpu.runtime.wire import (
        HEALTH_CHECK_RESPONSE,
        encode_message,
    )

    assert encode_message(HEALTH_CHECK_RESPONSE, {"status": 1}) == b"\x08\x01"

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        assert client.health_check() == "SERVING"
        assert client.health_check("inference.GRPCInferenceService") == (
            "SERVING"
        )
        with pytest.raises(grpc.RpcError) as e:
            client.health_check("no.such.Service")
        assert e.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        client.close()


def test_wire_unknown_model_not_found(wire_port):
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        with pytest.raises(grpc.RpcError) as e:
            client.model_config("missing_model")
        assert e.value.code() == grpc.StatusCode.NOT_FOUND
        with pytest.raises(grpc.RpcError) as e:
            client.model_infer(
                "missing_model", np.zeros((1, 3, 2, 2), np.float32)
            )
        assert e.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        client.close()


def test_wire_reference_pipeline_flow(wire_port):
    """The reference's exact call sequence: ModelConfig at init, then
    ModelInfer with fp32_contents shaped by the config dims
    (pipeline.rs:89-116, face_detection.rs:240-296)."""
    port, reg = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        cfg = client.model_config("face_detection_retina")
        (inp,) = cfg["input"]
        assert inp["name"] == "data"
        assert inp["data_type"] == wire.DATA_TYPE["FP32"]
        assert inp["dims"] == [1, 3, 64, 64]
        out_names = [o["name"] for o in cfg["output"]]
        assert out_names[0] == "face_rpn_cls_prob_reshape_stride32"
        assert len(out_names) == 9  # 3 strides x (cls, bbox, landmark)

        rng = np.random.default_rng(0)
        x = rng.normal(size=inp["dims"]).astype(np.float32)
        outs = client.model_infer(
            "face_detection_retina",
            x,
            input_name=inp["name"],
            requested_outputs=out_names,
        )
        assert [n for n, _, _ in outs] == out_names

        # Verify the NCHW view against the model's direct NHWC outputs via
        # the REFERENCE's decode algebra: permute (0,2,3,1), slice [:, A:]
        # for scores, reshape rows of 4 / (5, 2).
        module, variables = reg.get("face_detection_retina")
        net = module.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
        a = 2
        by_name = {n: arr for n, _, arr in outs}
        for s in (32, 16, 8):
            cls = by_name[f"face_rpn_cls_prob_reshape_stride{s}"]
            ref_scores = (
                cls[:, a:, :, :].transpose(0, 2, 3, 1).reshape(-1)
            )
            np.testing.assert_allclose(
                ref_scores, np.asarray(net[s]["score"]).reshape(-1),
                rtol=1e-5, atol=1e-6,
            )
            bg = cls[:, :a, :, :].transpose(0, 2, 3, 1).reshape(-1)
            np.testing.assert_allclose(
                bg + ref_scores, np.ones_like(bg), rtol=1e-5, atol=1e-6
            )
            bbox = by_name[f"face_rpn_bbox_pred_stride{s}"]
            np.testing.assert_allclose(
                bbox.transpose(0, 2, 3, 1).reshape(-1, 4),
                np.asarray(net[s]["bbox"]).reshape(-1, 4),
                rtol=1e-5, atol=1e-6,
            )
            lm = by_name[f"face_rpn_landmark_pred_stride{s}"]
            np.testing.assert_allclose(
                lm.transpose(0, 2, 3, 1).reshape(-1, 5, 2),
                np.asarray(net[s]["landmark"]).reshape(-1, 5, 2),
                rtol=1e-5, atol=1e-6,
            )
    finally:
        client.close()


def test_wire_classifier_models_raw_and_typed(wire_port):
    """quality/embed-shaped models: fp32_contents AND raw_input_contents
    paths must give identical raw_output_contents."""
    port, reg = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        rng = np.random.default_rng(1)
        for name in ("face_quality", "face_identification"):
            x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
            (typed,) = client.model_infer(name, x)
            (raw,) = client.model_infer(name, x, use_raw=True)
            assert typed[0] == raw[0] == "output"
            np.testing.assert_allclose(typed[2], raw[2], rtol=1e-6)
            module, variables = reg.get(name)
            direct = np.asarray(
                module.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
            )
            np.testing.assert_allclose(
                typed[2], direct, rtol=1e-4, atol=1e-5
            )
    finally:
        client.close()


def test_wire_stream_infer(wire_port):
    import grpc
    from rs_face_detection_tpu.runtime.wire import (
        MODEL_STREAM_INFER_RESPONSE,
        SERVICE,
    )
    from rs_face_detection_tpu.runtime.proto3 import (
        decode_message as dec,
        encode_message as enc,
    )
    import functools

    port, _ = wire_port
    channel = grpc.insecure_channel(f"localhost:{port}")
    try:
        stream = channel.stream_stream(
            f"/{SERVICE}/ModelStreamInfer",
            request_serializer=functools.partial(enc, MODEL_INFER_REQUEST),
            response_deserializer=functools.partial(
                dec, MODEL_STREAM_INFER_RESPONSE
            ),
        )
        rng = np.random.default_rng(2)

        def requests():
            for _ in range(3):
                x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
                yield {
                    "model_name": "face_quality",
                    "inputs": [
                        {
                            "name": "data",
                            "datatype": "FP32",
                            "shape": [1, 3, 32, 32],
                        }
                    ],
                    "raw_input_contents": [x.astype("<f4").tobytes()],
                }

        responses = list(stream(requests(), timeout=60))
        assert len(responses) == 3
        for r in responses:
            assert r["error_message"] == ""
            out = r["infer_response"]["raw_output_contents"][0]
            probs = np.frombuffer(out, dtype="<f4")
            assert probs.shape == (4,) or probs.size == 4
    finally:
        channel.close()


def test_wire_stream_infer_error_keeps_stream_up(wire_port):
    """Triton stream semantics: a per-message failure rides error_message
    (with the real status + detail, via _StreamAbortShim) and the stream
    keeps serving — a context.abort would kill it with the detail lost
    (grpcio aborts raise a bare Exception())."""
    import functools

    import grpc

    from rs_face_detection_tpu.runtime.proto3 import (
        decode_message as dec,
        encode_message as enc,
    )
    from rs_face_detection_tpu.runtime.wire import (
        MODEL_STREAM_INFER_RESPONSE,
        SERVICE,
    )

    port, _ = wire_port
    channel = grpc.insecure_channel(f"localhost:{port}")
    try:
        stream = channel.stream_stream(
            f"/{SERVICE}/ModelStreamInfer",
            request_serializer=functools.partial(enc, MODEL_INFER_REQUEST),
            response_deserializer=functools.partial(
                dec, MODEL_STREAM_INFER_RESPONSE
            ),
        )
        x = np.random.default_rng(3).normal(size=(1, 3, 32, 32))

        def req(model_name):
            return {
                "model_name": model_name,
                "inputs": [
                    {
                        "name": "data",
                        "datatype": "FP32",
                        "shape": [1, 3, 32, 32],
                    }
                ],
                "raw_input_contents": [x.astype("<f4").tobytes()],
            }

        def requests():
            yield req("face_quality")  # good
            yield req("no_such_model")  # unknown model -> NOT_FOUND
            yield req("face_quality")  # stream must still be serving

        responses = list(stream(requests(), timeout=60))
        assert len(responses) == 3
        assert responses[0]["error_message"] == ""
        err = responses[1]["error_message"]
        assert "NOT_FOUND" in err and "no_such_model" in err, err
        assert responses[1]["infer_response"] is None
        assert responses[2]["error_message"] == ""
        out = responses[2]["infer_response"]["raw_output_contents"][0]
        assert np.frombuffer(out, dtype="<f4").size == 4
    finally:
        channel.close()


def test_wire_shm_unregister_unknown_not_found(wire_port):
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        with pytest.raises(grpc.RpcError) as e:
            client.system_shared_memory_unregister("never_registered")
        assert e.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        client.close()


def test_wire_cuda_shm_verbs(wire_port):
    """The three CUDA shared-memory RPCs answer on the real wire: register
    is a typed UNIMPLEMENTED refusal (TPU HBM is not host-mappable), named
    status/unregister are NOT_FOUND, blanket status/unregister follow
    Triton's empty-registry semantics (grpc_service.proto:1494-1616)."""
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        with pytest.raises(grpc.RpcError) as e:
            client.cuda_shared_memory_register("r", b"\x00" * 64, 0, 4096)
        assert e.value.code() == grpc.StatusCode.UNIMPLEMENTED
        assert "system shared memory" in e.value.details()
        assert client.cuda_shared_memory_status() == {}
        client.cuda_shared_memory_unregister()  # empty name: no-op
        for call in (
            lambda: client.cuda_shared_memory_status("r"),
            lambda: client.cuda_shared_memory_unregister("r"),
        ):
            with pytest.raises(grpc.RpcError) as e:
                call()
            assert e.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        client.close()


def test_wire_log_settings(wire_port):
    """LogSettings round trip: defaults report Triton's initial state,
    updates change the package logger level and echo the merged state,
    unknown keys are INVALID_ARGUMENT (grpc_service.proto:1686-1756)."""
    import logging

    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    logger = logging.getLogger("rs_face_detection_tpu")
    before = logger.level
    try:
        state = client.log_settings()
        assert state["log_info"] is True and state["log_error"] is True
        assert state["log_verbose_level"] == 0
        assert state["log_format"] == "default"

        state = client.log_settings({"log_verbose_level": 2})
        assert state["log_verbose_level"] == 2
        assert logger.level == logging.DEBUG

        state = client.log_settings(
            {"log_verbose_level": 0, "log_info": False}
        )
        assert state["log_info"] is False
        assert logger.level == logging.WARNING

        with pytest.raises(grpc.RpcError) as e:
            client.log_settings({"log_nonsense": True})
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        client.log_settings(
            {"log_verbose_level": 0, "log_info": True, "log_warning": True,
             "log_error": True}
        )
        logger.setLevel(before)
        client.close()


@needs_protoc
def test_protoc_golden_oneof_default_presence():
    """proto3 oneof members have EXPLICIT presence: protoc serializes
    `bool_param: false` (grpc_service.proto:1694 SettingValue), and decode
    must report which case was set rather than pre-filling all three."""
    from rs_face_detection_tpu.runtime.wire import LOG_SETTINGS_REQUEST

    request = {"settings": {"log_info": {"bool_param": False}}}
    golden = _protoc_encode(
        "LogSettingsRequest",
        'settings { key: "log_info" value { bool_param: false } }',
    )
    assert encode_message(LOG_SETTINGS_REQUEST, request) == golden
    decoded = decode_message(LOG_SETTINGS_REQUEST, golden)
    val = decoded["settings"]["log_info"]
    assert val == {"bool_param": False}  # present, and ONLY this case
    assert "uint32_param" not in val and "string_param" not in val


def test_wire_log_settings_atomic_reject(wire_port):
    """Triton semantics: a rejected LogSettings request must leave the
    prior state fully in effect — no key from the failed request may be
    applied (the valid key precedes the bad one in the map)."""
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        before = client.log_settings()
        assert before["log_info"] is True
        with pytest.raises(grpc.RpcError) as e:
            client.log_settings({"log_info": False, "log_typo": 1})
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        after = client.log_settings()
        assert after == before  # log_info=False must NOT have stuck
    finally:
        client.close()


def test_wire_log_settings_wrong_type_rejected(wire_port):
    """A SettingValue whose oneof case does not match the key's expected
    type is INVALID_ARGUMENT, not silently coerced: log_info sent as
    uint32_param must not flip the boolean."""
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        before = client.log_settings()
        for bad in (
            {"log_info": 1},            # uint32_param for a bool key
            {"log_verbose_level": "2"},  # string_param for a uint32 key
            {"log_format": True},        # bool_param for a string key
        ):
            with pytest.raises(grpc.RpcError) as e:
                client.log_settings(bad)
            assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
            assert "expects" in e.value.details()
        assert client.log_settings() == before
    finally:
        client.close()


def test_wire_log_settings_bad_file_keeps_old_handler(wire_port, tmp_path):
    """A failed log_file update must not destroy working file logging:
    the old handler is replaced only after the new one opens (Triton
    keeps the prior setting when an update fails)."""
    import grpc
    import logging

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    logger = logging.getLogger("rs_face_detection_tpu")
    before_level = logger.level
    good = str(tmp_path / "server.log")
    try:
        state = client.log_settings({"log_file": good, "log_info": True})
        assert state["log_file"] == good
        logger.info("line-one")
        with open(good) as f:
            assert "line-one" in f.read()

        with pytest.raises(grpc.RpcError) as e:
            client.log_settings(
                {"log_file": str(tmp_path / "no-such-dir" / "x.log")}
            )
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT

        # prior handler still attached and reported
        assert client.log_settings()["log_file"] == good
        logger.info("line-two")
        with open(good) as f:
            assert "line-two" in f.read()
    finally:
        client.log_settings({"log_file": ""})
        logger.setLevel(before_level)
        client.close()


def test_wire_bad_dtype_invalid_argument(wire_port):
    import grpc

    port, _ = wire_port
    channel = grpc.insecure_channel(f"localhost:{port}")
    try:
        import functools

        from rs_face_detection_tpu.runtime.proto3 import (
            decode_message as dec,
            encode_message as enc,
        )

        call = channel.unary_unary(
            f"/{wire.SERVICE}/ModelInfer",
            request_serializer=functools.partial(enc, MODEL_INFER_REQUEST),
            response_deserializer=functools.partial(dec, MODEL_INFER_RESPONSE),
        )
        with pytest.raises(grpc.RpcError) as e:
            call(
                {
                    "model_name": "face_quality",
                    "inputs": [
                        {"name": "data", "datatype": "FP99", "shape": [1, 3, 2, 2]}
                    ],
                },
                timeout=30,
            )
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        channel.close()


# ---------------------------------------------------------------------------
# 4. full verb-family coverage (metadata / statistics / repository / shm /
#    trace) — the remaining reference client wrappers on the real wire
# ---------------------------------------------------------------------------


def test_wire_metadata_and_statistics(wire_port):
    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        meta = client.server_metadata()
        assert meta["name"] == "rs_face_detection_tpu"
        assert "statistics" in meta["extensions"]

        mm = client.model_metadata("face_detection_retina")
        assert mm["platform"] == "jax_xla"
        assert mm["inputs"][0]["shape"] == [1, 3, 64, 64]
        assert len(mm["outputs"]) == 9

        # statistics must reflect wire ModelInfer traffic
        before = {
            s["name"]: s["inference_count"]
            for s in client.model_statistics()
        }
        x = np.zeros((1, 3, 32, 32), np.float32)
        client.model_infer("face_quality", x, use_raw=True)
        (stat,) = client.model_statistics("face_quality")
        assert stat["inference_count"] >= before.get("face_quality", 0) + 1
        assert stat["execution_count"] >= 1
        assert stat["inference_stats"]["success"]["count"] >= 1
        assert stat["memory_usage"][0]["byte_size"] > 0
        assert any(b["batch_size"] == 1 for b in stat["batch_stats"])
    finally:
        client.close()


def test_wire_repository_verbs(wire_port):
    import grpc

    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        models = {m["name"]: m["state"] for m in client.repository_index()}
        assert models["face_quality"] == "READY"
        client.repository_model_unload("face_quality")
        models = {m["name"]: m["state"] for m in client.repository_index()}
        assert models["face_quality"] == "UNAVAILABLE"
        ready = {m["name"] for m in client.repository_index(ready_only=True)}
        assert "face_quality" not in ready
        client.repository_model_load("face_quality")  # builder still there
        assert client.model_ready("face_quality")
        with pytest.raises(grpc.RpcError) as e:
            client.repository_model_load("no_such_model")
        assert e.value.code() == grpc.StatusCode.NOT_FOUND
    finally:
        client.close()


def test_wire_shm_roundtrip(wire_port):
    import uuid

    from rs_face_detection_tpu.runtime.shm import SharedRegion

    port, reg = wire_port
    client = TritonWireClient(f"localhost:{port}")
    region = SharedRegion.create(f"rsfd_wire_{uuid.uuid4().hex[:12]}", 1 << 20)
    try:
        client.system_shared_memory_register("wirein", region.key, 1 << 20)
        status = client.system_shared_memory_status()
        assert status["wirein"]["byte_size"] == 1 << 20
        x = np.random.default_rng(3).normal(size=(1, 3, 32, 32)).astype(
            np.float32
        )
        region.write_array(np.ascontiguousarray(x, dtype="<f4"), 0)
        # shm input, wire output
        (out,) = client.model_infer_shm("face_quality", x, "wirein")
        (inline,) = client.model_infer("face_quality", x, use_raw=True)
        np.testing.assert_allclose(out[2], inline[2], rtol=1e-6)
        # shm input AND shm output: bytes come back through the region
        (desc,) = client.model_infer_shm(
            "face_quality", x, "wirein",
            requested_outputs=["output"],
            output_region=("wirein", 1 << 19),
        )
        rname, off, nbytes = desc[2]
        assert (rname, off) == ("wirein", 1 << 19)
        got = region.read_array("float32", tuple(desc[1]), off)
        np.testing.assert_allclose(got, inline[2], rtol=1e-6)
        client.system_shared_memory_unregister("wirein")
        import grpc

        with pytest.raises(grpc.RpcError) as e:
            client.model_infer_shm("face_quality", x, "wirein")
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    finally:
        region.close(unlink=True)
        client.close()


def test_wire_shm_shared_with_json_facade(wire_port):
    """A region registered over the protobuf wire is visible to the JSON
    facade's shm verbs (one SharedMemoryRegistry behind both protocols)."""
    from rs_face_detection_tpu.runtime.server import FacePipelineClient
    from rs_face_detection_tpu.runtime.shm import SharedRegion

    import uuid

    port, _ = wire_port
    wire_client = TritonWireClient(f"localhost:{port}")
    json_client = FacePipelineClient("localhost", port)
    region = SharedRegion.create(f"rsfd_wire_{uuid.uuid4().hex[:12]}", 4096)
    try:
        wire_client.system_shared_memory_register("xproto", region.key, 4096)
        regions = json_client.system_shared_memory_status()["regions"]
        assert "xproto" in regions
        wire_client.system_shared_memory_unregister("xproto")
        regions = json_client.system_shared_memory_status()["regions"]
        assert "xproto" not in regions
    finally:
        region.close(unlink=True)
        wire_client.close()


def test_wire_trace_setting_status(wire_port):
    port, _ = wire_port
    client = TritonWireClient(f"localhost:{port}")
    try:
        # empty settings = status query; no trace is active
        out = client.trace_setting()
        assert out["trace_level"] == ["OFF"]
    finally:
        client.close()


# ---------------------------------------------------------------------------
# 6. protoc as the CLIENT-SIDE encoder (VERDICT r4 #5): sever the codec
# self-validation loop — the request bytes on the wire come from protoc
# --encode (the canonical implementation), travel through grpcio's generic
# stub to the live servicer, and the response bytes are decoded by protoc
# --decode.  proto3.py touches NEITHER direction of this exchange.
# ---------------------------------------------------------------------------


def _unescape_textproto_bytes(s: str) -> bytes:
    """Reverse protoc's text-format string escaping (octal + shorthands)."""
    out = bytearray()
    i = 0
    while i < len(s):
        ch = s[i]
        if ch != "\\":
            out.extend(ch.encode("utf-8"))
            i += 1
            continue
        nxt = s[i + 1]
        if nxt in "01234567":
            j = i + 1
            while j < len(s) and j < i + 4 and s[j] in "01234567":
                j += 1
            out.append(int(s[i + 1 : j], 8))
            i = j
        elif nxt == "x":
            out.append(int(s[i + 2 : i + 4], 16))
            i += 4
        else:
            out.append(
                {"n": 10, "r": 13, "t": 9, "a": 7, "b": 8, "f": 12,
                 "v": 11, "\\": 92, '"': 34, "'": 39}[nxt]
            )
            i += 2
    return bytes(out)


@needs_protoc
def test_protoc_is_the_client(wire_port):
    import grpc

    port, reg = wire_port
    rng = np.random.default_rng(7)
    x = rng.random((1, 3, 32, 32), np.float32).astype("<f4")
    esc = "".join(f"\\{b:03o}" for b in x.tobytes())
    text = f"""
model_name: "face_quality"
inputs {{ name: "data" datatype: "FP32" shape: [1, 3, 32, 32] }}
raw_input_contents: "{esc}"
"""
    request_bytes = _protoc_encode("ModelInferRequest", text)

    channel = grpc.insecure_channel(f"localhost:{port}")
    try:
        fn = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        response_bytes = fn(request_bytes, timeout=60)
    finally:
        channel.close()

    decoded = _protoc_decode("ModelInferResponse", response_bytes)
    assert 'model_name: "face_quality"' in decoded
    assert 'name: "output"' in decoded

    # numeric parity with the in-process forward: pull the raw output blob
    # back out of protoc's text rendering
    (blob_text,) = re.findall(
        r'raw_output_contents: "((?:[^"\\]|\\.)*)"', decoded
    )
    got = np.frombuffer(
        _unescape_textproto_bytes(blob_text), dtype="<f4"
    ).reshape(1, 4)
    module, variables = reg.get("face_quality")
    want = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 7. third-party protobuf RUNTIME as the client (round 5): the encoding
# stack a stock `tritonclient.grpc` uses — protoc-GENERATED Python classes
# serialized by google.protobuf — drives the live server through grpcio's
# generic stub.  Neither proto3.py nor protoc-the-binary touches the
# request or response bytes; this is real third-party interop, one step
# beyond protoc-as-encoder above.
# ---------------------------------------------------------------------------


@needs_protoc
def test_google_protobuf_runtime_is_the_client(wire_port, tmp_path):
    pb = pytest.importorskip("google.protobuf")
    del pb
    import subprocess
    import sys as _sys

    import grpc

    out = str(tmp_path / "pb2")
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [
            _PROTOC,
            f"--proto_path={FIXTURES}",
            f"--python_out={out}",
            "triton_subset.proto",
        ],
        check=True,
    )
    _sys.path.insert(0, out)
    try:
        import triton_subset_pb2 as pb2
    except Exception as e:  # protoc gencode vs runtime version mismatch
        pytest.skip(f"protoc gencode incompatible with protobuf runtime: {e}")
    finally:
        _sys.path.remove(out)

    port, reg = wire_port
    rng = np.random.default_rng(11)
    x = rng.random((1, 3, 32, 32), np.float32).astype("<f4")

    req = pb2.ModelInferRequest()
    req.model_name = "face_quality"
    t = req.inputs.add()
    t.name = "data"
    t.datatype = "FP32"
    t.shape.extend([1, 3, 32, 32])
    req.raw_input_contents.append(x.tobytes())

    channel = grpc.insecure_channel(f"localhost:{port}")
    try:
        # ServerLiveRequest is empty (and not in the test-fixture subset
        # schema): an empty proto3 message is zero bytes on the wire
        live = channel.unary_unary(
            "/inference.GRPCInferenceService/ServerLive",
            request_serializer=lambda b: b,
            response_deserializer=pb2.ServerLiveResponse.FromString,
        )
        assert live(b"", timeout=30).live is True

        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=pb2.ModelInferResponse.FromString,
        )
        resp = infer(req, timeout=60)
    finally:
        channel.close()

    assert resp.model_name == "face_quality"
    (out_t,) = resp.outputs
    assert out_t.name == "output" and out_t.datatype == "FP32"
    got = np.frombuffer(resp.raw_output_contents[0], dtype="<f4").reshape(
        list(out_t.shape)
    )
    module, variables = reg.get("face_quality")
    want = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

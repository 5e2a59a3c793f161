"""Ensemble coverage: parse-time validation, repository scan/load, the wire
ModelInfer dataflow, the protoc codec golden, and the HTTP cross-surface.

Triton's ensemble scheduler (model_config.proto ModelEnsembling:1548-1607,
reference vendored copy triton_proto/model_config.proto) rejects broken
DAGs at model LOAD, runs members in dependency order at infer, and accounts
statistics for both the ensemble and its composing models.  The reference
pipeline never shipped an ensemble config, so this surface is
parity-by-protocol: anything a stock Triton repository expresses must scan,
load, and serve here the same way.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
from rs_face_detection_tpu.runtime.repository import (
    EnsembleDefinition,
    attach_repository_builders,
    parse_ensemble,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PROTO = os.path.join(FIXTURES, "triton_subset.proto")
_PROTOC = shutil.which("protoc")
needs_protoc = pytest.mark.skipif(_PROTOC is None, reason="protoc not installed")


def _step(model, imap, omap, version=-1):
    return {
        "model_name": model,
        "model_version": version,
        "input_map": [{"key": k, "value": v} for k, v in imap.items()],
        "output_map": [{"key": k, "value": v} for k, v in omap.items()],
    }


def _config(steps, inputs=("IMAGE",), outputs=("OUT",)):
    dims = [1, 3, 8, 8]
    return {
        "platform": "ensemble",
        "max_batch_size": 0,
        "input": [
            {"name": n, "data_type": "TYPE_FP32", "dims": list(dims)}
            for n in inputs
        ],
        "output": [
            {"name": n, "data_type": "TYPE_FP32", "dims": list(dims)}
            for n in outputs
        ],
        "ensemble_scheduling": {"step": steps},
    }


# ---------------------------------------------------------------------------
# 1. parse_ensemble validation (load-time, like Triton's model loader)
# ---------------------------------------------------------------------------


def test_parse_reorders_steps_topologically():
    # steps declared consumer-first; parse must schedule producer-first
    cfg = _config(
        [
            _step("b", {"data": "MID"}, {"output": "OUT"}),
            _step("a", {"data": "IMAGE"}, {"output": "MID"}),
        ]
    )
    defn = parse_ensemble("ens", cfg)
    assert [s.model_name for s in defn.steps] == ["a", "b"]
    assert isinstance(defn, EnsembleDefinition)
    assert defn.max_batch_size == 0


def test_parse_rejects_cycle():
    cfg = _config(
        [
            _step("a", {"data": "T2"}, {"output": "T1"}),
            _step("b", {"data": "T1"}, {"output": "T2"}),
        ],
        outputs=("T1",),
    )
    with pytest.raises(ValueError, match="not schedulable"):
        parse_ensemble("ens", cfg)


def test_parse_rejects_duplicate_producer():
    cfg = _config(
        [
            _step("a", {"data": "IMAGE"}, {"output": "OUT"}),
            _step("b", {"data": "IMAGE"}, {"output": "OUT"}),
        ]
    )
    with pytest.raises(ValueError, match="produced by both"):
        parse_ensemble("ens", cfg)


def test_parse_rejects_shadowed_input():
    cfg = _config([_step("a", {"data": "IMAGE"}, {"output": "IMAGE"})])
    with pytest.raises(ValueError, match="shadows an ensemble input"):
        parse_ensemble("ens", cfg)


def test_parse_rejects_unproduced_output():
    cfg = _config([_step("a", {"data": "IMAGE"}, {"output": "MID"})])
    with pytest.raises(ValueError, match="not produced"):
        parse_ensemble("ens", cfg)


def test_parse_rejects_multi_entry_input_map():
    # members here take exactly one input; Triton rejects unsatisfiable
    # configs at load, not per request (advisor finding r4)
    cfg = _config(
        [_step("a", {"data": "IMAGE", "extra": "IMAGE"}, {"output": "OUT"})]
    )
    with pytest.raises(ValueError, match="exactly one input"):
        parse_ensemble("ens", cfg)


def test_parse_rejects_duplicate_map_key_and_missing_maps():
    bad = _config([_step("a", {"data": "IMAGE"}, {"output": "OUT"})])
    bad["ensemble_scheduling"]["step"][0]["input_map"].append(
        {"key": "data", "value": "IMAGE"}
    )
    with pytest.raises(ValueError, match="duplicate map key"):
        parse_ensemble("ens", bad)
    with pytest.raises(ValueError, match="required"):
        parse_ensemble(
            "ens", _config([{"model_name": "a", "input_map": [], "output_map": []}])
        )


# ---------------------------------------------------------------------------
# 2. members + registry fixture (image -> image so outputs chain)
# ---------------------------------------------------------------------------


class _ScaleNCHW:
    """Toy member: NHWC float input -> NCHW output scaled by k (the wire
    transposes to NHWC before apply; emitting NCHW keeps the ensemble
    tensor pool in the wire's NCHW convention so outputs chain)."""

    def __init__(self, k: float):
        self.k = float(k)

    def apply(self, variables, x):
        import jax.numpy as jnp

        return jnp.transpose(x * self.k, (0, 3, 1, 2))


def _ensemble_registry():
    reg = ModelRegistry()
    reg.register(ModelSpec("scale2", (8, 8, 3), "image"), _ScaleNCHW(2.0), {})
    reg.register(ModelSpec("scale3", (8, 8, 3), "image"), _ScaleNCHW(3.0), {})
    defn = parse_ensemble(
        "ens6",
        _config(
            [
                _step("scale2", {"data": "IMAGE"}, {"output": "MID"}),
                _step("scale3", {"data": "MID"}, {"output": "OUT"}),
            ]
        ),
    )
    reg.register(ModelSpec("ens6", (8, 8, 3), "ensemble"), defn, {})
    return reg


@pytest.fixture(scope="module")
def ensemble_server():
    pytest.importorskip("grpc")
    from rs_face_detection_tpu.runtime.server import serve

    reg = _ensemble_registry()
    server = serve(None, reg, port=0, http_port=0)
    yield server, reg
    server.stop(0)


# ---------------------------------------------------------------------------
# 3. wire dataflow end to end
# ---------------------------------------------------------------------------


def test_wire_ensemble_chains_members(ensemble_server):
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    server, reg = ensemble_server
    client = TritonWireClient(f"localhost:{server._rsfd_port}")
    try:
        x = np.random.default_rng(0).random((1, 3, 8, 8), np.float32)
        ((oname, shape, arr),) = client.model_infer(
            "ens6", x, input_name="IMAGE"
        )
        assert oname == "OUT" and shape == [1, 3, 8, 8]
        np.testing.assert_allclose(arr, 6.0 * x, rtol=1e-6)
        # Triton accounts the ensemble AND its composing models
        assert reg.statistics("ens6").inference_count >= 1
        assert reg.statistics("scale2").inference_count >= 1
    finally:
        client.close()


def test_wire_ensemble_model_config(ensemble_server):
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    server, _ = ensemble_server
    client = TritonWireClient(f"localhost:{server._rsfd_port}")
    try:
        cfg = client.model_config("ens6")
        assert cfg["platform"] == "ensemble"
        steps = cfg["ensemble_scheduling"]["step"]
        assert [s["model_name"] for s in steps] == ["scale2", "scale3"]
        assert steps[0]["input_map"] == {"data": "IMAGE"}
        assert steps[1]["output_map"] == {"output": "OUT"}
    finally:
        client.close()


def test_wire_ensemble_missing_input_and_unknown_member(ensemble_server):
    import grpc

    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    server, reg = ensemble_server
    client = TritonWireClient(f"localhost:{server._rsfd_port}")
    x = np.zeros((1, 3, 8, 8), np.float32)
    try:
        with pytest.raises(grpc.RpcError) as e:
            client.model_infer("ens6", x, input_name="WRONG")
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        assert "missing input tensor" in e.value.details()

        # a member unloaded AFTER the ensemble went READY -> NOT_FOUND at
        # infer (the load-time registry check can't see future unloads)
        reg.unload("scale3")
        try:
            with pytest.raises(grpc.RpcError) as e:
                client.model_infer("ens6", x, input_name="IMAGE")
            assert e.value.code() == grpc.StatusCode.NOT_FOUND
            assert "scale3" in e.value.details()
        finally:
            reg.register(
                ModelSpec("scale3", (8, 8, 3), "image"), _ScaleNCHW(3.0), {}
            )
    finally:
        client.close()


def test_ensemble_mixed_shm_and_raw_inputs():
    """A Triton-legal request mixing a shared-memory input (no raw blob)
    with a raw-data input must align raw_input_contents with the raw-data
    inputs only (advisor finding r4: positional alignment misassigns)."""
    pytest.importorskip("grpc")
    from rs_face_detection_tpu.runtime.shm import SharedRegion
    from rs_face_detection_tpu.runtime.wire import TritonWireServicer

    reg = ModelRegistry()
    reg.register(ModelSpec("scale2", (8, 8, 3), "image"), _ScaleNCHW(2.0), {})
    reg.register(ModelSpec("scale3", (8, 8, 3), "image"), _ScaleNCHW(3.0), {})
    defn = parse_ensemble(
        "pair",
        _config(
            [
                _step("scale2", {"data": "A"}, {"output": "OA"}),
                _step("scale3", {"data": "B"}, {"output": "OB"}),
            ],
            inputs=("A", "B"),
            outputs=("OA", "OB"),
        ),
    )
    reg.register(ModelSpec("pair", (8, 8, 3), "ensemble"), defn, {})
    servicer = TritonWireServicer(reg)

    class _Abort(Exception):
        pass

    class _Ctx:
        code = detail = None

        def abort(self, code, detail):
            self.code, self.detail = code, detail
            raise _Abort(f"{code}: {detail}")

    rng = np.random.default_rng(1)
    a = rng.random((1, 3, 8, 8), np.float32)
    b = rng.random((1, 3, 8, 8), np.float32)
    with SharedRegion.create("ens_shm_a", 1 << 12) as region:
        region.write_array(a.astype("<f4"))
        servicer.shm.register("A_REGION", region.key, 1 << 12)
        try:
            request = {
                "model_name": "pair",
                # the wire decoder normally defaults these keys
                "model_version": "",
                "id": "",
                "outputs": [],
                "inputs": [
                    {
                        "name": "A",
                        "datatype": "FP32",
                        "shape": [1, 3, 8, 8],
                        "contents": None,
                        "parameters": {
                            "shared_memory_region": {
                                "string_param": "A_REGION"
                            }
                        },
                    },
                    {
                        "name": "B",
                        "datatype": "FP32",
                        "shape": [1, 3, 8, 8],
                        "contents": None,
                        "parameters": {},
                    },
                ],
                # ONE raw blob for the ONE raw-data input (B)
                "raw_input_contents": [b.astype("<f4").tobytes()],
            }
            resp = servicer.model_infer(request, _Ctx())
            by_name = {
                m["name"]: np.frombuffer(blob, dtype="<f4").reshape(
                    [int(d) for d in m["shape"]]
                )
                for m, blob in zip(
                    resp["outputs"], resp["raw_output_contents"]
                )
            }
            np.testing.assert_allclose(by_name["OA"], 2.0 * a, rtol=1e-6)
            np.testing.assert_allclose(by_name["OB"], 3.0 * b, rtol=1e-6)

            # blob-count mismatch (2 blobs, 1 raw-data input) is rejected
            bad = dict(request)
            bad["raw_input_contents"] = [b.tobytes(), b.tobytes()]
            ctx = _Ctx()
            with pytest.raises(_Abort):
                servicer.model_infer(bad, ctx)
            assert "raw-data input" in ctx.detail
        finally:
            servicer.shm.unregister("A_REGION")


# ---------------------------------------------------------------------------
# 4. repository scan + load
# ---------------------------------------------------------------------------

_ENSEMBLE_PBTXT = """
platform: "ensemble"
max_batch_size: 0
input [ { name: "IMAGE" data_type: TYPE_FP32 dims: [1, 3, 8, 8] } ]
output [ { name: "OUT" data_type: TYPE_FP32 dims: [1, 3, 8, 8] } ]
ensemble_scheduling {
  step [
    {
      model_name: "scale2"
      model_version: -1
      input_map { key: "data" value: "IMAGE" }
      output_map { key: "output" value: "MID" }
    },
    {
      model_name: "scale3"
      model_version: -1
      input_map { key: "data" value: "MID" }
      output_map { key: "output" value: "OUT" }
    }
  ]
}
"""


def _write_ensemble_dir(root, name, pbtxt=_ENSEMBLE_PBTXT):
    model_dir = os.path.join(root, name)
    os.makedirs(os.path.join(model_dir, "1"), exist_ok=True)
    with open(os.path.join(model_dir, "config.pbtxt"), "w") as f:
        f.write(f'name: "{name}"\n' + pbtxt)


def test_repository_scan_and_load_ensemble(tmp_path):
    from rs_face_detection_tpu.runtime.repository import scan_repository

    root = str(tmp_path)
    _write_ensemble_dir(root, "ens6")
    (m,) = scan_repository(root)
    assert m.name == "ens6" and m.weights_path == ""

    reg = ModelRegistry()
    reg.register(ModelSpec("scale2", (8, 8, 3), "image"), _ScaleNCHW(2.0), {})
    reg.register(ModelSpec("scale3", (8, 8, 3), "image"), _ScaleNCHW(3.0), {})
    names = attach_repository_builders(reg, root)
    assert "ens6" in names
    reg.load("ens6")
    module, _ = reg.get("ens6")
    assert isinstance(module, EnsembleDefinition)
    assert [s.model_name for s in module.steps] == ["scale2", "scale3"]
    # the definition itself is not directly applicable
    with pytest.raises(TypeError, match="no weights to apply"):
        module.apply({}, None)


def test_repository_ensemble_unknown_member_fails_at_load(tmp_path):
    """An ensemble naming an unregistered member is UNAVAILABLE at load —
    not a per-request NOT_FOUND (advisor finding r4 / Triton
    model_repository_manager semantics)."""
    root = str(tmp_path)
    _write_ensemble_dir(root, "ens6")  # scale2/scale3 NOT registered
    reg = ModelRegistry()
    attach_repository_builders(reg, root)
    with pytest.raises(ValueError, match="not registered"):
        reg.load("ens6")
    assert reg.model_ready("ens6") is False


def test_repository_malformed_ensemble_surfaces_at_scan(tmp_path):
    from rs_face_detection_tpu.runtime.repository import scan_repository

    root = str(tmp_path)
    bad = _ENSEMBLE_PBTXT.replace('value: "OUT"', 'value: "IMAGE"')
    _write_ensemble_dir(root, "ens6", bad)
    errors = []
    assert scan_repository(root, errors=errors) == []
    ((name, message),) = errors
    assert name == "ens6" and "shadows" in message


# ---------------------------------------------------------------------------
# 5. codec golden: ensemble_scheduling must hit protoc's exact bytes
# ---------------------------------------------------------------------------


@needs_protoc
def test_protoc_golden_ensemble_scheduling():
    from rs_face_detection_tpu.runtime.proto3 import (
        decode_message,
        encode_message,
    )
    from rs_face_detection_tpu.runtime.wire import MODEL_CONFIG_RESPONSE

    config = {
        "config": {
            "name": "ens6",
            "platform": "ensemble",
            "max_batch_size": 0,
            "ensemble_scheduling": {
                "step": [
                    {
                        "model_name": "scale2",
                        "model_version": -1,
                        "input_map": {"data": "IMAGE"},
                        "output_map": {"output": "MID"},
                    },
                    {
                        "model_name": "scale3",
                        "input_map": {"data": "MID"},
                        "output_map": {"output": "OUT"},
                    },
                ]
            },
        }
    }
    text = """
config {
  name: "ens6"
  platform: "ensemble"
  ensemble_scheduling {
    step {
      model_name: "scale2"
      model_version: -1
      input_map { key: "data" value: "IMAGE" }
      output_map { key: "output" value: "MID" }
    }
    step {
      model_name: "scale3"
      input_map { key: "data" value: "MID" }
      output_map { key: "output" value: "OUT" }
    }
  }
}
"""
    golden = subprocess.run(
        [_PROTOC, "--encode=inference.ModelConfigResponse", "-I", FIXTURES, PROTO],
        input=text.encode(),
        capture_output=True,
        check=True,
    ).stdout
    ours = encode_message(MODEL_CONFIG_RESPONSE, config)
    assert ours == golden
    decoded = decode_message(MODEL_CONFIG_RESPONSE, golden)
    steps = decoded["config"]["ensemble_scheduling"]["step"]
    assert steps[0]["input_map"] == {"data": "IMAGE"}
    assert steps[0]["model_version"] == -1
    assert steps[1]["output_map"] == {"output": "OUT"}


# ---------------------------------------------------------------------------
# 6. HTTP cross-surface (same servicer, /v2 rendering)
# ---------------------------------------------------------------------------


def test_http_ensemble_infer_and_config(ensemble_server):
    from rs_face_detection_tpu.runtime.http import TritonHTTPClient

    server, _ = ensemble_server
    client = TritonHTTPClient(port=server._rsfd_http_port)
    x = np.random.default_rng(2).random((1, 3, 8, 8), np.float32)
    ((oname, shape, arr),) = client.infer("ens6", x, input_name="IMAGE")
    assert oname == "OUT" and shape == [1, 3, 8, 8]
    np.testing.assert_allclose(arr, 6.0 * x, rtol=1e-6)
    cfg = client.model_config("ens6")
    assert cfg["platform"] == "ensemble"
    assert [s["model_name"] for s in cfg["ensemble_scheduling"]["step"]] == [
        "scale2",
        "scale3",
    ]


# ---------------------------------------------------------------------------
# 7. lazy (repository-builder) members
# ---------------------------------------------------------------------------


def test_wire_ensemble_lazy_builder_members():
    """Members registered as lazy builders need no explicit load: ModelInfer
    on a READY ensemble resolves each member on first use (the same lazy
    path a direct lookup takes), and RepositoryModelLoad of the ensemble
    loads its composing models — Triton loads ensemble dependencies with
    the ensemble.  Regression (round-5 review): a model_ready precheck
    briefly made every not-yet-loaded member NOT_FOUND at infer."""
    pytest.importorskip("grpc")
    from rs_face_detection_tpu.runtime.server import serve
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    def make_builder(name, k):
        def builder():
            return ModelSpec(name, (8, 8, 3), "image"), _ScaleNCHW(k), {}

        return builder

    reg = ModelRegistry()
    reg.register_builder("scale2", make_builder("scale2", 2.0))
    reg.register_builder("scale3", make_builder("scale3", 3.0))
    defn = parse_ensemble(
        "ens6",
        _config(
            [
                _step("scale2", {"data": "IMAGE"}, {"output": "MID"}),
                _step("scale3", {"data": "MID"}, {"output": "OUT"}),
            ]
        ),
    )
    reg.register(ModelSpec("ens6", (8, 8, 3), "ensemble"), defn, {})
    assert not reg.model_ready("scale2") and not reg.model_ready("scale3")

    server = serve(None, reg, port=0)
    try:
        client = TritonWireClient(f"localhost:{server._rsfd_port}")
        try:
            x = np.random.default_rng(5).random((1, 3, 8, 8), np.float32)
            ((oname, _shape, arr),) = client.model_infer(
                "ens6", x, input_name="IMAGE"
            )
            assert oname == "OUT"
            np.testing.assert_allclose(arr, 6.0 * x, rtol=1e-6)
            # first use loaded them
            assert reg.model_ready("scale2") and reg.model_ready("scale3")

            # RepositoryModelLoad of the ensemble re-loads unloaded members
            reg.unload("scale2")
            reg.unload("scale3")
            client.repository_model_load("ens6")
            assert reg.model_ready("scale2") and reg.model_ready("scale3")
        finally:
            client.close()
    finally:
        server.stop(0)

"""System shared-memory regions + the zero-copy ModelInfer wire path."""

import json
import os
import uuid

import numpy as np
import pytest

from rs_face_detection_tpu.runtime.shm import (
    SharedMemoryRegistry,
    SharedRegion,
)


def _key():
    return f"rsfd_test_{uuid.uuid4().hex[:12]}"


def test_region_create_attach_roundtrip():
    key = _key()
    with SharedRegion.create(key, 1 << 16) as creator:
        arr = np.arange(1000, dtype=np.float32).reshape(10, 100)
        creator.write_array(arr, offset=128)
        attached = SharedRegion.attach(key, 1 << 16)
        got = attached.read_array("float32", (10, 100), offset=128)
        np.testing.assert_array_equal(got, arr)
        # Same physical pages: a write through one mapping is visible in
        # the other without any copy.
        creator.write_array(np.full((4,), 7, np.int64), offset=0)
        np.testing.assert_array_equal(
            attached.read_array("int64", (4,), 0), np.full((4,), 7, np.int64)
        )
        attached.close()
    assert not os.path.exists(f"/dev/shm/{key}")  # creator unlinks


def test_region_bounds_and_keys():
    key = _key()
    with SharedRegion.create(key, 256) as region:
        with pytest.raises(ValueError):
            region.write_array(np.zeros(1024, np.uint8), 0)
        with pytest.raises(ValueError):
            region.read_array("uint8", (16,), offset=250)
        with pytest.raises(ValueError):
            region.read_array("uint8", (16,), offset=-1)
    with pytest.raises(ValueError):
        SharedRegion.create("../escape", 64)
    with pytest.raises(ValueError):
        SharedRegion.create("", 64)
    with pytest.raises(ValueError):
        SharedRegion.create(_key(), 0)
    # attach validates the claimed size against the real segment
    key2 = _key()
    with SharedRegion.create(key2, 128):
        with pytest.raises(ValueError):
            SharedRegion.attach(key2, 4096)


def test_bfloat16_roundtrip():
    """Extension dtypes (bf16) must ride the shm path — the buffer protocol
    rejects them, so write_array byte-views via numpy, not memoryview."""
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16)
    key = _key()
    with SharedRegion.create(key, 4096) as region:
        arr = np.arange(64, dtype=np.float32).astype(bf16).reshape(8, 8)
        n = region.write_array(arr, offset=64)
        assert n == 128  # 2 bytes/element
        got = region.read_array(bf16, (8, 8), offset=64)
        np.testing.assert_array_equal(got, arr)
        # dtype-name round trip (what the wire carries)
        got2 = region.read_array(arr.dtype.name, (8, 8), offset=64)
        assert got2.dtype == bf16


def test_negative_shape_rejected():
    key = _key()
    with SharedRegion.create(key, 256) as region:
        with pytest.raises(ValueError, match="negative dimension"):
            region.read_array("float32", (-1,), 0)
        with pytest.raises(ValueError):
            region.read_array("float32", (4, -2), 0)


def test_attach_refuses_symlink():
    target_key, link_key = _key(), _key()
    with SharedRegion.create(target_key, 256):
        os.symlink(f"/dev/shm/{target_key}", f"/dev/shm/{link_key}")
        try:
            with pytest.raises(ValueError, match="symlink"):
                SharedRegion.attach(link_key, 256)
        finally:
            os.unlink(f"/dev/shm/{link_key}")


def test_registry_register_status_unregister():
    reg = SharedMemoryRegistry()
    key = _key()
    with SharedRegion.create(key, 512):
        reg.register("regionA", key, 512)
        assert reg.status() == {"regionA": {"key": key, "byte_size": 512}}
        assert reg.status("regionA")["regionA"]["byte_size"] == 512
        with pytest.raises(ValueError):
            reg.register("regionA", key, 512)  # duplicate name
        with pytest.raises(KeyError):
            reg.status("nope")
        with pytest.raises(KeyError):
            reg.get("nope")
        assert reg.unregister("regionA") == ["regionA"]
        with pytest.raises(KeyError):
            reg.unregister("regionA")
        # unregister-all (Triton empty-name semantics)
        reg.register("r1", key, 512)
        reg.register("r2", key, 256)
        assert sorted(reg.unregister(None)) == ["r1", "r2"]
        assert reg.status() == {}
    with pytest.raises(FileNotFoundError):
        reg.register("gone", key, 512)


def test_servicer_shm_verbs_and_infer():
    """Drive the verb handlers directly (no gRPC socket needed)."""
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.server import FacePipelineServicer

    reg = ModelRegistry()

    def builder():
        spec = ModelSpec("doubler", (4,), "array")

        class M:
            def apply(self, variables, x, train=False):
                return x * 2.0

        return spec, M(), {}

    reg.register_builder("doubler", builder)
    s = FacePipelineServicer(None, reg)

    key = _key()
    with SharedRegion.create(key, 4096) as region:
        res = json.loads(
            s.system_shared_memory_register(
                json.dumps({"name": "r", "key": key, "byte_size": 4096}).encode()
            )
        )
        assert res == {"name": "r", "registered": True}
        res = json.loads(s.system_shared_memory_status(b"{}"))
        assert res["regions"]["r"]["byte_size"] == 4096

        x = np.arange(8, dtype=np.float32).reshape(2, 4)
        region.write_array(x, 0)
        body = {
            "name": "doubler",
            "input_shm": {
                "region": "r",
                "offset": 0,
                "dtype": "float32",
                "shape": [2, 4],
            },
            "output_shm": {"region": "r", "offset": 1024},
        }
        res = json.loads(s.model_infer(json.dumps(body).encode()))
        assert "error" not in res, res
        (desc,) = res["outputs_shm"]
        out = region.read_array(desc["dtype"], tuple(desc["shape"]), desc["offset"])
        np.testing.assert_allclose(out, x * 2.0)

        # error contracts: unknown region, too-small output region
        bad = dict(body, input_shm=dict(body["input_shm"], region="nope"))
        assert "error" in json.loads(s.model_infer(json.dumps(bad).encode()))
        tight = dict(body, output_shm={"region": "r", "offset": 4090})
        sentinel = np.full((1,), 123.0, np.float32)
        region.write_array(sentinel, 4090 - 4090 % 4)
        res = json.loads(s.model_infer(json.dumps(tight).encode()))
        assert "bad output_shm" in res["error"]
        # the failed request must not have mutated the region
        np.testing.assert_array_equal(
            region.read_array("float32", (1,), 4090 - 4090 % 4), sentinel
        )
        bad_out = dict(body, output_shm={"region": "nope", "offset": 0})
        assert "bad output_shm" in json.loads(
            s.model_infer(json.dumps(bad_out).encode())
        )["error"]
        # a negative client-supplied shape must be a request error, not data
        neg = dict(body, input_shm=dict(body["input_shm"], shape=[-1]))
        assert "bad ModelInfer request" in json.loads(
            s.model_infer(json.dumps(neg).encode())
        )["error"]

        res = json.loads(s.system_shared_memory_unregister(b"{}"))
        assert res == {"unregistered": ["r"]}

    # CUDA verbs: typed refusal + empty status.
    assert "error" in json.loads(s.cuda_shared_memory_register(b"{}"))
    assert json.loads(s.cuda_shared_memory_status(b"{}")) == {"regions": {}}


def test_shm_model_infer_over_the_wire():
    """Full client/server round trip: bytes stay out of the channel."""
    grpc = pytest.importorskip("grpc")  # noqa: F841
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.server import FacePipelineClient, serve

    reg = ModelRegistry()

    def builder():
        spec = ModelSpec("negate", (4,), "array")

        class M:
            def apply(self, variables, x, train=False):
                return -x

        return spec, M(), {}

    reg.register_builder("negate", builder)
    server = serve(None, reg, port=0)
    client = FacePipelineClient("localhost", server._rsfd_port)
    try:
        key = _key()
        with SharedRegion.create(key, 1 << 20) as region:
            client.register_region("zones", region)
            assert client.system_shared_memory_status()["regions"]["zones"][
                "byte_size"
            ] == 1 << 20

            x = np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32)
            (out,) = client.model_infer_shm("negate", x, region)
            np.testing.assert_allclose(out, -x, rtol=1e-6)
            # parity with the inline path
            inline = client.model_infer("negate", x)
            np.testing.assert_allclose(out, inline, rtol=1e-6)

            # unregistered region -> client-side error
            with SharedRegion.create(_key(), 256) as other:
                with pytest.raises(RuntimeError, match="not registered"):
                    client.model_infer_shm("negate", x, other)

            client.system_shared_memory_unregister("zones")
            assert client.system_shared_memory_status()["regions"] == {}
            assert "error" in client.cuda_shared_memory_register("c")
    finally:
        client.close()
        server.stop(0)


def test_client_timeout_deadline():
    """timeout_s turns a wedged verb into DEADLINE_EXCEEDED, not a hang."""
    import time

    grpc = pytest.importorskip("grpc")
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec
    from rs_face_detection_tpu.runtime.server import FacePipelineClient, serve

    reg = ModelRegistry()

    def builder():
        spec = ModelSpec("slow", (1,), "array")

        class M:
            def apply(self, v, x, train=False):
                time.sleep(3.0)
                return x

        return spec, M(), {}

    reg.register_builder("slow", builder)
    server = serve(None, reg, port=0)
    client = FacePipelineClient("localhost", server._rsfd_port, timeout_s=0.5)
    try:
        reg.load("slow")  # don't count builder time against the deadline
        t0 = time.monotonic()
        with pytest.raises(grpc.RpcError) as err:
            client.model_infer("slow", np.zeros((1, 1), np.float32))
        assert err.value.code() == grpc.StatusCode.DEADLINE_EXCEEDED
        assert time.monotonic() - t0 < 2.5
        # liveness verbs still answer within the deadline
        assert client.server_live() is True
    finally:
        client.close()
        server.stop(0)

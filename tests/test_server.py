"""gRPC facade: real server/client round-trip on localhost."""

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")
cv2 = pytest.importorskip("cv2")

from rs_face_detection_tpu.configs import FaceDetectionConfig, FacePipelineConfig
from rs_face_detection_tpu.models.registry import (
    ModelRegistry,
    ModelSpec,
    _attach_standard_builders,
)
from rs_face_detection_tpu.pipeline.face_pipeline import FacePipeline
from rs_face_detection_tpu.runtime.server import FacePipelineClient, serve


@pytest.fixture(scope="module")
def server_port():
    from conftest import attach_fast_head_builders

    reg = ModelRegistry()
    _attach_standard_builders(reg)
    attach_fast_head_builders(reg)

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    reg.register_builder("face_detection_retina", small_detection_builder)
    cfg = FacePipelineConfig(
        detection=FaceDetectionConfig(
            image_size=(64, 64),
            confidence_threshold=0.3,
            max_candidates=64,
            max_detections=16,
        )
    )
    pipeline = FacePipeline(cfg, registry=reg)
    server = serve(pipeline, reg, port=0)
    yield server._rsfd_port
    server.stop(0)


@pytest.fixture(scope="module")
def client(server_port):
    c = FacePipelineClient("localhost", server_port)
    yield c
    c.close()


def _jpeg(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    return buf.tobytes()


def test_health_verbs(client):
    assert client.server_live() is True
    assert client.server_ready() is True


def test_extract_round_trip(client):
    result = client.extract(_jpeg())
    assert "face_count" in result
    if result["facial_feature"] is not None:
        assert len(result["facial_feature"]) == 512
        norm = np.linalg.norm(result["facial_feature"])
        assert norm == pytest.approx(1.0, rel=1e-4)


def test_detect_round_trip(client):
    result = client.detect(_jpeg(1))
    boxes = np.asarray(result["boxes"])
    kps = np.asarray(result["keypoints"])
    if boxes.size:
        assert boxes.shape[1] == 5
        assert kps.shape[1:] == (5, 2)


def test_repository_and_statistics(client):
    index = client.repository_index()
    names = {m["name"] for m in index}
    assert "face_detection_retina" in names
    assert client.model_ready("face_detection_retina") is True
    assert client.model_ready("nonexistent") is False
    stats = client.model_statistics("nonexistent")
    assert "error" in stats

    # Statistics must reflect pipeline traffic (not just registry.infer).
    client.detect(_jpeg(7))
    stats = client.model_statistics("face_detection_retina")
    assert stats["execution_count"] >= 1
    assert stats["inference_count"] >= 1
    assert stats["cumulative_duration_s"] > 0


def test_extract_garbage_bytes_returns_error(client):
    result = client.extract(b"definitely not an image")
    assert "error" in result


def test_repository_load_unload_round_trip(client):
    """RepositoryModelLoad/Unload verbs (client.rs:127-146 parity)."""
    name = "face_quality"
    r = client.repository_model_load(name)
    assert r == {"name": name, "loaded": True}
    assert client.model_ready(name) is True
    cfg = client.model_config(name)
    assert cfg["name"] == name and len(cfg["input_shape"]) == 3

    r = client.repository_model_unload(name)
    assert r["loaded"] is False
    assert client.model_ready(name) is False
    # Re-loadable after unload (builder still registered).
    assert client.repository_model_load(name)["loaded"] is True

    r = client.repository_model_load("nonexistent")
    assert r["loaded"] is False and "error" in r


def test_detect_stream_round_trip(client):
    """Server-streaming DetectStream (ModelStreamInfer analog): >= 2 batches
    (stream_batch_size=4 on the test server, 6 images -> 2 device batches),
    one in-order result per image."""
    payloads = [_jpeg(seed) for seed in range(6)]
    results = list(client.detect_stream(payloads))
    assert len(results) == len(payloads)
    for result in results:
        assert "error" not in result
        boxes = np.asarray(result["boxes"])
        if boxes.size:
            assert boxes.shape[1] == 5

    # Stream results must agree with unary Detect on the same payload.
    # (The stream path letterboxes with cv2 on host, the unary path with
    # jax.image.resize on device — sub-pixel rounding differs, which can
    # reorder near-tied scores; compare as sets with a pixel tolerance.)
    unary = client.detect(payloads[0])
    got = np.asarray(results[0]["boxes"], np.float32)
    want = np.asarray(unary["boxes"], np.float32)
    assert got.shape == want.shape
    order_g = np.lexsort((got[:, 1], got[:, 0]))
    order_w = np.lexsort((want[:, 1], want[:, 0]))
    np.testing.assert_allclose(
        got[order_g], want[order_w], rtol=1e-2, atol=0.1
    )


def test_runtime_entrypoint_serves():
    """`python -m rs_face_detection_tpu.runtime` must come up and answer the
    health verbs (no warmup: liveness needs no model compile)."""
    import os
    import re
    import subprocess
    import sys
    import time

    grpc = pytest.importorskip("grpc")  # noqa: F841

    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "rs_face_detection_tpu.runtime", "--port", "0"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        port = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            m = re.search(r"serving on :(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
            if proc.poll() is not None:
                raise AssertionError(f"server exited early: {line}")
        assert port, "server never announced its port"

        from rs_face_detection_tpu.runtime.server import FacePipelineClient

        client = FacePipelineClient(port=port)
        try:
            assert client.server_live() is True
            assert client.server_ready() is True
        finally:
            client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_server_and_model_metadata(client):
    meta = client.server_metadata()
    assert meta["name"] == "rs_face_detection_tpu"
    assert meta["version"]
    assert "trace" in meta["extensions"]
    assert meta["device_count"] >= 1

    mm = client.model_metadata("face_detection_retina")
    assert mm["name"] == "face_detection_retina"
    assert mm["platform"] == "jax_xla"
    assert mm["inputs"][0]["shape"] == [-1, 64, 64, 3]
    assert mm["outputs"][0]["spec"]
    assert "error" in client.model_metadata("nonexistent")


def test_trace_setting_round_trip(client, tmp_path):
    assert client.trace_setting("status")["active"] is False
    started = client.trace_setting("start", trace_dir=str(tmp_path / "tr"))
    assert started["active"] is True and started["dir"]
    # Double-start reports the active trace instead of clobbering it.
    again = client.trace_setting("start")
    assert "error" in again and again["dir"] == started["dir"]
    assert client.trace_setting("status")["active"] is True
    # Traffic lands inside the trace window, then stop makes it readable.
    client.detect(_jpeg(11))
    stopped = client.trace_setting("stop")
    assert stopped["active"] is False and stopped["dir"] == started["dir"]
    import glob as _glob
    import os as _os

    assert _glob.glob(
        _os.path.join(stopped["dir"], "**", "*.xplane.pb"), recursive=True
    ), "profiler trace produced no xplane file"
    assert "error" in client.trace_setting("stop")  # nothing active now
    assert "error" in client.trace_setting("bogus")


def test_detect_wire_round_trip_with_dynamic_batching():
    """serve(dynamic_batching=True): concurrent client Detects coalesce into
    device batches (runtime/batcher.py) with the same JSON contract, and
    ServerMetadata reports the coalescing counters."""
    import threading

    from conftest import attach_fast_head_builders

    reg = ModelRegistry()
    _attach_standard_builders(reg)
    attach_fast_head_builders(reg)

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    reg.register_builder("face_detection_retina", small_detection_builder)
    cfg = FacePipelineConfig(
        detection=FaceDetectionConfig(
            image_size=(64, 64),
            confidence_threshold=0.3,
            max_candidates=64,
            max_detections=16,
        )
    )
    pipeline = FacePipeline(cfg, registry=reg)
    server = serve(
        pipeline, reg, port=0, max_workers=8,
        dynamic_batching=True, batch_delay_ms=25.0,
    )
    try:
        c = FacePipelineClient("localhost", server._rsfd_port)
        c.detect(_jpeg(0))  # compile the batch graph before the burst

        outs = [None] * 12
        start = threading.Barrier(4)

        def client_thread(w):
            start.wait()
            for i in range(w, len(outs), 4):
                outs[i] = c.detect(_jpeg(100 + i))

        threads = [
            threading.Thread(target=client_thread, args=(w,))
            for w in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for out in outs:
            assert "boxes" in out and "keypoints" in out, out

        meta = c.server_metadata()
        assert meta["dynamic_batching"] is True
        stats = meta["dynamic_batching_stats"]
        assert stats["requests"] >= 13
        assert any(int(k) > 1 for k in stats["batch_size_counts"])
        c.close()
    finally:
        server.stop(0)


def test_model_infer_wire_round_trip(client):
    """Generic ModelInfer verb: typed tensors over the wire (base64 .npy),
    running any registered model — the reference's workhorse RPC."""
    rng = np.random.default_rng(3)
    batch = rng.normal(size=(2, 112, 112, 3)).astype(np.float32)
    out = client.model_infer("face_quality", batch)
    assert out.shape[0] == 2 and np.isfinite(out).all()

    # Statistics must register the traffic, like every inference verb.
    stats = client.model_statistics("face_quality")
    assert stats["execution_count"] >= 1

    with pytest.raises(RuntimeError):
        client.model_infer("nonexistent_model", batch)


def test_ekyc_verify_wire_round_trip():
    """EkycVerify: the full eKYC verify flow served over the wire (the
    reference planned this pipeline but shipped an empty struct)."""
    from test_ekyc import _tiny_registry

    from rs_face_detection_tpu.pipeline.ekyc_pipeline import EKYCPipeline

    reg = _tiny_registry()
    ekyc = EKYCPipeline(registry=reg, detector_image_size=(96, 96))
    server = serve(None, reg, port=0, ekyc_pipeline=ekyc)
    c = None
    try:
        c = FacePipelineClient("localhost", server._rsfd_port)
        out = c.ekyc_verify(_jpeg(1), _jpeg(2))
        assert "error" not in out
        assert set(out) >= {
            "similarity", "same_person", "same_ekyc",
            "card_face_found", "selfie_face_found",
        }
        assert isinstance(out["similarity"], float)
        if out["card_face_found"]:
            assert len(out["card_face_box"]) == 5
        # In-process oracle: the wire result must match verify() directly.
        direct = ekyc.verify(_jpeg(1), _jpeg(2))
        assert out["card_face_found"] == direct.card_face_found
        assert out["same_person"] == direct.same_person
        np.testing.assert_allclose(
            out["similarity"], direct.similarity, atol=1e-5
        )

        # Bad request keeps the JSON error contract (never a raw UNKNOWN).
        bad = c._call("EkycVerify", b"not json")
        assert "error" in bad
    finally:
        if c is not None:
            c.close()
        server.stop(0)


def test_extract_wire_round_trip_with_dynamic_batching():
    """serve(dynamic_batching=True): concurrent Extract calls coalesce
    through FacePipeline.extract_batch (the 2-dispatch throughput path)
    with the same JSON contract; ServerMetadata reports its counters."""
    import threading

    from conftest import attach_fast_head_builders

    reg = ModelRegistry()
    _attach_standard_builders(reg)
    attach_fast_head_builders(reg)

    def small_detection_builder():
        from rs_face_detection_tpu.models.retinaface import init_retinaface

        model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
        return (
            ModelSpec("face_detection_retina", (64, 64, 3), "maps"),
            model,
            variables,
        )

    reg.register_builder("face_detection_retina", small_detection_builder)
    cfg = FacePipelineConfig(
        detection=FaceDetectionConfig(
            image_size=(64, 64),
            confidence_threshold=0.3,
            max_candidates=64,
            max_detections=16,
        )
    )
    pipeline = FacePipeline(cfg, registry=reg)
    server = serve(
        pipeline, reg, port=0, max_workers=8,
        dynamic_batching=True, batch_delay_ms=25.0,
    )
    try:
        c = FacePipelineClient("localhost", server._rsfd_port)
        first = c.extract(_jpeg(0))  # compile the batch graphs pre-burst
        assert "face_count" in first, first

        outs = [None] * 8
        start = threading.Barrier(4)

        def client_thread(w):
            start.wait()
            for i in range(w, len(outs), 4):
                outs[i] = c.extract(_jpeg(200 + i))

        threads = [
            threading.Thread(target=client_thread, args=(w,))
            for w in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for out in outs:
            assert "face_count" in out and "error" not in out, out

        # Garbage bytes keep the JSON error contract through the batcher
        # (per-item retry isolates the failure).
        bad = c.extract(b"not an image")
        assert "error" in bad

        meta = c.server_metadata()
        stats = meta["extract_dynamic_batching_stats"]
        assert stats["requests"] >= 10
        assert any(int(k) > 1 for k in stats["batch_size_counts"])
        c.close()
    finally:
        server.stop(0)

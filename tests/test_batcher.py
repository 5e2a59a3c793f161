"""Dynamic request batching (runtime/batcher.py).

The batcher plays the Triton scheduler role the reference delegated to the
server (max_batch_size model configs; pipeline.rs fires 1-image requests):
concurrent single-image submits must coalesce into device batches without
changing any result, isolate per-request failures, and drain cleanly on
close.
"""

import threading

import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.parallel.serving import DetectionServer
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection
from rs_face_detection_tpu.runtime.batcher import DynamicBatcher


@pytest.fixture(scope="module")
def server():
    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    srv = DetectionServer(det, batch_size=8)
    # Pre-compile so the first coalesced batch doesn't time the jit.
    srv.detect_batch([np.zeros((64, 64, 3), np.uint8)])
    return srv


def test_concurrent_submits_coalesce_and_match(server):
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, size=(96, 80, 3), dtype=np.uint8)
        for _ in range(24)
    ]
    expected = [server.detect_batch([im])[0] for im in imgs]

    with DynamicBatcher(server, max_delay_ms=50.0) as batcher:
        start = threading.Barrier(8)

        futs = [None] * len(imgs)

        def client(worker):
            start.wait()
            for i in range(worker, len(imgs), 8):
                futs[i] = batcher.submit(imgs[i])

        threads = [
            threading.Thread(target=client, args=(w,)) for w in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=120) for f in futs]
        stats = batcher.stats()

    assert stats["requests"] == len(imgs)
    # 24 burst requests through an 8-wide server must coalesce: strictly
    # fewer batches than requests, and at least one multi-request batch.
    assert stats["batches"] < len(imgs)
    assert any(int(k) > 1 for k in stats["batch_size_counts"])
    # Triton inference_stats parity: queue/compute duration split.
    assert stats["cumulative_compute_s"] > 0
    assert stats["cumulative_queue_s"] >= 0
    assert stats["compute_ms"]["p50"] > 0
    assert stats["queue_ms"]["p99"] >= stats["queue_ms"]["p50"] >= 0
    for (b, k), (eb, ek) in zip(results, expected):
        np.testing.assert_allclose(b, eb, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(k, ek, rtol=1e-4, atol=1e-3)


def test_bad_payload_isolated(server):
    rng = np.random.default_rng(2)
    good = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    with DynamicBatcher(server, max_delay_ms=50.0) as batcher:
        f_good1 = batcher.submit(good)
        f_bad = batcher.submit(b"definitely not a jpeg")
        f_good2 = batcher.submit(good)
        b1, _ = f_good1.result(timeout=120)
        b2, _ = f_good2.result(timeout=120)
        with pytest.raises(Exception):
            f_bad.result(timeout=120)
    np.testing.assert_allclose(b1, b2, rtol=1e-5, atol=1e-4)


def test_close_rejects_and_drains(server):
    batcher = DynamicBatcher(server, max_delay_ms=1.0)
    img = np.zeros((64, 64, 3), np.uint8)
    fut = batcher.submit(img)
    batcher.close()
    boxes, kps = fut.result(timeout=120)  # already-queued work completes
    assert boxes.ndim == 2
    with pytest.raises(RuntimeError):
        batcher.submit(img)


def test_facade_detect_through_batcher(server):
    """The unary Detect verb with dynamic_batching=True returns the same
    JSON contract and feeds the coalescing stats into ServerMetadata."""
    import json

    import cv2

    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.runtime.server import FacePipelineServicer

    servicer = FacePipelineServicer(
        None, ModelRegistry(), dynamic_batching=True, batch_delay_ms=1.0
    )
    servicer._stream_server = server  # reuse the compiled module fixture

    img = np.zeros((96, 96, 3), np.uint8)
    img[20:70, 20:70] = 210
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    out = json.loads(servicer.detect(enc.tobytes()))
    assert "boxes" in out and "keypoints" in out

    meta = json.loads(servicer.server_metadata(b""))
    assert meta["dynamic_batching"] is True
    assert meta["dynamic_batching_stats"]["requests"] >= 1


def test_cancelled_future_does_not_kill_worker(server):
    """A caller cancelling its Future must not crash the worker thread
    (set_result on a cancelled Future raises InvalidStateError)."""
    img = np.zeros((64, 64, 3), np.uint8)
    with DynamicBatcher(server, max_delay_ms=200.0) as batcher:
        doomed = batcher.submit(img)
        assert doomed.cancel()  # not yet running: cancel succeeds
        ok = batcher.submit(img)  # same delay window -> same batch
        boxes, _ = ok.result(timeout=120)
        assert boxes.ndim == 2
        # Worker survived; a fresh batch still works.
        boxes2, _ = batcher.detect(img, timeout=120)
        assert boxes2.ndim == 2


def test_batcher_over_scrfd_server():
    """The batcher is detector-agnostic: an SCRFD DetectionServer coalesces
    concurrent submits with per-image parity, like the RetinaFace one."""
    from rs_face_detection_tpu.models.scrfd import init_scrfd
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64),
        confidence_threshold=0.4, registry=None,
    )
    srv = DetectionServer(det, batch_size=4, use_native_loader=False)
    srv.detect_batch([np.zeros((64, 64, 3), np.uint8)])  # pre-compile

    rng = np.random.default_rng(9)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        for _ in range(8)
    ]
    expected = [det(im) for im in imgs]
    with DynamicBatcher(srv, max_delay_ms=50.0) as batcher:
        start = threading.Barrier(8)

        futs = [None] * len(imgs)

        def submit(i):
            start.wait()
            futs[i] = batcher.submit(imgs[i])

        threads = [
            threading.Thread(target=submit, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, fut in enumerate(futs):
            boxes, kps = fut.result(timeout=120)
            np.testing.assert_allclose(
                boxes, expected[i][0], rtol=1e-4, atol=1e-3
            )
            np.testing.assert_allclose(
                kps, expected[i][1], rtol=1e-4, atol=1e-3
            )
        stats = batcher.stats()
    assert stats["batches"] < 8  # coalescing actually happened

"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.parallel.mesh import (
    fsdp_param_spec,
    make_mesh,
)


def test_mesh_construction():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_fsdp_param_spec_rules():
    mesh = make_mesh(8, model_parallel=2)
    from jax.sharding import PartitionSpec as P

    assert fsdp_param_spec((3, 3, 8, 16), mesh) == P(None, None, None, "model")
    assert fsdp_param_spec((7,), mesh) == P()  # too small / indivisible
    assert fsdp_param_spec((), mesh) == P()
    assert fsdp_param_spec((4, 6), mesh) == P(None, "model")
    # model_parallel=1 -> everything replicated.
    mesh1 = make_mesh(8)
    assert fsdp_param_spec((3, 3, 8, 16), mesh1) == P()


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_runs(model_parallel):
    from rs_face_detection_tpu.parallel.train import Trainer

    mesh = make_mesh(8, model_parallel=model_parallel)
    cfg = FaceDetectionConfig(image_size=(64, 64))
    trainer = Trainer(mesh, cfg, learning_rate=1e-3)
    state = trainer.init_state(seed=0)
    step = trainer.make_train_step()
    batch = trainer.make_batch(mesh.shape["data"] * 1, max_faces=4, seed=0)

    state, metrics = step(state, batch)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    assert metrics["num_pos"] >= 1
    # A second step must run (donation + stable shardings) and change the loss.
    state2, metrics2 = step(state, batch)
    assert int(state2.step) == 2
    assert np.isfinite(metrics2["loss"])


def test_detection_server_sharded_batch():
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    mesh = make_mesh(8)
    server = DetectionServer(det, mesh=mesh, batch_size=8)

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 255, size=(96, 80, 3), dtype=np.uint8) for _ in range(8)
    ]
    results = server.detect_batch(imgs)
    assert len(results) == 8
    for boxes, kps in results:
        assert boxes.ndim == 2 and boxes.shape[1] == 5
        assert kps.shape == (boxes.shape[0], 5, 2)

    # Sharded result must match the unsharded single-image path.
    single = DetectionServer(det, mesh=None, batch_size=8)
    results_single = single.detect_batch(imgs)
    for (b1, k1), (b2, k2) in zip(results, results_single):
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-3)


def test_detection_server_stream_pipelining():
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    server = DetectionServer(det, batch_size=4)

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(10)]
    out = []
    for chunk in server.detect_stream(iter(imgs)):
        out.extend(chunk)
    assert len(out) == 10


def test_detection_server_stream_error_propagates():
    """A corrupt payload mid-stream must raise, not deadlock (producer dies)."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    server = DetectionServer(det, batch_size=2)

    rng = np.random.default_rng(2)
    good = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    payloads = [good, good, b"corrupt bytes", good]
    with pytest.raises(ValueError):
        for _ in server.detect_stream(iter(payloads)):
            pass

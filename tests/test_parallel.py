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


def test_remat_train_step_matches():
    """Backbone rematerialization (Trainer(remat=True)) recomputes instead
    of saving block activations; the loss and updated params must match the
    standard step to float rounding."""
    from rs_face_detection_tpu.parallel.train import Trainer

    mesh = make_mesh(8)
    cfg = FaceDetectionConfig(image_size=(64, 64))
    losses, params = [], []
    for remat in (False, True):
        trainer = Trainer(mesh, cfg, learning_rate=1e-3, remat=remat)
        state = trainer.init_state(seed=0)
        batch = trainer.make_batch(mesh.shape["data"], max_faces=4, seed=0)
        state, metrics = trainer.make_train_step()(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
        params.append(jax.device_get(state.params))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(params[0])
    flat1 = jax.tree_util.tree_leaves(params[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


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


def test_detection_server_serves_scrfd():
    """DetectionServer duck-types the detector: the eKYC SCRFD detector
    serves through the same batched (and mesh-sharded) machinery, matching
    its single-image path."""
    from rs_face_detection_tpu.models.scrfd import init_scrfd
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

    model, variables = init_scrfd((64, 64), width=8, seed=0)
    det = SCRFDDetection(
        model=model, variables=variables, image_size=(64, 64),
        confidence_threshold=0.4, registry=None,
    )
    server = DetectionServer(det, batch_size=4, use_native_loader=False)
    # The in-house SCRFD takes the dense s4d front (ops/scrfd_s4d.py).
    assert server._layout == "s4d"

    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    results = server.detect_batch(imgs)
    assert len(results) == 4
    for img, (boxes, kps) in zip(imgs, results):
        ref_boxes, ref_kps = det(img)
        np.testing.assert_allclose(boxes, ref_boxes, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(kps, ref_kps, rtol=1e-4, atol=1e-3)

    # Mesh-sharded path (no fold/aux protocol on the SCRFD batched fn).
    sharded = DetectionServer(
        det, mesh=make_mesh(8), batch_size=8, use_native_loader=False
    )
    results_sharded = sharded.detect_batch(imgs)
    for (b1, k1), (b2, k2) in zip(results_sharded, results):
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-3)


def test_detection_server_pre_s2d_matches_detector():
    """An s2d-stem detector served via DetectionServer (host s2d layout)
    returns the same boxes as calling the detector directly."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        backbone="resnet50",
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=32,
        max_detections=8,
    )
    model, variables = init_retinaface("resnet50", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    server = DetectionServer(det, batch_size=2, use_native_loader=False)
    # Eligible R50 takes the dense-stem s4d host layout (falls back to s2d
    # for other s2d-stem models); either way results must match the
    # single-image detector path.
    assert server._layout == "s4d"

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8) for _ in range(2)]
    results = server.detect_batch(imgs)
    for img, (boxes, kps) in zip(imgs, results):
        ref_boxes, ref_kps = det(img)
        np.testing.assert_allclose(boxes, ref_boxes, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(kps, ref_kps, rtol=1e-4, atol=1e-3)


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


def test_detection_loss_ohem_selects_hard_negatives():
    from rs_face_detection_tpu.parallel.train import detection_loss

    n = 64
    anchors = np.zeros((n, 4), np.float32)
    for i in range(n):
        anchors[i] = [i * 20, 0, i * 20 + 15, 15]
    gt = np.array([[0, 0, 15, 15]], np.float32)  # matches anchor 0 exactly
    gt_lms = np.zeros((1, 5, 2), np.float32)
    valid = np.array([True])

    logits = np.zeros((n, 2), np.float32)
    # Make a handful of negatives very confidently wrong (hard).
    logits[10:13, 1] = 8.0
    box_deltas = np.zeros((n, 4), np.float32)
    lm_deltas = np.zeros((n, 5, 2), np.float32)

    loss, metrics = detection_loss(
        jnp.asarray(logits),
        jnp.asarray(box_deltas),
        jnp.asarray(lm_deltas),
        jnp.asarray(anchors),
        jnp.asarray(gt),
        jnp.asarray(gt_lms),
        jnp.asarray(valid),
    )
    assert np.isfinite(float(loss))
    assert float(metrics["num_pos"]) == 1
    # With 1 positive and ratio 3, cls loss is driven by the 3 hard negatives
    # (CE ~ 8 each), not the ~61 easy ones (CE ~ 0.69 each, which would sum
    # to ~42 without OHEM).
    assert 20.0 < float(metrics["cls_loss"]) < 30.0


def test_arcface_margin_loss_behavior():
    from rs_face_detection_tpu.parallel.train import arcface_margin_loss

    rng = np.random.default_rng(0)
    w = rng.normal(size=(10, 32)).astype(np.float32)
    labels = np.arange(8) % 10
    # Embeddings pointing at their class weights -> low loss.
    good = w[labels] + rng.normal(0, 0.01, (8, 32)).astype(np.float32)
    # Embeddings pointing at the WRONG class -> high loss.
    bad = w[(labels + 5) % 10].astype(np.float32)
    loss_good = float(
        arcface_margin_loss(jnp.asarray(good), jnp.asarray(labels), jnp.asarray(w))
    )
    loss_bad = float(
        arcface_margin_loss(jnp.asarray(bad), jnp.asarray(labels), jnp.asarray(w))
    )
    assert loss_good < loss_bad
    assert np.isfinite(loss_good) and np.isfinite(loss_bad)
    # Margin must make the loss strictly harder than plain cosine softmax
    # (checked away from softmax saturation with noisier embeddings).
    noisy = (w[labels] + rng.normal(0, 2.0, (8, 32))).astype(np.float32)
    loss_margin = float(
        arcface_margin_loss(jnp.asarray(noisy), jnp.asarray(labels), jnp.asarray(w))
    )
    loss_nomargin = float(
        arcface_margin_loss(
            jnp.asarray(noisy), jnp.asarray(labels), jnp.asarray(w), margin=0.0
        )
    )
    assert loss_margin > loss_nomargin


def test_ema_params_track_training():
    """Trainer(ema_decay) maintains an exponential moving average of params
    with the documented blend; off by default (ema_params is None)."""
    from rs_face_detection_tpu.parallel.train import Trainer

    mesh = make_mesh(8)
    cfg = FaceDetectionConfig(image_size=(64, 64))

    plain = Trainer(mesh, cfg, learning_rate=1e-3)
    state0 = plain.init_state(seed=0)
    assert state0.ema_params is None
    batch = plain.make_batch(mesh.shape["data"], max_faces=4, seed=0)
    state0, _ = plain.make_train_step()(state0, batch)
    assert state0.ema_params is None

    d = 0.5
    trainer = Trainer(mesh, cfg, learning_rate=1e-3, ema_decay=d)
    state = trainer.init_state(seed=0)
    init_params = jax.device_get(state.params)
    state, _ = trainer.make_train_step()(state, batch)
    params1 = jax.device_get(state.params)
    ema1 = jax.device_get(state.ema_params)
    expect = jax.tree.map(lambda e, p: d * e + (1 - d) * p, init_params, params1)
    for a, b in zip(jax.tree.leaves(ema1), jax.tree.leaves(expect)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_stream_feeds_statistics_and_close():
    """Streamed batches feed the registry counters like detect_batch
    (round-5 review: DetectStream/eval/video traffic was invisible to
    ModelStatistics), and close() releases the decode pool."""
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec

    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    reg = ModelRegistry()
    reg.register(
        ModelSpec(cfg.model_name, (64, 64, 3), "maps"), model, variables
    )
    det = RetinaFaceDetection(
        cfg, model=model, variables=variables, registry=reg
    )
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        for _ in range(6)
    ]
    with DetectionServer(det, batch_size=4) as server:
        n = sum(len(c) for c in server.detect_stream(iter(imgs)))
    assert n == 6
    assert reg.statistics(cfg.model_name).inference_count == 6
    # after close(), the decode pool refuses new work
    with pytest.raises(RuntimeError):
        server.detect_batch(imgs[:2])


def test_sharded_server_weights_placed_once():
    """The mesh path must pre-place the weight tree under the replicated
    sharding (round-5 review: passing default-device-committed variables
    raw made jit re-broadcast ~the full tree every dispatch)."""
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
    server = DetectionServer(det, mesh=make_mesh(8), batch_size=8)
    import jax

    for leaf in jax.tree_util.tree_leaves(server._vars_repl):
        assert leaf.sharding == server._repl_sharding, leaf.sharding

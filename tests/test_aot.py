"""AOT serving artifacts (runtime/aot.py).

Exported artifacts must reproduce the live batched graph exactly, carry a
self-describing meta block, and re-hydrate without the model Python path
(jax.export deserialize -> XLA compile).  Cross-platform lowering for TPU
from this CPU host must at least serialize (the serving graph is pure XLA
ops — no platform-bound custom calls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection
from rs_face_detection_tpu.runtime.aot import export_detector, load_detector

SIZE = (64, 64)


@pytest.fixture(scope="module")
def det():
    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    model, variables = init_retinaface(
        "mobilenet025", SIZE, seed=3, stem_s2d=False
    )
    return RetinaFaceDetection(cfg, model=model, variables=variables)


def test_roundtrip_parity(det):
    blob = export_detector(det, batch_size=2, stem="s4d")
    loaded = load_detector(blob)
    assert loaded.meta["layout"] == "s4d"
    assert loaded.meta["batch_size"] == 2
    assert loaded.meta["image_size"] == list(SIZE)

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)

    d, k, c = loaded(det.variables, x, scales)
    ref = det.make_batched_fn(stem="s4d")(det.variables, x, scales)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(ref.count))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref.det), atol=1e-4)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.kps), atol=1e-4)


def test_artifact_is_weights_agnostic(det):
    """Same exported program serves different weights of the same
    architecture (the repository model/weights split)."""
    blob = export_detector(det, batch_size=1, stem="s4d")
    loaded = load_detector(blob)

    _, variables2 = init_retinaface("mobilenet025", SIZE, seed=7, stem_s2d=False)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (1, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((1,), jnp.float32)

    d1, _, c1 = loaded(det.variables, x, scales)
    d2, _, c2 = loaded(variables2, x, scales)
    # Different weights, same program: results must differ (and both run).
    assert not np.array_equal(np.asarray(d1), np.asarray(d2)) or int(
        c1[0]
    ) != int(c2[0])

    cfg2 = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    det2 = RetinaFaceDetection(
        cfg2, model=det.model, variables=variables2
    )
    ref2 = det2.make_batched_fn(stem="s4d")(variables2, x, scales)
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(ref2.det), atol=1e-4
    )


def test_tpu_cross_lowering_serializes(det):
    """platforms=('tpu',) lowering from the CPU host must serialize — the
    packed serving graph is portable StableHLO (no Pallas/custom calls)."""
    blob = export_detector(det, batch_size=1, stem="s4d", platforms=("tpu",))
    loaded = load_detector(blob)
    assert loaded.meta["format"] == "rsfd-aot-v1"
    if jax.default_backend() != "tpu":
        return  # execution needs the chip; serialization is the contract
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (1, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    d, k, c = loaded(
        det.variables,
        jnp.asarray(s4d_layout_host(imgs)),
        jnp.ones((1,), jnp.float32),
    )
    assert np.isfinite(np.asarray(d)).all()


def test_bad_blob_rejected():
    import io

    buf = io.BytesIO()
    np.savez(buf, meta=np.frombuffer(b'{"format": "other"}', dtype=np.uint8))
    with pytest.raises(ValueError):
        load_detector(buf.getvalue())


def test_generic_model_export_roundtrip():
    """export_model/load_model on a non-detector registry model."""
    from rs_face_detection_tpu.models.classifiers import init_resnet18_classifier
    from rs_face_detection_tpu.runtime.aot import export_model, load_model

    model, variables = init_resnet18_classifier(2, (32, 32), seed=0)
    blob = export_model(
        model, variables, (2, 32, 32, 3), name="face_quality", train=False
    )
    loaded = load_model(blob)
    assert loaded.meta["name"] == "face_quality"

    rng = np.random.default_rng(5)
    batch = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    got = loaded(variables, batch)
    ref = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_bf16_artifact_accepts_f32_checkpoint():
    """Artifacts exported with pre-cast bf16 kernels must serve a plain
    float32 registry checkpoint: prepare_variables recovers the traced
    dtypes from the artifact's own input avals."""
    from rs_face_detection_tpu.models.precision import cast_kernels

    cfg = FaceDetectionConfig(
        backbone="mobilenet025", image_size=SIZE, confidence_threshold=0.02
    )
    model, variables_f32 = init_retinaface(
        "mobilenet025", SIZE, dtype=jnp.bfloat16, seed=3, stem_s2d=False
    )
    det_bf16 = RetinaFaceDetection(
        cfg, model=model, variables=cast_kernels(variables_f32)
    )
    blob = export_detector(det_bf16, batch_size=1, stem="s4d")
    loaded = load_detector(blob)

    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (1, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    x = jnp.asarray(s4d_layout_host(imgs))
    scales = jnp.ones((1,), jnp.float32)

    # Call with the UNCAST float32 tree (what load_variables returns).
    d32, _, c32 = loaded(variables_f32, x, scales)
    d16, _, c16 = loaded(det_bf16.variables, x, scales)
    np.testing.assert_array_equal(np.asarray(c32), np.asarray(c16))
    np.testing.assert_allclose(np.asarray(d32), np.asarray(d16), atol=1e-3)


def test_scrfd_export_roundtrip():
    """The duck-typed export path: SCRFD's batched detect graph exports and
    re-hydrates with parity — the s4d fast path (default) with its weight
    fold, and the natural-layout stem='xla' variant."""
    from rs_face_detection_tpu.models.scrfd import init_scrfd
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import SCRFDDetection

    model, variables = init_scrfd(SIZE, width=8, seed=0)
    sdet = SCRFDDetection(
        model=model, variables=variables, image_size=SIZE,
        confidence_threshold=0.4, registry=None,
    )
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (2, SIZE[1], SIZE[0], 3), dtype=np.uint8)
    scales = jnp.ones((2,), jnp.float32)

    # Default export = the s4d fast path (fold/aux protocol exercised).
    blob = export_detector(sdet, batch_size=2)
    loaded = load_detector(blob)
    assert loaded.meta["layout"] == "s4d"
    assert loaded.meta["detector"] == "SCRFDDetection"
    x = jnp.asarray(s4d_layout_host(imgs))
    d, k, c = loaded(variables, x, scales)
    ref = sdet.make_batched_fn(stem="s4d")(variables, x, scales)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(ref.count))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref.det), atol=1e-4)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.kps), atol=1e-4)

    # Natural layout export (trivial empty fold path).
    blob2 = export_detector(sdet, batch_size=2, stem="xla")
    loaded2 = load_detector(blob2)
    assert loaded2.meta["layout"] == "none"
    d2, k2, c2 = loaded2(variables, jnp.asarray(imgs), scales)
    ref2 = sdet.make_batched_fn()(variables, jnp.asarray(imgs), scales)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(ref2.count))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(ref2.det), atol=1e-4
    )

"""Int8 weight quantization: accuracy, size, kernel parity, serving mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.ops.quantize import (
    dequantize_array,
    dequantize_tree,
    int8_matmul,
    quantize_array,
    quantize_tree,
    quantized_bytes,
)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.1, (128, 256)).astype(np.float32)
    q, s = quantize_array(w)
    assert q.dtype == np.int8
    assert s.shape == (1, 256)
    back = np.asarray(dequantize_array(jnp.asarray(q), jnp.asarray(s)))
    # Max error is half a quantization step per channel (+ f32 rounding).
    step = s[0]
    assert (np.abs(back - w) <= step * 0.5001 + 1e-6).all()
    rel = np.linalg.norm(back - w) / np.linalg.norm(w)
    assert rel < 0.01


def test_quantize_tree_skips_small_and_preserves_structure():
    params = {
        "dense": {"kernel": np.random.default_rng(1).normal(size=(64, 512)).astype(np.float32),
                  "bias": np.zeros(512, np.float32)},
        "bn": {"scale": np.ones(64, np.float32)},
    }
    qt = quantize_tree(params, min_size=1024)
    assert "::q" in qt["dense"]["kernel"]  # quantized
    assert isinstance(qt["dense"]["bias"], np.ndarray)  # too small: untouched
    assert isinstance(qt["bn"]["scale"], np.ndarray)
    # ~4x smaller overall (dominated by the kernel).
    orig = sum(np.asarray(v).nbytes for v in jax.tree.leaves(params))
    assert quantized_bytes(qt) < orig / 3
    back = dequantize_tree(qt)
    assert back["dense"]["kernel"].shape == (64, 512)
    np.testing.assert_allclose(np.asarray(back["dense"]["bias"]), 0.0)


def test_int8_matmul_kernel_matches_dequant_reference():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    w = rng.normal(0, 0.05, (256, 512)).astype(np.float32)
    q, s = quantize_array(w)
    expected = x.astype(np.float32) @ np.asarray(
        dequantize_array(jnp.asarray(q), jnp.asarray(s))
    )
    got = np.asarray(
        int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), block_n=256)
    )
    # bf16 compute inside the kernel: compare loosely to the f32 reference.
    np.testing.assert_allclose(got, expected, rtol=0.03, atol=0.05)


def test_quantized_extraction_embeddings_close():
    from rs_face_detection_tpu.models.arcface import init_arcface
    from rs_face_detection_tpu.pipeline.extraction import FaceExtraction

    model, variables = init_arcface("iresnet18", 512, (112, 112), seed=0)
    fe = FaceExtraction(model=model, variables=variables)
    fq = FaceExtraction(model=model, variables=variables, quantized=True)

    rng = np.random.default_rng(3)
    crops = [rng.uniform(0, 255, (112, 112, 3)).astype(np.float32) for _ in range(2)]
    e32 = fe(crops)
    e8 = fq(crops)
    cos = np.sum(e32 * e8, axis=1)  # both rows unit-norm
    assert (cos > 0.99).all(), cos

    # Quantized variables really are int8 underneath.
    leaves = jax.tree.leaves(fq.variables["params"])
    assert any(np.asarray(l).dtype == np.int8 for l in leaves)


# ---------------------------------------------------------------------------
# Full int8 inference (activations on the MXU): Int8Conv + quantize_retinaface.
# ---------------------------------------------------------------------------


def test_int8_conv_exact_on_grid():
    """When weights/activations sit exactly on the int8 grid, the int8 conv
    reproduces the float conv up to f32 accumulation order."""
    from rs_face_detection_tpu.models.layers import Int8Conv

    rng = np.random.default_rng(0)
    q = rng.integers(-127, 128, (3, 3, 4, 8)).astype(np.int8)
    s = (0.01 * (1 + np.arange(8))).astype(np.float32)
    xq = rng.integers(-127, 128, (1, 6, 6, 4)).astype(np.float32)
    sx = 0.5
    x = jnp.asarray(xq * sx)

    mod = Int8Conv(8, (3, 3))
    variables = {"params": {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(s)}}
    out = mod.apply(variables, x, jnp.float32(127 * sx))

    w = jnp.asarray(q.astype(np.float32) * s)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_int8_conv_calibration_records_amax():
    from rs_face_detection_tpu.models.layers import ConvBN

    mod = ConvBN(8, (3, 3), quant=True)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 3, (1, 6, 6, 4)), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    _, upd = mod.apply(variables, x, mutable=["quant_stats"])
    amax = float(jax.tree.leaves(upd["quant_stats"])[0])
    assert amax == float(jnp.max(jnp.abs(x)))


def test_quantize_retinaface_scores_close_and_int8():
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.ops.quantize import quantize_retinaface

    size = (64, 64)
    model, variables = init_retinaface("mobilenet025", size, seed=0)
    qmodel, qvars = quantize_retinaface(model, variables, size)

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3)).astype(np.float32)
    )
    of = model.apply(variables, x, train=False)
    oq = qmodel.apply(qvars, x, train=False)
    for stride in (8, 16, 32):
        d = np.abs(np.asarray(of[stride]["score"]) - np.asarray(oq[stride]["score"]))
        assert d.max() < 0.05, (stride, d.max())

    leaves = jax.tree.leaves(qvars["params"])
    assert any(np.asarray(l).dtype == np.int8 for l in leaves)
    # Calibration populated every recorded range.
    assert all(float(a) > 0 for a in jax.tree.leaves(qvars["quant_stats"]))


def test_quantized_detector_pipeline_runs():
    """int8 model drops into RetinaFaceDetection (incl. pre_s2d input)."""
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.ops.image import s2d_layout_host
    from rs_face_detection_tpu.ops.quantize import quantize_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        backbone="resnet50",
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=32,
        max_detections=8,
    )
    model, variables = init_retinaface("resnet50", cfg.image_size, seed=0)
    qmodel, qvars = quantize_retinaface(model, variables, cfg.image_size, n_calib=1)
    det = RetinaFaceDetection(cfg, model=qmodel, variables=qvars)

    imgs = np.random.default_rng(2).integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = det.make_batched_fn(pre_s2d=True)(
        det.variables, jnp.asarray(s2d_layout_host(imgs)), jnp.ones(2, jnp.float32)
    )
    assert out.det.shape == (2, 8, 5) and out.kps.shape == (2, 8, 5, 2)
    assert np.isfinite(np.asarray(out.det)).all()

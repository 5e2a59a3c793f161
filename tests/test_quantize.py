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

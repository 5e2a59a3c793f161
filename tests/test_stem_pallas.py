"""Fused Pallas stem kernel vs the op-for-op XLA chain.

The kernel (ops/stem_pallas.py) must reproduce s2d_stem_input + the s2d stem
ConvBN + ReLU + 3x3/s2 max-pool exactly (f32) / to bf16 rounding (serving
dtype), including the conv's zero padding of the *normalized* frame and the
pool's -inf padding — the borders are where fused re-implementations break.
Reference chain semantics: models/resnet.ResNet50 stem re-expression of the
Triton R50 first layers (face_detection.rs:254-284 treats the net as opaque).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s2d_layout_host, s2d_stem_input
from rs_face_detection_tpu.ops.stem_pallas import (
    fold_stem_params,
    fused_stem_s2d,
)
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

MEANS = (123.675, 116.28, 103.53)
STDS = (58.395, 57.12, 57.375)


def _xla_chain(pre, K, gamma, beta, mu, var, pixel_scale=1.0):
    x = s2d_stem_input(
        jnp.asarray(pre),
        MEANS,
        tuple(1.0 / s for s in STDS),
        post_div=pixel_scale,
        out_dtype=jnp.float32,
        pre_s2d=True,
    )
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(K),
        (1, 1),
        ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a = gamma / np.sqrt(var + 1e-5)
    y = jnp.maximum(y * a + (beta - mu * a), 0.0)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("hw", [(64, 96), (128, 64), (64, 64)])
def test_fused_stem_matches_xla_chain_f32(hw):
    rng = np.random.RandomState(0)
    h, w = hw
    imgs = rng.randint(0, 256, (2, h, w, 3), np.uint8)
    pre = s2d_layout_host(imgs)
    K = rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32) * 0.1
    mu = rng.randn(64).astype(np.float32) * 0.1
    var = rng.rand(64).astype(np.float32) + 0.5

    ref = _xla_chain(pre, K, gamma, beta, mu, var)
    w192, bn2, norm2 = fold_stem_params(
        jnp.asarray(K),
        jnp.asarray(gamma),
        jnp.asarray(beta),
        jnp.asarray(mu),
        jnp.asarray(var),
        MEANS,
        STDS,
        1.0,
    )
    got = fused_stem_s2d(
        jnp.asarray(pre),
        w192,
        bn2,
        norm2,
        compute_dtype=jnp.float32,
        out_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_fused_stem_bf16_close():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
    pre = s2d_layout_host(imgs)
    K = rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32) * 0.1
    mu = rng.randn(64).astype(np.float32) * 0.1
    var = rng.rand(64).astype(np.float32) + 0.5

    ref = np.asarray(_xla_chain(pre, K, gamma, beta, mu, var))
    w192, bn2, norm2 = fold_stem_params(
        jnp.asarray(K), jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mu),
        jnp.asarray(var), MEANS, STDS, 1.0,
    )
    got = np.asarray(
        fused_stem_s2d(jnp.asarray(pre), w192, bn2, norm2, interpret=True)
    ).astype(np.float32)
    peak = np.abs(ref).max()
    assert np.abs(got - ref).max() / peak < 0.02


def test_detector_pallas_stem_matches_xla_path():
    """End-to-end fused detect: stem='pallas' detections == stem='xla'."""
    cfg = FaceDetectionConfig(backbone="resnet50", image_size=(64, 64))
    model, variables = init_retinaface(
        "resnet50", (64, 64), dtype=jnp.float32, seed=0, stem_s2d=True
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    fn_x = det.make_batched_fn(pre_s2d=True, stem="xla")
    fn_p = det.make_batched_fn(pre_s2d=True, stem="pallas")

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    pre = jnp.asarray(s2d_layout_host(imgs))
    scales = jnp.ones((2,), jnp.float32)
    ox = fn_x(variables, pre, scales)
    op = fn_p(variables, pre, scales)
    np.testing.assert_array_equal(np.asarray(ox.count), np.asarray(op.count))
    np.testing.assert_allclose(
        np.asarray(ox.det), np.asarray(op.det), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ox.kps), np.asarray(op.kps), rtol=1e-4, atol=1e-3
    )


def test_pallas_stem_guard_rejects_bad_shapes():
    cfg = FaceDetectionConfig(backbone="resnet50", image_size=(72, 72))
    model, variables = init_retinaface(
        "resnet50", (72, 72), dtype=jnp.float32, seed=0, stem_s2d=True
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    with pytest.raises(ValueError):
        det.make_batched_fn(pre_s2d=True, stem="pallas")  # 36 % 16 != 0

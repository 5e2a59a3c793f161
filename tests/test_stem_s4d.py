"""Dense s4d stem re-expression vs the op-for-op s2d XLA chain.

ops/stem_s4d.py recasts normalize + 4x4/s1 s2d stem conv + BN + ReLU +
3x3/s2 max-pool as one dense 3x3x48->256 conv with phase-slice pool maxes.
f32 must be exact (same math, re-associated); the end-to-end detector path
with stem='s4d' must reproduce the stem='xla' detections.  Stem semantics:
models/resnet.ResNet50's re-expression of the Triton R50 first layers
(face_detection.rs:254-284 treats the network as opaque).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import (
    s2d_layout_host,
    s2d_stem_input,
    s4d_layout_host,
)
from rs_face_detection_tpu.ops.stem_s4d import fold_s4d_params, stem_s4d
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

MEANS = (123.675, 116.28, 103.53)
STDS = (58.395, 57.12, 57.375)


def _random_stem(rng):
    K = rng.randn(4, 4, 12, 64).astype(np.float32) * 0.1
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32) * 0.1
    mu = rng.randn(64).astype(np.float32) * 0.1
    var = rng.rand(64).astype(np.float32) + 0.5
    return K, gamma, beta, mu, var


def _s2d_chain(pre2, K, gamma, beta, mu, var):
    x = s2d_stem_input(
        jnp.asarray(pre2),
        MEANS,
        tuple(1.0 / s for s in STDS),
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


@pytest.mark.parametrize("hw", [(64, 96), (96, 64), (32, 32)])
def test_s4d_stem_exact_f32(hw):
    rng = np.random.RandomState(0)
    h, w = hw
    imgs = rng.randint(0, 256, (2, h, w, 3), np.uint8)
    K, gamma, beta, mu, var = _random_stem(rng)

    ref = _s2d_chain(s2d_layout_host(imgs), K, gamma, beta, mu, var)
    k4, a256, b256, m48, s48 = fold_s4d_params(
        jnp.asarray(K), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(mu), jnp.asarray(var), MEANS, STDS, 1.0,
    )
    got = stem_s4d(
        jnp.asarray(s4d_layout_host(imgs)), k4, a256, b256, m48, s48,
        compute_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_detector_s4d_stem_matches_xla_path():
    cfg = FaceDetectionConfig(backbone="resnet50", image_size=(64, 64))
    model, variables = init_retinaface(
        "resnet50", (64, 64), dtype=jnp.float32, seed=0, stem_s2d=True
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    fn_x = det.make_batched_fn(pre_s2d=True, stem="xla")
    fn_4 = det.make_batched_fn(stem="s4d")

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    scales = jnp.ones((2,), jnp.float32)
    ox = fn_x(variables, jnp.asarray(s2d_layout_host(imgs)), scales)
    o4 = fn_4(variables, jnp.asarray(s4d_layout_host(imgs)), scales)
    np.testing.assert_array_equal(np.asarray(ox.count), np.asarray(o4.count))
    np.testing.assert_allclose(
        np.asarray(ox.det), np.asarray(o4.det), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(ox.kps), np.asarray(o4.kps), rtol=1e-4, atol=1e-3
    )


def test_s4d_guard_rejects_odd_size():
    # mnet with the STANDARD stem is s4d-eligible since round 3
    # (ops/mnet_s4d.py; see test_mnet_s4d.py); rejection cases now are
    # non-multiple-of-4 sizes and s2d-stem mnet models.
    cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=(66, 66))
    model, variables = init_retinaface(
        "mobilenet025", (66, 66), dtype=jnp.float32, seed=0
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    with pytest.raises(ValueError):
        det.make_batched_fn(stem="s4d")

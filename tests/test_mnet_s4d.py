"""Dense mnet s4d front vs the op-for-op standard chain.

ops/mnet_s4d.py recasts normalize + conv1(3x3/s2) + ds1(dw+pw) + ds2.dw
(each with BN + leaky-ReLU) as four dense convs on the 4x4 space-to-depth
host layout.  f32 must match the standard chain to float-order tolerance,
and the end-to-end detector with stem='s4d' must reproduce the stem='xla'
detections.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.ops.image import s4d_layout_host
from rs_face_detection_tpu.ops.mnet_s4d import (
    fold_mnet_s4d_mid_params,
    fold_mnet_s4d_params,
    mnet_s4d_front,
    mnet_s4d_mid,
)
from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

MEANS = (11.2, 5.5, 7.75)
STDS = (1.5, 0.75, 1.25)


def _leaky(x, slope=0.1):
    return jnp.maximum(x, slope * x)


def _bn(y, p, s):
    a = np.asarray(p["scale"]) / np.sqrt(np.asarray(s["var"]) + 1e-5)
    return y * a + (np.asarray(p["bias"]) - np.asarray(s["mean"]) * a)


def _reference_front(imgs_u8, variables):
    """The standard chain, op for op, on the (B, H, W, 3) input."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    x = jnp.asarray(imgs_u8[..., ::-1], jnp.float32)  # BGR -> RGB
    mean = jnp.asarray(MEANS, jnp.float32)
    scale = 1.0 / jnp.asarray(STDS, jnp.float32)
    x = (x - mean) * scale

    def conv(x, kernel, strides, pad, groups=1):
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(kernel, jnp.float32),
            strides,
            pad,
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x = conv(x, p["conv1"]["Conv_0"]["kernel"], (2, 2), ((1, 1), (1, 1)))
    x = _leaky(_bn(x, p["conv1"]["BatchNorm_0"], s["conv1"]["BatchNorm_0"]))
    x = conv(
        x, p["ds1"]["dw"]["Conv_0"]["kernel"], (1, 1), ((1, 1), (1, 1)), groups=8
    )
    x = _leaky(_bn(x, p["ds1"]["dw"]["BatchNorm_0"], s["ds1"]["dw"]["BatchNorm_0"]))
    x = conv(x, p["ds1"]["pw"]["Conv_0"]["kernel"], (1, 1), ((0, 0), (0, 0)))
    x = _leaky(_bn(x, p["ds1"]["pw"]["BatchNorm_0"], s["ds1"]["pw"]["BatchNorm_0"]))
    x = conv(
        x, p["ds2"]["dw"]["Conv_0"]["kernel"], (2, 2), ((1, 1), (1, 1)), groups=16
    )
    x = _leaky(_bn(x, p["ds2"]["dw"]["BatchNorm_0"], s["ds2"]["dw"]["BatchNorm_0"]))
    return x  # (B, H/4, W/4, 16): un-phase-packed natural grid


@pytest.mark.parametrize("hw", [(32, 32), (32, 64), (64, 32)])
def test_mnet_front_exact_f32(hw):
    h, w = hw
    model, variables = init_retinaface("mobilenet025", (w, h), seed=3)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, h, w, 3), np.uint8)

    ref = _reference_front(imgs, variables)
    folded = fold_mnet_s4d_params(variables, MEANS, STDS, 1.0)
    got = mnet_s4d_front(
        jnp.asarray(s4d_layout_host(imgs)),
        folded,
        compute_dtype=jnp.float32,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def _reference_mid(front, variables):
    """ds2.pw + ds3(dw,pw) + ds4.dw, op for op, on the (B, H/4, W/4, 16) front."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]

    def conv(x, kernel, strides, pad, groups=1):
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(kernel, jnp.float32),
            strides,
            pad,
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x = jnp.asarray(front, jnp.float32)
    x = conv(x, p["ds2"]["pw"]["Conv_0"]["kernel"], (1, 1), ((0, 0), (0, 0)))
    x = _leaky(_bn(x, p["ds2"]["pw"]["BatchNorm_0"], s["ds2"]["pw"]["BatchNorm_0"]))
    x = conv(
        x, p["ds3"]["dw"]["Conv_0"]["kernel"], (1, 1), ((1, 1), (1, 1)), groups=32
    )
    x = _leaky(_bn(x, p["ds3"]["dw"]["BatchNorm_0"], s["ds3"]["dw"]["BatchNorm_0"]))
    x = conv(x, p["ds3"]["pw"]["Conv_0"]["kernel"], (1, 1), ((0, 0), (0, 0)))
    x = _leaky(_bn(x, p["ds3"]["pw"]["BatchNorm_0"], s["ds3"]["pw"]["BatchNorm_0"]))
    x = conv(
        x, p["ds4"]["dw"]["Conv_0"]["kernel"], (2, 2), ((1, 1), (1, 1)), groups=32
    )
    x = _leaky(_bn(x, p["ds4"]["dw"]["BatchNorm_0"], s["ds4"]["dw"]["BatchNorm_0"]))
    return x  # (B, H/8, W/8, 32)


@pytest.mark.parametrize("hw", [(32, 32), (32, 64)])
def test_mnet_mid_exact_f32(hw):
    h, w = hw
    model, variables = init_retinaface("mobilenet025", (w, h), seed=5)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, h, w, 3), np.uint8)

    front = _reference_front(imgs, variables)
    ref = _reference_mid(front, variables)
    mid = fold_mnet_s4d_mid_params(variables)
    got = mnet_s4d_mid(
        front, mid, compute_dtype=jnp.float32, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_detector_mnet_s4d_matches_xla_path():
    cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=(64, 64))
    model, variables = init_retinaface(
        "mobilenet025", (64, 64), dtype=jnp.float32, seed=0
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    fn_x = det.make_batched_fn(stem="xla")

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    scales = jnp.ones((2,), jnp.float32)
    ox = fn_x(variables, jnp.asarray(imgs), scales)
    # Default (s4d_mid=None) packs the mid chain at 64x64; False covers the
    # front-only path.
    for s4d_mid in (None, False):
        fn_4 = det.make_batched_fn(stem="s4d", s4d_mid=s4d_mid)
        o4 = fn_4(variables, jnp.asarray(s4d_layout_host(imgs)), scales)
        np.testing.assert_array_equal(
            np.asarray(ox.count), np.asarray(o4.count)
        )
        np.testing.assert_allclose(
            np.asarray(ox.det), np.asarray(o4.det), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(ox.kps), np.asarray(o4.kps), rtol=1e-4, atol=1e-3
        )


def test_mnet_s4d_guard_rejects_s2d_stem_model():
    """The fold needs the standard 3x3 stem kernel, not the s2d form."""
    cfg = FaceDetectionConfig(backbone="mobilenet025", image_size=(64, 64))
    model, variables = init_retinaface(
        "mobilenet025", (64, 64), dtype=jnp.float32, seed=0, stem_s2d=True
    )
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    with pytest.raises(ValueError, match="s4d"):
        det.make_batched_fn(stem="s4d")

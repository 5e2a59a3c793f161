"""On-device image preprocessing: letterbox, normalize, warp, crops.

The reference does all of this on host with OpenCV (aspect-preserving resize +
zero-pad: face_detection.rs:131-198; per-module normalize loops:
face_quality.rs:89-96, face_extraction.rs:64-72; warp_affine 112x112:
face_alignment.rs:119-126; scale-clamped square crops:
face_antispoofing.rs:342-385).  Here the pixel math lives on device as fused
XLA ops: uint8 HWC images stream to HBM once and every resize / normalize /
warp happens in the same jit graph as the network forward, so there is no
host<->device ping-pong between pipeline stages.

All shapes are static: the letterbox geometry is resolved at trace time from
the (static) input shape, matching the reference formulas exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def letterbox_geometry(
    src_h: int, src_w: int, dst_w: int, dst_h: int
) -> Tuple[int, int, float]:
    """Aspect-preserving resize target and scale for a letterboxed input.

    Mirrors face_detection.rs:140-153: returns (new_w, new_h, det_scale) where
    det_scale = new_h / src_h and the image is padded bottom/right to
    (dst_h, dst_w).
    """
    im_ratio = src_h / src_w
    model_ratio = dst_h / dst_w
    if im_ratio > model_ratio:
        new_h = dst_h
        new_w = int(new_h / im_ratio)
    else:
        new_w = dst_w
        new_h = int(new_w * im_ratio)
    # Degenerate aspect ratios truncate to 0, which would make det_scale 0
    # (and downstream box descaling divide by it): clamp to one row/column.
    new_w = max(new_w, 1)
    new_h = max(new_h, 1)
    det_scale = new_h / src_h
    return new_w, new_h, det_scale


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel bilinear resize of an (H, W, C) float image.

    jax.image.resize(method="linear", antialias=False) uses the same
    half-pixel-center convention as OpenCV INTER_LINEAR, so values match the
    reference's cv2-based resizes to float rounding.
    """
    if img.shape[0] == out_h and img.shape[1] == out_w:
        return img
    return jax.image.resize(
        img, (out_h, out_w, img.shape[2]), method="linear", antialias=False
    )


def letterbox(
    img_u8: jnp.ndarray, dst_w: int, dst_h: int
) -> Tuple[jnp.ndarray, float]:
    """Letterbox an (H, W, 3) uint8 image to (dst_h, dst_w, 3) float32.

    Returns (padded float image in [0, 255], det_scale).  det_scale is a
    Python float (static), usable to descale boxes outside the graph.
    """
    src_h, src_w = img_u8.shape[0], img_u8.shape[1]
    new_w, new_h, det_scale = letterbox_geometry(src_h, src_w, dst_w, dst_h)
    resized = resize_bilinear(img_u8.astype(jnp.float32), new_h, new_w)
    padded = jnp.zeros((dst_h, dst_w, 3), dtype=jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, resized, (0, 0, 0))
    return padded, det_scale


def bgr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Reverse the channel axis of an (..., 3) image."""
    return img[..., ::-1]


def normalize(
    img: jnp.ndarray,
    mean: Tuple[float, float, float],
    scale: Tuple[float, float, float],
) -> jnp.ndarray:
    """Per-channel (px - mean) * scale on an (..., 3) float image."""
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    scale_a = jnp.asarray(scale, dtype=img.dtype)
    return (img - mean_a) * scale_a


def s2d_layout_host(imgs_bgr_u8: np.ndarray) -> np.ndarray:
    """Host-side 2x2 space-to-depth reshuffle of (B, H, W, 3) uint8 frames.

    Returns (B, H/2, W/2, 12) uint8 with channel k = (bi*2 + bj)*3 + c (c in
    the source BGR order).  This is the input layout `s2d_stem_input`'s
    pre_s2d path and the native loader emit: the reshuffle is memcpy-speed on
    host, whereas on the TPU an 8-bit transpose costs as much as a float one
    (profiled: ~1.4 ms of relayout copies per R50 batch-8 step).
    """
    b, h, w, c = imgs_bgr_u8.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, imgs_bgr_u8.shape
    x = imgs_bgr_u8.reshape(b, h // 2, 2, w // 2, 2, 3)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 12)


def s4d_layout_host(imgs_bgr_u8: np.ndarray) -> np.ndarray:
    """Host-side 4x4 space-to-depth reshuffle of (B, H, W, 3) uint8 frames.

    Returns (B, H/4, W/4, 48) uint8 with channel (ry*4 + rx)*3 + c (c in the
    source BGR order) — the input layout of the dense-stem re-expression
    (ops/stem_s4d.py): a 3x3 conv on 48 channels replaces the MXU-hostile
    4x4/s1 conv on 12, with the 2x2 output phases carried in channels.
    Like `s2d_layout_host`, the reshuffle is memcpy-speed on host and rides
    the loader threads.
    """
    b, h, w, c = imgs_bgr_u8.shape
    assert c == 3 and h % 4 == 0 and w % 4 == 0, imgs_bgr_u8.shape
    x = imgs_bgr_u8.reshape(b, h // 4, 4, w // 4, 4, 3)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 4, w // 4, 48)


def s2d_stem_input(
    imgs_bgr_u8: jnp.ndarray,
    mean: Tuple[float, float, float],
    scale: Tuple[float, float, float],
    post_div: float = 1.0,
    out_dtype=jnp.float32,
    pre_s2d: bool = False,
) -> jnp.ndarray:
    """Fused BGR->RGB + 2x2 space-to-depth + normalize on uint8 frames.

    Produces the 12-channel stem input for space-to-depth backbones
    (models.resnet.ResNet50 / models.mobilenet.MobileNetV1_025 with
    stem_space_to_depth) from uint8 BGR frames: (B, H, W, 3), or, with
    pre_s2d=True, frames already reshuffled by `s2d_layout_host` /the native
    loader to (B, H/2, W/2, 12) — the production serving path, leaving only
    fusible elementwise work (convert + channel flip + normalize) on device.

    Numerically identical (same f32 op order, elements merely re-laid-out) to
        space_to_depth(
            (normalize(bgr_to_rgb(imgs.astype(f32)), mean, scale) / post_div
            ).astype(out_dtype), 2)
    with `mean`/`scale` per-channel RGB as in `normalize`.
    """
    if pre_s2d:
        x = imgs_bgr_u8
        assert x.shape[-1] == 12, x.shape
    else:
        b, h, w, c = imgs_bgr_u8.shape
        assert c == 3 and h % 2 == 0 and w % 2 == 0, imgs_bgr_u8.shape
        x = imgs_bgr_u8.reshape(b, h // 2, 2, w // 2, 2, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
    # s2d channel k = (bi*2 + bj)*3 + c with c still BGR; flip each block to RGB.
    perm = np.concatenate([np.arange(3)[::-1] + 3 * i for i in range(4)])
    x = x[..., perm]
    mean12 = jnp.asarray(np.tile(np.asarray(mean, np.float32), 4))
    scale12 = jnp.asarray(np.tile(np.asarray(scale, np.float32), 4))
    y = (x.astype(jnp.float32) - mean12) * scale12
    if post_div != 1.0:
        y = y / jnp.float32(post_div)
    return y.astype(out_dtype)


def warp_affine(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Affine-warp an (H, W, C) float image with a 2x3 src->dst matrix.

    Replaces cv2.warp_affine (face_alignment.rs:119-126): for every output
    pixel p the source location is M^-1 @ p and the value is bilinearly
    sampled with constant-zero border.  Runs on device as gathers + lerps, so
    alignment fuses with the downstream quality/embedding forward.
    """
    # Invert the 2x3 affine: [A | t] -> [A^-1 | -A^-1 t].
    a = matrix[:, :2]
    t = matrix[:, 2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    a_inv = (
        jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]], dtype=img.dtype)
        * inv_det
    )
    t_inv = -a_inv @ t

    ys = jnp.arange(out_h, dtype=img.dtype)
    xs = jnp.arange(out_w, dtype=img.dtype)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    src_x = a_inv[0, 0] * grid_x + a_inv[0, 1] * grid_y + t_inv[0]
    src_y = a_inv[1, 0] * grid_x + a_inv[1, 1] * grid_y + t_inv[1]

    return _bilinear_sample(img, src_x, src_y)


def _bilinear_sample(
    img: jnp.ndarray, src_x: jnp.ndarray, src_y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample (H, W, C) at float coords, constant-zero border."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # advanced indexing -> gather
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1.0 - wx)[..., None] + v11 * wx[..., None]
    return top * (1.0 - wy)[..., None] + bot * wy[..., None]


def crop_resize(
    img: jnp.ndarray,
    box_xyxy: jnp.ndarray,
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Crop an axis-aligned box (inclusive corners) and resize to (out_h, out_w).

    Device-side equivalent of the reference's Mat::roi + resize pattern
    (face_antispoofing.rs:323-337, face_alignment.rs:90-105).  The box is a
    traced (4,) [x1, y1, x2, y2] array; sampling uses the same half-pixel
    bilinear convention as OpenCV resize of an ROI of size
    (x2 - x1 + 1, y2 - y1 + 1).
    """
    x1, y1, x2, y2 = box_xyxy[0], box_xyxy[1], box_xyxy[2], box_xyxy[3]
    crop_w = x2 - x1 + 1.0
    crop_h = y2 - y1 + 1.0
    sx = crop_w / out_w
    sy = crop_h / out_h
    xs = (jnp.arange(out_w, dtype=img.dtype) + 0.5) * sx - 0.5 + x1
    ys = (jnp.arange(out_h, dtype=img.dtype) + 0.5) * sy - 0.5 + y1
    grid_x, grid_y = jnp.meshgrid(xs, ys)
    return _bilinear_sample(img, grid_x, grid_y)

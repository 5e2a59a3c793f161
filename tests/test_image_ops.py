"""Tests for on-device image ops: letterbox geometry, warp, crop-resize."""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.ops.image import (
    crop_resize,
    letterbox,
    letterbox_geometry,
    resize_bilinear,
    warp_affine,
)
from rs_face_detection_tpu.ops.umeyama import (
    umeyama_similarity,
    umeyama_similarity_np,
)

cv2 = pytest.importorskip("cv2")


def test_letterbox_geometry_matches_reference_formula():
    # Tall image: height bound (face_detection.rs:143-146).
    new_w, new_h, scale = letterbox_geometry(1280, 720, 640, 640)
    assert (new_w, new_h) == (int(640 / (1280 / 720)), 640)
    assert scale == 640 / 1280
    # Wide image: width bound.
    new_w, new_h, scale = letterbox_geometry(720, 1280, 640, 640)
    assert (new_w, new_h) == (640, int(640 * (720 / 1280)))
    assert scale == new_h / 720
    # Square: exact fit.
    assert letterbox_geometry(640, 640, 640, 640) == (640, 640, 1.0)


def test_letterbox_pads_bottom_right_with_zeros():
    img = np.full((100, 200, 3), 255, dtype=np.uint8)
    padded, scale = letterbox(jnp.asarray(img), 640, 640)
    padded = np.asarray(padded)
    assert padded.shape == (640, 640, 3)
    new_h = int(640 * 100 / 200)
    assert scale == new_h / 100
    assert (padded[:new_h, :640] > 0).all()
    assert (padded[new_h:, :] == 0).all()


def test_resize_bilinear_matches_cv2_inter_linear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(37, 53, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 112, 112))
    theirs = cv2.resize(img, (112, 112), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, theirs, atol=1e-2)


def test_warp_affine_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    m = np.array([[0.9, 0.1, 3.0], [-0.1, 0.9, 5.0]], dtype=np.float32)
    ours = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m), 48, 56))
    theirs = cv2.warpAffine(
        img, m, (56, 48), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
    )
    # Border pixels differ slightly (cv2 blends the constant border at edges);
    # compare interiors strictly and overall loosely.
    np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=1.0)


def test_crop_resize_matches_cv2_roi_resize():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(120, 160, 3)).astype(np.float32)
    box = np.array([10.0, 20.0, 89.0, 99.0], dtype=np.float32)  # 80x80 ROI
    ours = np.asarray(crop_resize(jnp.asarray(img), jnp.asarray(box), 56, 56))
    roi = img[20:100, 10:90]
    theirs = cv2.resize(roi, (56, 56), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours[1:-1, 1:-1], theirs[1:-1, 1:-1], atol=1.0)


def test_umeyama_matches_cv2_estimate_affine_partial_2d():
    src = np.array(
        [[30.0, 50.0], [70.0, 52.0], [50.0, 70.0], [38.0, 90.0], [66.0, 88.0]],
        dtype=np.float32,
    )
    m_true = np.array([[1.2, 0.3, 4.0], [-0.3, 1.2, -2.0]], dtype=np.float32)
    dst = src @ m_true[:, :2].T + m_true[:, 2]
    got_np = umeyama_similarity_np(src, dst)
    got_jnp = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    ref, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)
    np.testing.assert_allclose(got_np, ref, atol=1e-3)
    np.testing.assert_allclose(got_jnp, ref, atol=1e-2)
    np.testing.assert_allclose(got_np, m_true, atol=1e-3)


def test_umeyama_noisy_close_to_cv2_lmeds():
    rng = np.random.default_rng(3)
    src = np.array(
        [[38.3, 51.7], [73.5, 51.5], [56.0, 71.7], [41.5, 92.4], [70.7, 92.2]],
        dtype=np.float32,
    )
    m_true = np.array([[0.8, -0.2, 10.0], [0.2, 0.8, 6.0]], dtype=np.float32)
    dst = src @ m_true[:, :2].T + m_true[:, 2] + rng.normal(0, 0.5, (5, 2))
    got = umeyama_similarity_np(src, dst.astype(np.float32))
    ref, _ = cv2.estimateAffinePartial2D(
        src, dst.astype(np.float32), method=cv2.LMEDS
    )
    np.testing.assert_allclose(got, ref, atol=0.15)


def test_decode_la_png_replicates_luminance():
    """2-channel (gray+alpha) PNGs must decode to (H, W, 3)."""
    from PIL import Image
    import io as _io

    from rs_face_detection_tpu.utils.image_io import decode_image_bytes

    la = Image.fromarray(np.uint8(np.arange(64).reshape(8, 8) * 3), mode="L").convert("LA")
    buf = _io.BytesIO()
    la.save(buf, format="PNG")
    img = decode_image_bytes(buf.getvalue())
    assert img.shape == (8, 8, 3)
    # All three channels carry the luminance.
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert (img[:, :, 0] == img[:, :, 2]).all()

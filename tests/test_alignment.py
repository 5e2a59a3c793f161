"""Alignment tests: warp path vs cv2 oracle, fallback crop path."""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceAlignmentConfig
from rs_face_detection_tpu.pipeline.alignment import FaceAlignment

cv2 = pytest.importorskip("cv2")

TEMPLATE = np.asarray(FaceAlignmentConfig().standard_landmarks, np.float32)


def _synthetic_face(seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def test_warp_path_matches_cv2_pipeline():
    img = _synthetic_face()
    # Landmarks: template scaled 1.7x and shifted into the frame.
    landmarks = TEMPLATE * 1.7 + np.array([60.0, 40.0], np.float32)

    align = FaceAlignment()
    ours = align(img, bbox=None, landmarks=landmarks)
    assert ours.shape == (112, 112, 3)

    m, _ = cv2.estimateAffinePartial2D(landmarks, TEMPLATE, method=cv2.LMEDS)
    theirs = cv2.warpAffine(
        img.astype(np.float32),
        m.astype(np.float32),
        (112, 112),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
    )
    np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=2.0)


def test_warped_landmarks_land_on_template():
    img = _synthetic_face()
    landmarks = TEMPLATE * 1.7 + np.array([60.0, 40.0], np.float32)
    align = FaceAlignment()
    m = align.estimate(landmarks)
    mapped = landmarks @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, TEMPLATE, atol=1e-3)


def test_fallback_crop_with_bbox():
    img = _synthetic_face()
    align = FaceAlignment()
    out = align(img, bbox=np.array([100, 80, 220, 200, 0.9], np.float32), landmarks=None)
    assert out.shape == (112, 112, 3)
    assert np.isfinite(out).all()
    assert out.max() > 0


def test_fallback_crop_without_bbox_uses_default_frame():
    img = _synthetic_face()
    align = FaceAlignment()
    out = align(img, bbox=None, landmarks=None)
    assert out.shape == (112, 112, 3)
    assert out.max() > 0


def test_degenerate_landmarks_fall_back_to_crop():
    img = _synthetic_face()
    align = FaceAlignment()
    degenerate = np.full((5, 2), 50.0, np.float32)  # coincident points
    out = align(
        img, bbox=np.array([100, 80, 220, 200, 0.9], np.float32), landmarks=degenerate
    )
    assert out.shape == (112, 112, 3)
    assert np.isfinite(out).all()

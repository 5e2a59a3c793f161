"""Face-selection heuristic tests (reference semantics, face_selection.rs)."""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceSelectionConfig
from rs_face_detection_tpu.pipeline.selection import FaceSelection


def _boxes(*rows):
    return np.asarray(rows, dtype=np.float32)


def _kps(n):
    return np.arange(n * 10, dtype=np.float32).reshape(n, 5, 2)


IMG = (480, 640)  # (h, w)


def test_enroll_picks_biggest_area():
    sel = FaceSelection()
    boxes = _boxes(
        [10, 10, 60, 60, 0.9],  # 50x50
        [100, 100, 300, 260, 0.8],  # 200x160 biggest
        [400, 10, 430, 40, 0.95],
    )
    box, kp = sel(IMG, boxes, _kps(3), is_enroll=True)
    np.testing.assert_allclose(box, boxes[1])
    np.testing.assert_allclose(kp, _kps(3)[1])


def test_enroll_empty_returns_none():
    sel = FaceSelection()
    box, kp = sel(IMG, np.zeros((0, 5), np.float32), None, is_enroll=True)
    assert box is None and kp is None


def test_normal_mode_prefers_center_band():
    sel = FaceSelection()
    boxes = _boxes(
        # Large but far left of the center band (center x = 75).
        [5, 100, 145, 300, 0.9],
        # Smaller but centered (center x = 320).
        [280, 180, 360, 290, 0.8],
    )
    box, _ = sel(IMG, boxes, None)
    np.testing.assert_allclose(box, boxes[1])


def test_normal_mode_margin_edge_filters_border_faces():
    sel = FaceSelection()
    # margin_edge = min(50, 0.1*640) = 50; both face centers inside 50px of an
    # edge -> valid empty -> fallback to all faces; bigger (w+h) wins.
    boxes = _boxes(
        [0, 0, 60, 60, 0.9],  # center (30, 30) inside the margin
        [600, 440, 639, 479, 0.8],
    )
    box, _ = sel(IMG, boxes, None)
    np.testing.assert_allclose(box, boxes[0])


def test_normal_mode_minimum_area_ratio():
    # Faces below 0.0075 of the image area are not "valid", but the fallback
    # chain still selects from all faces when nothing passes.
    sel = FaceSelection()
    tiny = _boxes([300, 220, 316, 236, 0.9])  # 16x16 = 256 / (480*640) ~ 0.0008
    box, _ = sel(IMG, tiny, None)
    np.testing.assert_allclose(box, tiny[0])

    # With one valid and one tiny face, the valid one wins even if smaller sum.
    boxes = _boxes(
        [200, 150, 440, 330, 0.9],  # big, centered, valid
        [300, 220, 316, 236, 0.95],
    )
    box, _ = sel(IMG, boxes, None)
    np.testing.assert_allclose(box, boxes[0])


def test_keypoints_follow_selected_row():
    sel = FaceSelection()
    boxes = _boxes(
        [200, 150, 440, 330, 0.9],
        [250, 180, 350, 280, 0.8],
    )
    kps = _kps(2)
    box, kp = sel(IMG, boxes, kps)
    np.testing.assert_allclose(box, boxes[0])
    np.testing.assert_allclose(kp, kps[0])


def test_compat_area_bug_flag_changes_validity():
    # A face tall enough to pass with w*h but too narrow for w*w.
    cfg = FaceSelectionConfig()
    boxes = _boxes([300, 100, 340, 380, 0.9])  # w=40, h=280
    area_wh = 40 * 280 / (480 * 640)
    area_ww = 40 * 40 / (480 * 640)
    assert area_wh >= cfg.minimum_face_ratio > area_ww

    fixed = FaceSelection(cfg)
    buggy = FaceSelection(cfg, compat_area_bug=True)
    box_f, _ = fixed(IMG, boxes, None)
    box_b, _ = buggy(IMG, boxes, None)
    # Both still select (fallback), but validity differs internally; the
    # observable difference appears with a competing valid face.
    boxes2 = _boxes(
        [300, 100, 340, 380, 0.9],  # tall narrow: valid only without the bug
        [250, 200, 330, 280, 0.8],  # 80x80: valid either way
    )
    np.testing.assert_allclose(fixed(IMG, boxes2, None)[0], boxes2[0])
    np.testing.assert_allclose(buggy(IMG, boxes2, None)[0], boxes2[1])


def test_enroll_width_check_helper():
    sel = FaceSelection()
    assert sel.is_face_area_big_enough(IMG, np.array([0, 0, 200, 100, 1.0]))
    assert not sel.is_face_area_big_enough(IMG, np.array([0, 0, 100, 100, 1.0]))

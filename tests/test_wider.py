"""WIDER FACE protocol: parser + end-to-end runner on a generated tree.

No WIDER data ships in this environment, so the tests build a WIDER-layout
directory (images + wider_face_val_bbx_gt.txt) from the repo's own real and
synthetic fixtures and validate ops/wider against it: format parsing
(counts, zero-face placeholder rows, invalid flags), and `evaluate_wider`
producing the expected AP for the trained fixture detectors.
Reference context: the reference's models are WIDER-trained (SURVEY §6);
BASELINE.md names WIDER val AP parity as the accuracy north star.
"""

import os

import numpy as np
import pytest

from rs_face_detection_tpu.ops.wider import (
    evaluate_wider,
    find_wider_root,
    parse_gt_file,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_parse_gt_format(tmp_path):
    gt = tmp_path / "gt.txt"
    gt.write_text(
        "a/x.jpg\n2\n10 20 30 40 0 0 0 0 0 0\n50 60 7 8 0 0 0 1 0 0\n"
        "b/empty.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n"
        "c/y.jpg\n1\n1 2 3 4 0 0 0 0 0 0\n"
    )
    entries = parse_gt_file(str(gt))
    assert [e.rel_path for e in entries] == ["a/x.jpg", "b/empty.jpg", "c/y.jpg"]
    np.testing.assert_allclose(entries[0].boxes, [[10, 20, 39, 59]])
    np.testing.assert_allclose(entries[0].invalid_boxes, [[50, 60, 56, 67]])
    assert entries[1].boxes.shape == (0, 4)
    np.testing.assert_allclose(entries[2].boxes, [[1, 2, 3, 5]])


def _build_wider_tree(tmp_path):
    """WIDER-format dir from the synthetic eval set + the real-face photo."""
    import cv2

    ap_set = np.load(os.path.join(FIXTURES, "ap_eval_set.npz"))
    images_root = tmp_path / "WIDER_val" / "images" / "0--Fixture"
    images_root.mkdir(parents=True)
    lines = []
    for i in range(min(6, len(ap_set["images"]))):
        img = ap_set["images"][i]
        n = int(ap_set["gt_counts"][i])
        rel = f"0--Fixture/scene_{i}.png"  # cv2 reads png fine; WIDER is jpg
        cv2.imwrite(str(tmp_path / "WIDER_val" / "images" / rel), img)
        lines.append(rel)
        lines.append(str(n))
        if n == 0:
            lines.append("0 0 0 0 0 0 0 0 0 0")
        for b in ap_set["gt_boxes"][i][:n]:
            x1, y1, x2, y2 = b
            lines.append(
                f"{x1:.0f} {y1:.0f} {x2 - x1 + 1:.0f} {y2 - y1 + 1:.0f} 0 0 0 0 0 0"
            )
    split = tmp_path / "wider_face_split"
    split.mkdir()
    gt_path = split / "wider_face_val_bbx_gt.txt"
    gt_path.write_text("\n".join(lines) + "\n")
    return str(tmp_path / "WIDER_val" / "images"), str(gt_path)


def test_evaluate_wider_on_fixture_tree(tmp_path):
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    images_root, gt_path = _build_wider_tree(tmp_path)
    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=8,
    )
    det = load_trained_detector(os.path.join(FIXTURES, "trained_mnet64.npz"), cfg)

    def detector(img):
        boxes, kps = det(img)
        return np.asarray(boxes, np.float32).reshape(-1, 5), kps

    res = evaluate_wider(detector, images_root, gt_path)
    assert res["num_images"] == 6.0
    # The same detector records AP 0.958 on the full 16-scene set; a 6-scene
    # subset through the WIDER protocol must stay in the same regime.
    assert res["ap"] >= 0.7, res


def test_find_wider_root_absent(tmp_path, monkeypatch):
    monkeypatch.setenv("WIDER_ROOT", str(tmp_path))  # exists but empty
    assert find_wider_root() is None

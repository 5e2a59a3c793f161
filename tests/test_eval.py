"""AP metric validation on synthetic scenes with known corruptions."""

import numpy as np
import pytest

from rs_face_detection_tpu.ops.eval import (
    average_precision,
    evaluate_detector,
    match_detections,
)


def _gt(n, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    wh = rng.uniform(30, 80, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


def test_perfect_detections_ap_1():
    gt = _gt(10)
    scores = np.linspace(0.9, 0.5, 10).astype(np.float32)
    ev = match_detections(gt, scores, gt)
    res = average_precision([ev])
    assert res["ap"] == pytest.approx(1.0)
    assert res["recall"] == pytest.approx(1.0)


def test_missed_faces_cap_recall():
    gt = _gt(10)
    det = gt[:6]
    scores = np.full(6, 0.9, np.float32)
    res = average_precision([match_detections(det, scores, gt)])
    assert res["recall"] == pytest.approx(0.6)
    assert res["ap"] == pytest.approx(0.6)


def test_false_positives_reduce_ap_by_rank():
    gt = _gt(5, seed=1)
    fp = _gt(5, seed=2) + 2000.0  # far away, no overlap
    # FPs ranked BELOW all TPs: AP stays 1.0.
    det = np.concatenate([gt, fp])
    scores = np.concatenate([np.full(5, 0.9), np.full(5, 0.1)]).astype(np.float32)
    res = average_precision([match_detections(det, scores, gt)])
    assert res["ap"] == pytest.approx(1.0)
    # FPs ranked ABOVE all TPs: precision at each recall point halves-ish.
    scores = np.concatenate([np.full(5, 0.1), np.full(5, 0.9)]).astype(np.float32)
    res2 = average_precision([match_detections(det, scores, gt)])
    assert res2["ap"] < 0.6


def test_duplicate_detections_count_once():
    gt = _gt(3, seed=3)
    det = np.concatenate([gt, gt + 1.0])  # near-duplicates
    scores = np.linspace(0.9, 0.4, 6).astype(np.float32)
    ev = match_detections(det, scores, gt)
    assert ev.matched.sum() == 3  # each GT matched once


def test_localization_threshold():
    gt = np.array([[0, 0, 99, 99]], np.float32)
    good = np.array([[5, 5, 104, 104]], np.float32)  # IoU ~0.82
    bad = np.array([[60, 60, 159, 159]], np.float32)  # IoU ~0.11
    assert match_detections(good, np.array([0.9]), gt).matched.all()
    assert not match_detections(bad, np.array([0.9]), gt).matched.any()


def test_evaluate_detector_end_to_end():
    gt1, gt2 = _gt(4, seed=4), _gt(3, seed=5)

    def fake_detector(image):
        gt = gt1 if image[0, 0, 0] == 0 else gt2
        boxes = np.concatenate([gt, np.full((len(gt), 1), 0.9, np.float32)], axis=1)
        return boxes, None

    img1 = np.zeros((8, 8, 3), np.uint8)
    img2 = np.ones((8, 8, 3), np.uint8)
    res = evaluate_detector(fake_detector, [(img1, gt1), (img2, gt2)])
    assert res["ap"] == pytest.approx(1.0)
    assert res["num_gt"] == 7

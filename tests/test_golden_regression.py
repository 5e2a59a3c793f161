"""Golden regression fixtures: fixed-seed end-to-end outputs must not drift.

The reference shipped no fixtures (SURVEY.md §4); these freeze our own
behavior: a fixed-seed detector + pipeline on a deterministic synthetic image
produces byte-stable outputs, stored in tests/fixtures/.  A legitimate
behavior change (model architecture, decode semantics) must regenerate them
consciously:

    python tests/test_golden_regression.py --regen
"""

import os
import sys

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
FIXTURE = os.path.join(FIXTURE_DIR, "golden_detect_v1.npz")


def _compute_golden():
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)

    rng = np.random.default_rng(42)
    img = rng.integers(0, 255, size=(96, 80, 3), dtype=np.uint8)
    boxes, kps = det(img)
    return {"boxes": boxes, "kps": kps}


def test_detect_outputs_match_fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not generated (run with --regen)")
    got = _compute_golden()
    with np.load(FIXTURE) as expected:
        assert got["boxes"].shape == expected["boxes"].shape
        np.testing.assert_allclose(
            got["boxes"], expected["boxes"], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(got["kps"], expected["kps"], rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Trained-weight goldens (tools/make_trained_fixture.py): SEMANTIC regression.
# With learned weights, a drift in normalization constants, padding
# convention, decode order, or anchor layout moves real detections — which
# random-weight shape tests cannot feel.  (VERDICT r1 #5.)
# ---------------------------------------------------------------------------

TRAINED_CKPT = os.path.join(FIXTURE_DIR, "trained_mnet64.npz")
GOLDEN_SCENE = os.path.join(FIXTURE_DIR, "golden_trained_scene.npz")
AP_SET = os.path.join(FIXTURE_DIR, "ap_eval_set.npz")


def test_trained_weights_reproduce_golden_detections():
    if not (os.path.exists(TRAINED_CKPT) and os.path.exists(GOLDEN_SCENE)):
        pytest.skip("trained fixtures absent (run tools/make_trained_fixture.py)")
    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    det = load_trained_detector(TRAINED_CKPT)
    with np.load(GOLDEN_SCENE) as g:
        image = g["image"]
        gt_boxes = g["gt_boxes"]
        want_boxes = g["det_boxes"]
        want_kps = g["det_kps"]

    boxes, kps = det(image)
    assert boxes.shape == want_boxes.shape, (boxes.shape, want_boxes.shape)
    np.testing.assert_allclose(boxes, want_boxes, rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(kps, want_kps, rtol=1e-3, atol=5e-2)

    # Semantic check: the learned detector actually finds the ground truth.
    from rs_face_detection_tpu.ops.nms import nms_numpy  # noqa: F401 (import check)

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter = ix * iy
        ar = lambda r: (r[2] - r[0] + 1) * (r[3] - r[1] + 1)  # noqa: E731
        return inter / (ar(a) + ar(b) - inter)

    for gt in gt_boxes:
        assert any(iou(gt, det_box[:4]) > 0.5 for det_box in boxes), (
            f"trained detector missed GT box {gt}"
        )


def test_trained_weights_ap_gate():
    """AP on the committed labeled eval set must not regress (bench gate's
    test-side twin; VERDICT r1 #8)."""
    if not (os.path.exists(TRAINED_CKPT) and os.path.exists(AP_SET)):
        pytest.skip("trained fixtures absent (run tools/make_trained_fixture.py)")
    from rs_face_detection_tpu.ops.eval import evaluate_detector
    from rs_face_detection_tpu.utils.fixtures import (
        load_ap_eval_set,
        load_trained_detector,
    )

    det = load_trained_detector(TRAINED_CKPT)
    dataset, recorded = load_ap_eval_set(AP_SET)
    res = evaluate_detector(det, dataset, iou_threshold=0.5)
    assert res["ap"] >= recorded["ap"] - 0.02, (res, recorded)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import conftest  # noqa: F401  (force CPU backend)

        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(FIXTURE, **_compute_golden())
        print(f"wrote {FIXTURE}")

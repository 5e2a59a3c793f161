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


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import conftest  # noqa: F401  (force CPU backend)

        os.makedirs(FIXTURE_DIR, exist_ok=True)
        np.savez(FIXTURE, **_compute_golden())
        print(f"wrote {FIXTURE}")

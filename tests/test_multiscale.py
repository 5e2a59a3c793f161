"""Size-bucketed multi-scale detection routing and weight sharing."""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import FaceDetectionConfig
from rs_face_detection_tpu.models.retinaface import init_retinaface
from rs_face_detection_tpu.pipeline.multiscale import MultiScaleDetection


@pytest.fixture(scope="module")
def multi():
    cfg = FaceDetectionConfig(
        confidence_threshold=0.3, max_candidates=64, max_detections=16
    )
    model, variables = init_retinaface("mobilenet025", (64, 64), seed=0)
    return MultiScaleDetection(
        buckets=((64, 64), (128, 128)),
        cfg=cfg,
        model=model,
        variables=variables,
    )


def test_bucket_routing(multi):
    assert multi.pick_bucket(50, 60) == (64, 64)
    assert multi.pick_bucket(64, 64) == (64, 64)
    assert multi.pick_bucket(65, 40) == (128, 128)
    assert multi.pick_bucket(100, 120) == (128, 128)
    # Bigger than every bucket -> largest (letterboxed down).
    assert multi.pick_bucket(500, 900) == (128, 128)


def test_detectors_share_weights(multi):
    dets = list(multi.detectors.values())
    assert len(dets) == 2
    assert dets[0].variables is dets[1].variables
    assert dets[0].model is dets[1].model
    # Anchor tables differ with resolution.
    assert dets[0].anchors.shape[0] < dets[1].anchors.shape[0]


def test_multiscale_detect_contract(multi):
    rng = np.random.default_rng(0)
    small = rng.integers(0, 255, size=(48, 56, 3), dtype=np.uint8)
    large = rng.integers(0, 255, size=(200, 180, 3), dtype=np.uint8)
    for img in (small, large):
        boxes, kps = multi(img)
        assert boxes.ndim == 2
        assert kps.shape[0] == boxes.shape[0]
        if len(boxes):
            # Coordinates within the original image frame (after descale).
            assert (boxes[:, 0] >= 0).all()
            assert (boxes[:, 3] <= img.shape[0] / (0.3)).all()  # sanity bound


def test_small_image_upscaled_resolution_consistency(multi):
    """An image fitting the small bucket must not be routed to the large one."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(60, 60, 3), dtype=np.uint8)
    bucket = multi.pick_bucket(*img.shape[:2])
    assert bucket == (64, 64)
    boxes, _ = multi(img)
    boxes2, _ = multi.detectors[(64, 64)](img)
    np.testing.assert_allclose(boxes, boxes2)

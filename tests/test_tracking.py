"""IoU tracker and video pipeline tests."""

import numpy as np
import pytest

from rs_face_detection_tpu.pipeline.tracking import IouTracker, Track, VideoPipeline


def _det(x, y, w=50, h=50, score=0.9):
    return [x, y, x + w, y + h, score]


def test_track_birth_confirmation_and_death():
    tracker = IouTracker(iou_threshold=0.3, max_age=2, min_hits=2)

    # Frame 1: one detection -> track born but not yet confirmed.
    active = tracker.update(np.array([_det(100, 100)], np.float32))
    assert active == []
    assert len(tracker.tracks) == 1

    # Frame 2: same-ish detection -> confirmed.
    active = tracker.update(np.array([_det(104, 102)], np.float32))
    assert len(active) == 1
    tid = active[0].track_id

    # Frames 3-4: missing -> ages but survives.
    assert tracker.update(np.zeros((0, 5), np.float32)) == []
    assert tracker.update(np.zeros((0, 5), np.float32)) == []
    assert len(tracker.tracks) == 1

    # Frame 5: still missing -> dies.
    tracker.update(np.zeros((0, 5), np.float32))
    assert tracker.tracks == []

    # Reappearing gets a NEW id.
    tracker.update(np.array([_det(100, 100)], np.float32))
    active = tracker.update(np.array([_det(100, 100)], np.float32))
    assert active[0].track_id != tid


def test_identity_maintained_across_motion():
    tracker = IouTracker(min_hits=1)
    ids = []
    for step in range(5):
        dets = np.array(
            [_det(100 + step * 10, 100), _det(400, 300 + step * 8)], np.float32
        )
        active = tracker.update(dets)
        ids.append(sorted(t.track_id for t in active))
    assert all(i == ids[0] for i in ids)
    assert len(ids[0]) == 2


def test_keypoints_follow_tracks():
    tracker = IouTracker(min_hits=1)
    kps = np.arange(10, dtype=np.float32).reshape(1, 5, 2)
    active = tracker.update(np.array([_det(10, 10)], np.float32), kps)
    np.testing.assert_allclose(active[0].keypoints, kps[0])


def test_video_pipeline_end_to_end():
    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.models.retinaface import init_retinaface
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.detection import RetinaFaceDetection

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=16,
    )
    model, variables = init_retinaface("mobilenet025", cfg.image_size, seed=0)
    det = RetinaFaceDetection(cfg, model=model, variables=variables)
    server = DetectionServer(det, batch_size=4)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    frames = [base for _ in range(9)]  # static scene -> stable tracks

    pipeline = VideoPipeline(server, IouTracker(min_hits=2))
    results = list(pipeline.run(iter(frames)))
    assert len(results) == 9
    # With identical frames, once tracks confirm, ids persist.
    confirmed = [tracks for _, tracks in results[2:] if tracks]
    if confirmed:
        first_ids = sorted(t.track_id for t in confirmed[0])
        for tracks in confirmed:
            assert sorted(t.track_id for t in tracks) == first_ids

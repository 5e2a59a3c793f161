"""Multi-scale + flip TTA with box voting (pipeline/tta.py).

Protocol pieces tested independently: the flip coordinate/identity
mapping, bbox_vote's greedy weighted merge, and the end-to-end wrapper's
flip self-consistency on a real detector (a flip-symmetric TTA result must
be (near-)invariant to mirroring the input, and TTA must re-find the
trained fixture's face).
"""

import numpy as np
import pytest

from rs_face_detection_tpu.pipeline.tta import (
    TTADetection,
    bbox_vote,
    flip_detections,
)


def test_flip_detections_round_trip():
    rng = np.random.default_rng(0)
    width = 100
    x1 = rng.uniform(0, 40, 6)
    boxes = np.stack(
        [x1, rng.uniform(0, 40, 6), x1 + rng.uniform(5, 40, 6),
         rng.uniform(50, 90, 6), rng.uniform(0, 1, 6)], axis=1
    ).astype(np.float32)
    kps = rng.uniform(0, 99, (6, 5, 2)).astype(np.float32)

    fb, fk = flip_detections(boxes, kps, width)
    # Well-formed (x1 <= x2), same areas.
    assert (fb[:, 0] <= fb[:, 2]).all()
    np.testing.assert_allclose(
        fb[:, 2] - fb[:, 0], boxes[:, 2] - boxes[:, 0], atol=1e-5
    )
    # Involution: flipping twice is the identity (incl. landmark order).
    bb, bk = flip_detections(fb, fk, width)
    np.testing.assert_allclose(bb, boxes, atol=1e-5)
    np.testing.assert_allclose(bk, kps, atol=1e-5)
    # Landmark identities swap: left eye (0) <-> right eye (1).
    np.testing.assert_allclose(fk[:, 0, 1], kps[:, 1, 1])
    np.testing.assert_allclose(fk[:, 0, 0], width - 1.0 - kps[:, 1, 0])


def test_bbox_vote_merges_overlaps():
    # Two near-identical boxes (IoU ~0.9) + one far box.
    dets = np.array(
        [
            [10, 10, 50, 50, 0.9],
            [12, 12, 52, 52, 0.6],
            [200, 200, 240, 240, 0.8],
        ],
        np.float32,
    )
    kps = np.tile(np.arange(3, dtype=np.float32)[:, None, None], (1, 5, 2))
    merged, mkps = bbox_vote(dets, kps, iou_threshold=0.4)
    assert merged.shape == (2, 5)
    # Group 1: weighted average of rows 0 and 1, score = max.
    w = np.array([0.9, 0.6])
    expect = (dets[:2, :4] * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose(merged[0, :4], expect, atol=1e-5)
    assert merged[0, 4] == pytest.approx(0.9)
    # Landmarks come from the top-scoring member (row 0).
    np.testing.assert_allclose(mkps[0], kps[0])
    # The far box survives untouched.
    np.testing.assert_allclose(merged[1], dets[2], atol=1e-5)


def test_bbox_vote_empty():
    merged, mkps = bbox_vote(np.zeros((0, 5), np.float32), None)
    assert merged.shape == (0, 5) and mkps is None


def test_bbox_vote_degenerate_box_total():
    """A zero-'+1'-area box has NaN self-IoU; the greedy loop must still
    consume it instead of crashing on an empty group (review finding)."""
    dets = np.array(
        [[10, 10, 9, 9, 0.9], [20, 20, 40, 40, 0.5]], np.float32
    )
    merged, _ = bbox_vote(dets, None, iou_threshold=0.4)
    assert merged.shape == (2, 5)
    np.testing.assert_allclose(merged[1], dets[1], atol=1e-5)


def test_tta_flip_invariance_and_fixture_face():
    """On the committed real-photo fixture: TTA(flip=True) re-finds the
    trained face, and its output is invariant to mirroring the input."""
    import os

    import cv2

    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    ckpt = os.path.join(fixtures, "trained_real64.npz")
    jpg = os.path.join(fixtures, "real_face.jpg")
    if not (os.path.exists(ckpt) and os.path.exists(jpg)):
        pytest.skip("real fixture absent")
    det = load_trained_detector(ckpt)
    img = cv2.imread(jpg)

    tta = TTADetection([det], flip=True, merge="vote")
    boxes, kps = tta(img)
    assert boxes.shape[0] >= 1 and kps.shape == (boxes.shape[0], 5, 2)

    # Single-scale baseline box must survive the merge (IoU >= 0.5).
    ref_boxes, _ = det(img)
    assert ref_boxes.shape[0] >= 1

    def iou(a, b):
        xx1, yy1 = max(a[0], b[0]), max(a[1], b[1])
        xx2, yy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0.0, xx2 - xx1 + 1) * max(0.0, yy2 - yy1 + 1)
        area = lambda r: (r[2] - r[0] + 1) * (r[3] - r[1] + 1)
        return inter / (area(a) + area(b) - inter)

    assert iou(boxes[0], ref_boxes[0]) >= 0.5

    # Flip invariance: TTA on the mirrored image gives the same detections
    # (after unflipping) because the augmentation set is flip-symmetric.
    mirrored = np.ascontiguousarray(img[:, ::-1])
    mboxes, mkps = tta(mirrored)
    from rs_face_detection_tpu.pipeline.tta import flip_detections

    ub, uk = flip_detections(mboxes, mkps, img.shape[1])
    order = np.argsort(-boxes[:, 4], kind="stable")
    uorder = np.argsort(-ub[:, 4], kind="stable")
    assert ub.shape == boxes.shape
    np.testing.assert_allclose(ub[uorder], boxes[order], atol=1.0)


def test_tta_nms_merge_mode():
    dets = np.array(
        [[10, 10, 50, 50, 0.9], [12, 12, 52, 52, 0.6]], np.float32
    )

    class Fake:
        image_size = (64, 64)  # duck-typed static size (host letterbox)

        def __call__(self, img):
            return dets.copy(), np.zeros((2, 5, 2), np.float32)

    tta = TTADetection([Fake()], flip=False, merge="nms", merge_iou=0.4)
    boxes, kps = tta(np.zeros((64, 64, 3), np.uint8))
    assert boxes.shape[0] == 1  # greedy NMS suppresses the duplicate
    assert boxes[0, 4] == pytest.approx(0.9)

    with pytest.raises(ValueError):
        TTADetection([Fake()], merge="average")


def test_tta_scale_filter_partitions_views_by_face_size():
    """The published multi-scale test rule: an enlarged view contributes
    only SMALL faces, a shrunk view only LARGE ones (S3FD/RetinaFace eval
    protocol; measured motivation in test_real_collage's TTA test)."""

    class Fake:
        """Sees the same two faces at every scale: a 40px and a 10px face
        (original-image pixels), reported in its own letterboxed frame —
        what a real fully-convolutional detector does across the pyramid.
        The 64px test image letterboxes to a SIZE view at scale SIZE/64,
        so the faces appear at 40*z and 10*z px in the view frame."""

        def __init__(self, size, score):
            self.image_size = (size, size)
            self.z = size / 64.0
            self.score = score

        def __call__(self, img):
            large, small = 40.0 * self.z, 10.0 * self.z
            dets = np.array(
                [
                    [0, 0, large, large, self.score],
                    [20 * self.z, 20 * self.z, 20 * self.z + small,
                     20 * self.z + small, self.score - 0.5],
                ],
                np.float32,
            )
            return dets, np.zeros((2, 5, 2), np.float32)

    img = np.zeros((64, 64, 3), np.uint8)
    # Both views see the identical faces, so cross-view duplicates merge
    # in NMS and the surviving SCORE reveals which view won: the non-base
    # view scores higher, so an unfiltered merge keeps its score.
    base, zoom_in = Fake(64, 0.9), Fake(128, 0.95)

    def winner_scores(tta):
        boxes, _ = tta(img)
        return {round(float(s), 2) for s in boxes[:, 4]}

    # base frame sides: 40px and 10px.  small_faces_cut 0.375*64 = 24:
    # the 128 (zoom-in) view keeps only the 10px face.
    filtered = winner_scores(
        TTADetection([base, zoom_in], flip=False, merge="nms")
    )
    assert filtered == {0.9, 0.45}  # large from base, small from 128
    unfiltered = winner_scores(
        TTADetection(
            [base, zoom_in], flip=False, merge="nms", scale_filter=False
        )
    )
    assert unfiltered == {0.95, 0.45}  # 128's large contaminates

    # a zoomed-out view drops faces that would be tiny at base scale
    zoom_out = Fake(32, 0.95)
    tiny = winner_scores(
        TTADetection(
            [base, zoom_out], flip=False, merge="nms",
            large_faces_cut=0.25,  # 16px floor: the 10px face drops @32
        )
    )
    assert tiny == {0.95, 0.4}  # 32's large kept; its small dropped

    # single-view TTA is untouched by the filter (zoom == 1)
    alone = TTADetection([base], flip=False, merge="nms")(img)[0]
    assert alone.shape[0] == 2

"""Golden tests for bbox/landmark delta decode and clipping.

Expected values hand-derived from the reference formulas
(face_detection.rs:516-570, bbox_transform.rs:27-65): the +1 width/height
convention and center/size delta decode.
"""

import jax.numpy as jnp
import numpy as np

from rs_face_detection_tpu.ops.box_decode import (
    bbox_overlaps,
    bbox_pred,
    clip_boxes,
    clip_points,
    landmark_pred,
)


def test_bbox_pred_zero_deltas_identity():
    anchors = jnp.array([[0.0, 0.0, 15.0, 15.0], [-8.0, -8.0, 23.0, 23.0]])
    deltas = jnp.zeros((2, 4))
    np.testing.assert_allclose(np.asarray(bbox_pred(anchors, deltas)), anchors)


def test_bbox_pred_golden():
    # Anchor [0,0,15,15]: w=h=16, ctr=(7.5,7.5).
    # deltas (0.25, -0.5, ln2, 0): ctr=(7.5+4, 7.5-8)=(11.5,-0.5), w=32, h=16.
    # corners: x 11.5 -/+ 15.5 -> [-4, 27]; y -0.5 -/+ 7.5 -> [-8, 7].
    anchors = jnp.array([[0.0, 0.0, 15.0, 15.0]])
    deltas = jnp.array([[0.25, -0.5, float(np.log(2.0)), 0.0]])
    got = np.asarray(bbox_pred(anchors, deltas))
    np.testing.assert_allclose(got, [[-4.0, -8.0, 27.0, 7.0]], rtol=1e-6)


def test_bbox_pred_passthrough_extra_columns():
    anchors = jnp.array([[0.0, 0.0, 15.0, 15.0]])
    deltas = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.9]])
    got = np.asarray(bbox_pred(anchors, deltas))
    assert got.shape == (1, 5)
    assert got[0, 4] == np.float32(0.9)


def test_landmark_pred_golden():
    # Same anchor; landmark delta (dx, dy) decodes to (dx*16+7.5, dy*16+7.5).
    anchors = jnp.array([[0.0, 0.0, 15.0, 15.0]])
    deltas = jnp.zeros((1, 5, 2)).at[0, 0].set(jnp.array([0.5, -0.25]))
    got = np.asarray(landmark_pred(anchors, deltas))
    assert got.shape == (1, 5, 2)
    np.testing.assert_allclose(got[0, 0], [15.5, 3.5], rtol=1e-6)
    np.testing.assert_allclose(got[0, 1], [7.5, 7.5], rtol=1e-6)


def test_clip_boxes_bounds():
    boxes = jnp.array([[-10.0, -5.0, 700.0, 650.0], [10.0, 10.0, 20.0, 20.0]])
    got = np.asarray(clip_boxes(boxes, (640, 640)))
    np.testing.assert_allclose(got[0], [0.0, 0.0, 639.0, 639.0])
    np.testing.assert_allclose(got[1], [10.0, 10.0, 20.0, 20.0])


def test_clip_points_bounds():
    pts = jnp.array([[[-3.0, 1.0], [650.0, 700.0], [5.0, 5.0], [0.0, 0.0], [1.0, 1.0]]])
    got = np.asarray(clip_points(pts, (480, 640)))
    np.testing.assert_allclose(got[0, 0], [0.0, 1.0])
    np.testing.assert_allclose(got[0, 1], [639.0, 479.0])


def test_bbox_overlaps_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0], [100.0, 100.0, 109.0, 109.0]])
    got = np.asarray(bbox_overlaps(a, a))
    np.testing.assert_allclose(got, [[1.0, 0.0], [0.0, 1.0]])


def test_bbox_overlaps_plus_one_convention():
    # Boxes [0,0,9,9] and [5,0,14,9]: inter w = min(9,14)-max(0,5)+1 = 5,
    # areas 100 each -> IoU = 50/150.
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[5.0, 0.0, 14.0, 9.0]])
    got = np.asarray(bbox_overlaps(a, b))
    np.testing.assert_allclose(got, [[50.0 / 150.0]], rtol=1e-6)

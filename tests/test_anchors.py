"""Golden tests for anchor enumeration and plane expansion.

Expected values are hand-derived from the reference's anchor math
(generate_anchors.rs, rcnn/anchors.rs) with the production config
(face_detection.rs:56-80): base_size 16, ratio 1.0, scales per stride
32->(32,16), 16->(8,4), 8->(2,1).
"""

import numpy as np
import pytest

from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG
from rs_face_detection_tpu.ops.anchors import (
    anchor_plane,
    full_anchor_table,
    generate_anchors,
    generate_anchors_fpn,
)

# For ratio 1.0 on the [0,0,15,15] base anchor: w=h=16, ctr=(7.5,7.5).
# Scale s gives ws=16s and corners 7.5 -/+ (16s-1)/2.
GOLDEN_BASE = {
    32: [[-248.0, -248.0, 263.0, 263.0], [-120.0, -120.0, 135.0, 135.0]],
    16: [[-56.0, -56.0, 71.0, 71.0], [-24.0, -24.0, 39.0, 39.0]],
    8: [[-8.0, -8.0, 23.0, 23.0], [0.0, 0.0, 15.0, 15.0]],
}


def test_generate_anchors_per_stride_golden():
    for stride, cfg in RPN_ANCHOR_CFG.items():
        got = generate_anchors(cfg.base_size, cfg.ratios, cfg.scales)
        np.testing.assert_allclose(got, np.array(GOLDEN_BASE[stride]), atol=0)


def test_fpn_order_is_descending_stride():
    fpn = generate_anchors_fpn(RPN_ANCHOR_CFG)
    assert list(fpn.keys()) == [32, 16, 8]
    for stride, table in fpn.items():
        assert table.shape == (2, 4)
        np.testing.assert_allclose(table, np.array(GOLDEN_BASE[stride]))


def test_generate_anchors_multi_ratio():
    # Classic Faster-R-CNN table: base 16, ratios (.5, 1, 2), scales (8, 16, 32).
    got = generate_anchors(16, (0.5, 1.0, 2.0), (8.0, 16.0, 32.0))
    assert got.shape == (9, 4)
    # ratio .5: size_ratio=512, ws=round(sqrt(512))=23, hs=11.5 ->
    # scale 8: ws=184, hs=92 -> [7.5-91.5, 7.5-45.5, 7.5+91.5, 7.5+45.5]
    np.testing.assert_allclose(got[0], [-84.0, -38.0, 99.0, 53.0])
    # ratio 1 scale 16: [7.5-127.5, ...]
    np.testing.assert_allclose(got[4], [-120.0, -120.0, 135.0, 135.0])


def test_dense_anchor_appends_half_stride_shift():
    base = generate_anchors(16, (1.0,), (2.0, 1.0), stride=8, dense_anchor=False)
    dense = generate_anchors(16, (1.0,), (2.0, 1.0), stride=8, dense_anchor=True)
    assert dense.shape == (4, 4)
    np.testing.assert_allclose(dense[:2], base)
    np.testing.assert_allclose(dense[2:], base + 4.0)


def test_anchor_plane_layout():
    base = np.array([[0.0, 0.0, 15.0, 15.0], [0.0, 0.0, 31.0, 31.0]], np.float32)
    plane = anchor_plane(2, 2, 16, base)
    assert plane.shape == (8, 4)
    # Row order is (h, w, a): row index = h*(W*A) + w*A + a.
    np.testing.assert_allclose(plane[0], [0, 0, 15, 15])  # h=0,w=0,a=0
    np.testing.assert_allclose(plane[1], [0, 0, 31, 31])  # h=0,w=0,a=1
    np.testing.assert_allclose(plane[2], [16, 0, 31, 15])  # h=0,w=1,a=0
    np.testing.assert_allclose(plane[4], [0, 16, 15, 31])  # h=1,w=0,a=0
    np.testing.assert_allclose(plane[7], [16, 16, 47, 47])  # h=1,w=1,a=1


def test_full_anchor_table_640_has_16800_anchors():
    table, levels = full_anchor_table((640, 640), RPN_ANCHOR_CFG)
    assert table.shape == (16800, 4)  # 2 * (20^2 + 40^2 + 80^2)
    assert [l[0] for l in levels] == [32, 16, 8]
    assert [(l[1], l[2]) for l in levels] == [(20, 20), (40, 40), (80, 80)]
    # First row: stride-32 scale-32 anchor at cell (0, 0).
    np.testing.assert_allclose(table[0], GOLDEN_BASE[32][0])
    # Last row: stride-8 scale-1 anchor at cell (79, 79): base + 79*8.
    np.testing.assert_allclose(table[-1], np.array(GOLDEN_BASE[8][1]) + 632.0)

"""Box / landmark delta decoding and clipping as pure jnp functions.

Semantics match the reference decode chain:
  - bbox_pred: /root/reference/src/pipeline/module/face_detection.rs:516-549
    (identical math to processing/bbox_transform.rs nonlinear_pred :90-120),
    with the Faster-R-CNN "+1" width/height convention.
  - landmark_pred: face_detection.rs:551-570 ((N, 5, 2) delta layout).
  - clip_boxes / clip_points: processing/bbox_transform.rs:27-65 (clamp to
    [0, W-1] x [0, H-1]).

All functions are shape-polymorphic over a leading batch axis via vmap and are
traced into the fused detect() graph; no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _whctr(boxes: jnp.ndarray):
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[:, 1] + 0.5 * (heights - 1.0)
    return widths, heights, ctr_x, ctr_y


def bbox_pred(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, 4) center/size deltas against (N, 4) corner anchors.

    Extra delta columns beyond 4 (if any) are passed through unchanged, as in
    the reference (face_detection.rs:544-546).
    """
    widths, heights, ctr_x, ctr_y = _whctr(anchors)
    dx, dy, dw, dh = (deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3])

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * (pred_w - 1.0),
            pred_ctr_y - 0.5 * (pred_h - 1.0),
            pred_ctr_x + 0.5 * (pred_w - 1.0),
            pred_ctr_y + 0.5 * (pred_h - 1.0),
        ],
        axis=1,
    )
    if deltas.shape[1] > 4:
        out = jnp.concatenate([out, deltas[:, 4:]], axis=1)
    return out


def landmark_pred(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, 5, 2) landmark deltas against (N, 4) corner anchors."""
    widths, heights, ctr_x, ctr_y = _whctr(anchors)
    x = deltas[:, :, 0] * widths[:, None] + ctr_x[:, None]
    y = deltas[:, :, 1] * heights[:, None] + ctr_y[:, None]
    return jnp.stack([x, y], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_shape: Tuple[int, int]) -> jnp.ndarray:
    """Clamp (N, 4) corner boxes to [0, W-1] x [0, H-1]; im_shape is (H, W)."""
    height, width = im_shape
    bound = jnp.array(
        [width - 1.0, height - 1.0, width - 1.0, height - 1.0], dtype=boxes.dtype
    )
    return jnp.clip(boxes, 0.0, bound)


def clip_points(points: jnp.ndarray, im_shape: Tuple[int, int]) -> jnp.ndarray:
    """Clamp (N, 5, 2) landmark points to [0, W-1] x [0, H-1]."""
    height, width = im_shape
    bound = jnp.array([width - 1.0, height - 1.0], dtype=points.dtype)
    return jnp.clip(points, 0.0, bound)


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, 4) [l, t, r, b] distances against (N, 2) anchor centers.

    SCRFD-style box parameterization (models/scrfd.py): corners are the
    center offset by the four predicted distances (already in pixels).
    """
    x1 = points[:, 0] - distances[:, 0]
    y1 = points[:, 1] - distances[:, 1]
    x2 = points[:, 0] + distances[:, 2]
    y2 = points[:, 1] + distances[:, 3]
    return jnp.stack([x1, y1, x2, y2], axis=1)


def distance2kps(points: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, 5, 2) landmark offsets against (N, 2) anchor centers."""
    return points[:, None, :] + distances


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (K, 4) -> (N, K) IoU matrix with the +1 area convention.

    Reference: src/rcnn/bbox.rs:4-30 / processing/bbox_transform.rs:2-24.
    Used by NMS and by the tracking-by-IoU video utilities.
    """
    bx1, by1, bx2, by2 = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    qx1, qy1, qx2, qy2 = (
        query_boxes[:, 0],
        query_boxes[:, 1],
        query_boxes[:, 2],
        query_boxes[:, 3],
    )
    iw = jnp.maximum(
        jnp.minimum(bx2[:, None], qx2[None, :])
        - jnp.maximum(bx1[:, None], qx1[None, :])
        + 1.0,
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(by2[:, None], qy2[None, :])
        - jnp.maximum(by1[:, None], qy1[None, :])
        + 1.0,
        0.0,
    )
    inter = iw * ih
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    area_q = (qx2 - qx1 + 1.0) * (qy2 - qy1 + 1.0)
    union = area_b[:, None] + area_q[None, :] - inter
    return jnp.where(inter > 0.0, inter / union, 0.0)

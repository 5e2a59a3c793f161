"""Greedy non-maximum suppression, jit-safe with static shapes.

The reference implements three NMS variants: the live host greedy NMS
(/root/reference/src/processing/nms.rs:3-65, keep rule `ovr <= thresh`, "+1"
area convention), an alternate CPU variant (src/rcnn/cpu_nms.rs), and a dead
vendored CUDA bitmask kernel (src/rcnn/nms_kernel.cu).  On TPU, dynamic keep
lists are hostile to XLA, so every variant here consumes boxes already sorted
by descending score plus a validity mask and produces a fixed-size boolean
keep mask:

  - ``nms_numpy``: host oracle with exactly the reference's semantics; used by
    golden tests and the host fallback path.
  - ``nms_mask_greedy``: sequential lax.fori_loop over the sorted boxes —
    bit-exact greedy, O(K) steps of K-wide VPU ops.
  - ``nms_mask_fixpoint``: iterate the suppression recurrence to a fixed
    point.  Each sweep is one (K, K) masked reduction (VPU/MXU friendly) and
    the number of sweeps equals the depth of the suppression DAG (typically
    2-4), so this is the throughput-mode default.  Converges to exactly the
    greedy solution (see proof in ``nms_mask_fixpoint``'s docstring).

A Pallas bitmask kernel (ops/nms_pallas.py) mirrors the role of the
reference's vendored CUDA kernel for the hot path.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def nms_numpy(dets: np.ndarray, thresh: float) -> List[int]:
    """Host greedy NMS oracle over (N, 5) [x1, y1, x2, y2, score] rows.

    Returns kept row indices in descending-score order.  Matches the reference
    nms() (processing/nms.rs:3-65): stable descending sort on the score
    column, "+1" box areas, keep neighbours with overlap <= thresh.
    """
    dets = np.asarray(dets, dtype=np.float32)
    scores = dets[:, 4]
    # numpy argsort is stable with kind="stable"; reference sort_by is stable.
    order = list(np.argsort(-scores, kind="stable"))
    keep: List[int] = []
    while order:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        if not rest:
            break
        rest_arr = np.array(rest)
        xx1 = np.maximum(dets[i, 0], dets[rest_arr, 0])
        yy1 = np.maximum(dets[i, 1], dets[rest_arr, 1])
        xx2 = np.minimum(dets[i, 2], dets[rest_arr, 2])
        yy2 = np.minimum(dets[i, 3], dets[rest_arr, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1.0)
        h = np.maximum(0.0, yy2 - yy1 + 1.0)
        inter = w * h
        area_i = (dets[i, 2] - dets[i, 0] + 1.0) * (dets[i, 3] - dets[i, 1] + 1.0)
        area_r = (dets[rest_arr, 2] - dets[rest_arr, 0] + 1.0) * (
            dets[rest_arr, 3] - dets[rest_arr, 1] + 1.0
        )
        ovr = inter / (area_i + area_r - inter)
        order = [rest[k] for k in range(len(rest)) if ovr[k] <= thresh]
    return keep


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) -> (K, K) IoU with the reference's "+1" area convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    iw = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :])
        + 1.0,
        0.0,
    )
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :])
        + 1.0,
        0.0,
    )
    inter = iw * ih
    return inter / (area[:, None] + area[None, :] - inter)


def _suppression_matrix(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """S[i, j] = True iff kept box i would suppress later box j (i < j)."""
    k = boxes.shape[0]
    iou = iou_matrix(boxes)
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)
    return (iou > iou_threshold) & upper & valid[None, :] & valid[:, None]


def nms_mask_greedy(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Exact greedy NMS keep mask over score-sorted (K, 4) boxes.

    Sequential scan: box j is kept iff valid and no kept i < j overlaps it
    above the threshold — identical output to ``nms_numpy`` on sorted input.
    """
    suppress = _suppression_matrix(boxes, valid, iou_threshold)

    def body(i, keep):
        row = suppress[i, :] & keep[i]
        return keep & ~row

    return jax.lax.fori_loop(0, boxes.shape[0], body, valid)


def nms_mask_fixpoint(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_iterations: int | None = None,
    unrolled_sweeps: int = 4,
) -> jnp.ndarray:
    """Greedy-equivalent NMS via fixed-point iteration (throughput mode).

    Iterates ``keep[j] <- valid[j] & !any_i (keep[i] & S[i, j])`` where S is
    the strict-upper-triangular suppression matrix, starting from
    ``keep = valid``, until unchanged.

    Correctness: define depth(j) = 1 + max(depth(i)) over suppressors i < j of
    j (depth 1 if none).  By induction, after t sweeps every entry with
    depth <= t equals the greedy solution and never changes again: entry j is
    recomputed only from entries i < j with S[i, j], all of depth < depth(j).
    The iteration therefore converges to exactly greedy NMS in
    max-depth <= K sweeps; real detection workloads need 2-4.  Each sweep is
    a single (K, K) masked any-reduction — far fewer sequential steps than the
    O(K) greedy scan.

    The first ``unrolled_sweeps`` sweeps are unrolled straight-line into the
    graph before entering the convergence while_loop: each TPU while
    iteration is a separately launched device program (tens of us of launch
    gap invisible to op-level profiles), so for the typical depth <= 4 case
    the loop body then runs zero times and only the final condition check
    pays a launch.  The result is exact either way — unrolled sweeps are the
    same monotone iteration.
    """
    suppress = _suppression_matrix(boxes, valid, iou_threshold)
    if max_iterations is None:
        max_iterations = boxes.shape[0]

    def sweep(keep):
        suppressed = jnp.any(suppress & keep[:, None], axis=0)
        return valid & ~suppressed

    keep = valid
    changed = jnp.bool_(True)
    for _ in range(min(unrolled_sweeps, max_iterations)):
        new_keep = sweep(keep)
        changed = jnp.any(new_keep != keep)
        keep = new_keep

    def cond(state):
        it, keep, changed = state
        return changed & (it < max_iterations)

    def body(state):
        it, keep, _ = state
        new_keep = sweep(keep)
        return it + 1, new_keep, jnp.any(new_keep != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(min(unrolled_sweeps, max_iterations)), keep, changed)
    )
    return keep


def nms_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    mode: str = "fixpoint",
) -> jnp.ndarray:
    """Dispatch between NMS implementations ("greedy" | "fixpoint" | "pallas")."""
    if mode == "greedy":
        return nms_mask_greedy(boxes, valid, iou_threshold)
    if mode == "fixpoint":
        return nms_mask_fixpoint(boxes, valid, iou_threshold)
    if mode == "pallas":
        from .nms_pallas import nms_mask_pallas

        interpret = jax.default_backend() != "tpu"
        return nms_mask_pallas(boxes, valid, iou_threshold, interpret=interpret)
    raise ValueError(f"unknown NMS mode: {mode!r}")

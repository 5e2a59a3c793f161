"""Pallas TPU NMS kernel: fully fused, VMEM-resident greedy suppression.

This is the TPU-native counterpart of the reference's vendored (dead) CUDA
bitmask NMS (/root/reference/src/rcnn/nms_kernel.cu:34-78 + gpu_nms.cpp:84-133
— 64-thread IoU tiles producing per-block 64-bit suppression masks scanned
greedily on host).  The same two phases map onto TPU hardware differently:

  phase 1 (parallel IoU): the (K, K) IoU/suppression matrix is computed with
    VPU broadcasts entirely in VMEM — no tiling needed at K<=1024
    (K^2 * 4B = 4 MB < 16 MB VMEM);
  phase 2 (greedy scan): instead of the CUDA host-side sequential mask scan,
    we iterate the suppression recurrence keep[j] = valid[j] & !any_i(keep[i]
    & S[i,j]) to its fixed point; each sweep is one (1,K)x(K,K) mask matvec
    on the MXU and the sweep count equals the suppression-DAG depth
    (typically 2-4).  The fixed point is exactly greedy NMS — proof in
    ops/nms.py::nms_mask_fixpoint.

Everything — boxes in, keep mask out — stays resident in VMEM for the whole
kernel; there is no HBM round-trip between the IoU matrix and the scan.

Boxes must be pre-sorted by descending score with a validity mask for
padding, same contract as ops/nms.py.  Scores use the reference's "+1" area
convention and `iou > threshold` suppression rule.

Status: chip-parity-validated but measured SLOWER than the XLA fixpoint
path inside the full fused detect graph (tools/ab_tail.py, v5e mnet b8
@640, 2026-08-19): 2631 vs 2662 img/s at K=256 and 2741 vs 2817 at K=128.
At these K the whole tail is ~0.8 ms and XLA's fused (K, K) masked
reductions already run at VMEM speed; the pallas_call boundary only adds
dispatch overhead.  Kept opt-in (`nms_mode="pallas"`) as the kernel-form
counterpart of the reference's CUDA NMS and for future K >= 1024 regimes
where a single VMEM-resident kernel should win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(
    boxes_ref, boxes_t_ref, valid_ref, keep_ref, *, kp: int, iou_threshold: float
):
    """boxes (kp, 4), boxes_t (4, kp), valid (1, kp) f32 -> keep (1, kp) f32.

    The transposed copy provides row-vector views without in-kernel
    lane<->sublane relayouts.
    """
    x1c = boxes_ref[:, 0:1]  # (kp, 1) column views
    y1c = boxes_ref[:, 1:2]
    x2c = boxes_ref[:, 2:3]
    y2c = boxes_ref[:, 3:4]
    x1r = boxes_t_ref[0:1, :]  # (1, kp) row views
    y1r = boxes_t_ref[1:2, :]
    x2r = boxes_t_ref[2:3, :]
    y2r = boxes_t_ref[3:4, :]

    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r) + 1.0, 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r) + 1.0, 0.0)
    inter = iw * ih  # (kp, kp)
    area_c = (x2c - x1c + 1.0) * (y2c - y1c + 1.0)
    area_r = (x2r - x1r + 1.0) * (y2r - y1r + 1.0)
    iou = inter / (area_c + area_r - inter)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    upper = col_ids > row_ids

    valid_row = valid_ref[:]  # (1, kp) 0/1 f32
    # No validity masking of `sup` needed: invalid rows never enter `keep`
    # (keep starts at valid and every sweep re-multiplies by valid), so their
    # matvec contribution is zero regardless of sup[i, j].
    sup = jnp.where((iou > iou_threshold) & upper, 1.0, 0.0)  # (kp, kp) f32

    def cond(state):
        it, _, changed = state
        return jnp.logical_and(changed, it < kp)

    def body(state):
        it, keep, _ = state
        suppressed = jax.lax.dot_general(
            keep,
            sup,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, kp)
        new_keep = valid_row * jnp.where(suppressed > 0.0, 0.0, 1.0)
        changed = jnp.any(new_keep != keep)
        return it + 1, new_keep, changed

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid_row, jnp.bool_(True))
    )
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_mask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy NMS keep mask over score-sorted (K, 4) boxes, as one TPU kernel.

    Drop-in for ops.nms.nms_mask_greedy / nms_mask_fixpoint (same contract).
    """
    k = boxes.shape[0]
    kp = _round_up(max(k, _LANE), _LANE)

    boxes_p = jnp.zeros((kp, 4), jnp.float32).at[:k].set(boxes.astype(jnp.float32))
    valid_p = (
        jnp.zeros((1, kp), jnp.float32)
        .at[0, :k]
        .set(valid.astype(jnp.float32))
    )

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, kp=kp, iou_threshold=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_p, boxes_p.T, valid_p)

    return keep[0, :k] > 0.0

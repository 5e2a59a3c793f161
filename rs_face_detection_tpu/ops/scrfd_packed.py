"""SCRFD shared head re-expressed on the half-resolution packed grid.

Same trade as ops/ssh_packed.py made for RetinaFace's SSH heads: SCRFD's
head tower runs 64 channels at the stride-8 grid (80^2 @640) — half the
128 MXU lanes, so its tensors occupy and move 2x their logical bytes in
lane-padded tiles.  On the 2x2 phase-packed grid (space_to_depth2) the
same math runs at 256 channels on a quarter of the positions:

    tower0 3x3 (64->64)  -> dense_kernel_packed (3,3,256,256) pad (1,1)
    GroupNorm(16) + relu -> gn_packed (stats over the 4 phase copies of
                            each channel group — exactly the natural GN's
                            (H, W, group) reduction re-indexed)
    tower1 3x3           -> dense_kernel_packed
    cls/bbox/kps 1x1     -> block_diag_1x1_packed (+ phase-tiled biases)

Outputs stay in packed flatten order — (by, bx, phase, a)-major — and are
decoded through a `packed_anchor_perm`-permuted CENTERS table (distance
decode is order-agnostic past the center lookup), so no relayout copy
ever materializes the natural grid.

Exact in f32 (tests/test_scrfd_packed.py); opt-in via
SCRFDDetection.make_batched_fn(stem="s4d", packed_heads=...) pending a
hardware A/B (tools/ab_scrfd.py).  No reference counterpart
(ekyc_pipeline/config.rs ships no model).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ssh_packed import (
    _conv,
    block_diag_1x1_packed,
    dense_kernel_packed,
    space_to_depth2,
)


class ScrfdHeadPackedParams(NamedTuple):
    """Folded constants for the packed shared head (fold_scrfd_head_packed)."""

    k_t0: jnp.ndarray  # (3, 3, 4C, 4C)
    gn0_scale: jnp.ndarray  # (C,)
    gn0_bias: jnp.ndarray  # (C,)
    k_t1: jnp.ndarray  # (3, 3, 4C, 4C)
    gn1_scale: jnp.ndarray
    gn1_bias: jnp.ndarray
    k_cls: jnp.ndarray  # (1, 1, 4C, 4a)
    b_cls: jnp.ndarray  # (4a,) phase-tiled
    k_bbox: jnp.ndarray  # (1, 1, 4C, 16a)
    b_bbox: jnp.ndarray
    k_kps: jnp.ndarray  # (1, 1, 4C, 40a)
    b_kps: jnp.ndarray


def fold_scrfd_head_packed(variables) -> ScrfdHeadPackedParams:
    """Fold the shared head's params into packed-grid constants.

    GroupNorm scale/bias stay per-ORIGINAL-channel (gn_packed broadcasts
    them across the 4 phase copies); conv biases tile per phase to match
    the block-diagonal 1x1 outputs.
    """
    h = variables["params"]["head"]

    def tile4(v):
        return jnp.tile(v, 4).astype(jnp.float32)

    return ScrfdHeadPackedParams(
        dense_kernel_packed(h["tower0"]["kernel"].astype(jnp.float32)),
        h["gn0"]["scale"].astype(jnp.float32),
        h["gn0"]["bias"].astype(jnp.float32),
        dense_kernel_packed(h["tower1"]["kernel"].astype(jnp.float32)),
        h["gn1"]["scale"].astype(jnp.float32),
        h["gn1"]["bias"].astype(jnp.float32),
        block_diag_1x1_packed(h["cls"]["kernel"].astype(jnp.float32)),
        tile4(h["cls"]["bias"]),
        block_diag_1x1_packed(h["bbox"]["kernel"].astype(jnp.float32)),
        tile4(h["bbox"]["bias"]),
        block_diag_1x1_packed(h["kps"]["kernel"].astype(jnp.float32)),
        tile4(h["kps"]["bias"]),
    )


def gn_packed(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 16,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm on the 2x2 phase-packed layout, exact vs the natural grid.

    The natural GN reduces over (H, W, group channels) per sample; on the
    packed tensor those same elements live at (H/2, W/2, all 4 phases,
    group channels), so the reduction simply gains the phase axis.  scale/
    bias are per-original-channel, broadcast across phases.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.astype(jnp.float32).reshape(b, h, w, 4, num_groups, c // num_groups)
    m = y.mean(axis=(1, 2, 3, 5), keepdims=True)
    v = jnp.square(y).mean(axis=(1, 2, 3, 5), keepdims=True) - jnp.square(m)
    y = (y - m) * jax.lax.rsqrt(v + eps)
    y = y.reshape(b, h, w, 4, c) * scale + bias
    return y.reshape(b, h, w, c4)


def scrfd_head_packed(
    feat: jnp.ndarray,
    hp: ScrfdHeadPackedParams,
    compute_dtype=jnp.bfloat16,
):
    """Natural (B, H, W, C) pyramid feature -> packed-order head maps.

    Returns {"score", "bbox", "kps"} with shapes (B, H/2, W/2, 4*a),
    (B, H/2, W/2, 16*a), (B, H/2, W/2, 40*a): the flatten order is
    (by, bx, phase, a)-major — pair with packed_anchor_perm-permuted
    centers.  score is sigmoid'd (matching SCRFD.__call__ raw=False).
    """
    x = space_to_depth2(feat).astype(compute_dtype)
    x = _conv(x, hp.k_t0.astype(compute_dtype), ((1, 1), (1, 1)))
    x = jnp.maximum(gn_packed(x, hp.gn0_scale, hp.gn0_bias), 0.0).astype(
        compute_dtype
    )
    x = _conv(x, hp.k_t1.astype(compute_dtype), ((1, 1), (1, 1)))
    x = jnp.maximum(gn_packed(x, hp.gn1_scale, hp.gn1_bias), 0.0).astype(
        compute_dtype
    )

    def head(k, b):
        return _conv(x, k.astype(compute_dtype), ((0, 0), (0, 0))).astype(
            jnp.float32
        ) + b

    return {
        "score": jax.nn.sigmoid(head(hp.k_cls, hp.b_cls)),
        "bbox": head(hp.k_bbox, hp.b_bbox),
        "kps": head(hp.k_kps, hp.b_kps),
    }

"""Packed per-level SSH context + detection heads on the half-resolution grid.

The stride-8 detection level dominates what's left of the mnet b8 graph
after the dense s4d front (ops/mnet_s4d.py): profiled on v5e, ssh0 alone is
~0.36 ms of a 2.2 ms graph at ~5% MFU, plus ~0.12 ms of level-0 head convs.
The cause is layout, not FLOPs: every ssh0/head conv runs on the 80^2 grid
at 16-64 channels — a quarter to a half of the 128 MXU lanes — and the
16-channel branch tensors occupy 8x their logical bytes in lane-padded HBM
tiles.  The same lane starvation applies (on 1/4 and 1/16 of the spatial
work) to the stride-16/32 levels, so the transform is level-parameterized;
eligibility per level is just an even feature grid.

The fix is the same algebra the front uses, applied at the pyramid level:
space-to-depth the (B, 80, 80, 64) P3 feature to (B, 40, 40, 256)
(phase-major channels (qi*2+qj)*C + c) and re-express

    conv3   3x3 (64->32) + BN            as (3,3,256,128) pad (1,1)
    conv5_1 3x3 (64->16) + BN + act      as (3,3,256, 64) pad (1,1)
    conv5_2 3x3 (16->16) + BN            as (3,3, 64, 64) pad (1,1)
    conv7_1 3x3 (16->16) + BN + act      as (3,3, 64, 64) pad (1,1)
    conv7_2 3x3 (16->16) + BN            as (3,3, 64, 64) pad (1,1)
    concat + relu                        as concat + relu (layout-blind)
    cls/box/ldm 1x1 heads (64 -> 2A/4A/10A)  as block-diagonal 1x1 kernels
                                         whose input rows absorb the
                                         branch-major packed concat layout

with every kernel phase-structured dense (stride-1 3x3 packed 2x2 spans
block offsets {-1, 0, +1}: a (3,3) kernel in block space whose
(tap, phase-in, phase-out) slots are ~25% occupied — 4x nominal FLOPs on
~2% of the level's current device time).

The FPN lateral+merge chains pack the same way (fold_fpn_packed /
fpn_packed, levels 0-1): the lateral 1x1 becomes a per-phase
block-diagonal 1x1, the 3x3 merge conv packs like any stride-1 3x3, and
the top-down nearest 2x upsample-add is FREE in packed space —
up2(P)[2by+qi, 2bx+qj] = P[by, bx] for every phase, so the upsampled
operand is just the coarser level tiled 4x along the phase-major channel
axis: no full-resolution tensor is ever materialized.  The packed P feeds
ssh_heads_packed(pre_packed=True) directly, removing the in-graph
space-to-depth relayout as well; when level 1 is also FPN-packed, level
0's upsample operand is recovered with one (small) depth_to_space2.

The head outputs stay on the 40^2 grid with phase-major channels; their
flattened row order is (by, bx, phase, anchor) instead of the natural
(y, x, anchor).  Decode is order-agnostic past the anchor lookup — top-k,
NMS, and the gather all commute with any fixed row permutation — so the
consumer (pipeline.detection.make_batched_fn) pairs these maps with an
anchor table whose level-0 rows are permuted by `packed_anchor_perm`
instead of relaying the tensors out: zero depth-to-space copies.

Exactness: every packed kernel contracts exactly the natural conv's nonzero
products (plus zero-identity terms), so the transform is algebraically
exact; XLA blocks the wider contractions differently, so outputs agree to
f32 rounding spread (~1e-6 abs) rather than bitwise — tests/test_ssh_packed.py.

Counted-FLOP accounting (XLA cost_analysis, mnet b8 @640, s4d front): the
zero-embedded taps inflate nominal graph FLOPs 42.7 -> 56.7 G with all
three head levels packed, -> 72.2 G with the FPN chains packed too.  The
inflation buys lane occupancy: the replaced convs profiled at ~5% MFU, so
4x nominal FLOPs at full lanes is still a large net device-time win (the
same trade the mnet front made, 4.58 -> 3.30 ms measured).  Treat any MFU
computed from the packed graph's raw FLOP count as inflated accordingly.

Reference lineage: the reference treats the detector as an opaque Triton
model (face_detection.rs:254-284); this transform is TPU-first algebra with
no reference counterpart.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _bn_affine(scale, bias, mean, var, eps=1e-5):
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def dense_kernel_packed(w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 pad-1 (3,3,Cin,Cout) kernel -> (3,3,4Cin,4Cout) on the 2x2
    phase-packed grid (channels phase-major: (qi*2+qj)*C + c).

    Output phase (pi,pj) tap (u,v) reads source offset g = p + u - 1, which
    lives in block g//2 at phase g%2; block offsets span {-1,0,+1} so the
    packed kernel is 3x3 in block space with pad (1,1).  Each (tap, phase)
    slot is written once (g is injective in u for fixed p): pure scatter.
    """
    assert w.shape[:2] == (3, 3), w.shape
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for pi in range(2):
        for pj in range(2):
            p = pi * 2 + pj
            for u in range(3):
                for v in range(3):
                    gy, gx = pi + u - 1, pj + v - 1
                    ka, qi = gy // 2 + 1, gy % 2
                    kb, qj = gx // 2 + 1, gx % 2
                    q = qi * 2 + qj
                    k = k.at[
                        ka, kb,
                        q * cin : (q + 1) * cin,
                        p * cout : (p + 1) * cout,
                    ].set(w[u, v])
    return k


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channels phase-major
    (qi*2+qj)*C + c — the packed kernels' convention."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth2: (B, H/2, W/2, 4C) phase-major ->
    (B, H, W, C) natural grid."""
    b, h2, w2, c4 = x.shape
    assert c4 % 4 == 0, x.shape
    c = c4 // 4
    y = x.reshape(b, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def packed_anchor_perm(fh: int, fw: int, a: int) -> np.ndarray:
    """Row permutation taking the packed flatten order to anchor rows.

    perm[packed_idx] = natural_idx, where natural rows are (y, x, a)-major
    over the (fh, fw) grid and packed rows are (by, bx, phase, a)-major over
    the (fh/2, fw/2) grid with phase = (y%2)*2 + (x%2).  Use it to permute
    the level's anchor-table rows: anchors_packed = anchors[perm].
    """
    assert fh % 2 == 0 and fw % 2 == 0, (fh, fw)
    ys = np.arange(fh // 2)[:, None, None, None]
    xs = np.arange(fw // 2)[None, :, None, None]
    ph = np.arange(4)[None, None, :, None]
    aa = np.arange(a)[None, None, None, :]
    y = ys * 2 + ph // 2
    x = xs * 2 + ph % 2
    return ((y * fw + x) * a + aa).reshape(-1)


def resolve_packed_levels(requested, eligible, what="packed_heads", hint=""):
    """The shared True/False/explicit-levels validation ladder.

    `requested` True -> all eligible (error when none); False/None -> ();
    an iterable -> validated explicit levels.  Callers resolve their own
    None-default semantics BEFORE calling (RetinaFace defaults to all
    eligible, SCRFD to off).  One copy so the RetinaFace and SCRFD packed
    paths cannot drift (pipeline/detection.py, pipeline/ekyc_pipeline.py).
    """
    suffix = f" ({hint})" if hint else ""
    if requested is True:
        if not eligible:
            raise ValueError(f"{what}=True needs at least one eligible level{suffix}")
        return tuple(eligible)
    if requested is False or requested is None:
        return ()
    levels = tuple(sorted(set(int(i) for i in requested)))
    bad = [i for i in levels if i not in eligible]
    if bad:
        raise ValueError(
            f"{what} levels {bad} not eligible{suffix} "
            f"(eligible: {list(eligible)})"
        )
    return levels


def permute_table_for_packed(table: np.ndarray, level_info, packed_strides):
    """Permute a per-anchor row table ((N, k) anchors or centers) so rows
    pair with the packed heads' (by, bx, phase, a) flatten order.

    level_info rows are (stride, fh, fw, a) in the table's concatenation
    order; levels whose stride is in `packed_strides` get packed_anchor_perm
    applied, others pass through.  Decode is order-agnostic past the table
    lookup, so this costs zero relayout copies in-graph.
    """
    parts, offset = [], 0
    for stride, fh, fw, a in level_info:
        k = fh * fw * a
        sl = table[offset : offset + k]
        if stride in packed_strides:
            sl = sl[packed_anchor_perm(fh, fw, a)]
        parts.append(sl)
        offset += k
    return np.concatenate(parts, axis=0)


def block_diag_1x1_packed(w: jnp.ndarray) -> jnp.ndarray:
    """1x1 (1,1,Cin,Cout) kernel -> (1,1,4Cin,4Cout) acting per phase on the
    2x2 phase-packed grid (phase-major channels): block-diagonal, phase p's
    input block maps to phase p's output block."""
    assert w.shape[:2] == (1, 1), w.shape
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((4 * cin, 4 * cout), w.dtype)
    w2 = w.reshape(cin, cout)
    for p in range(4):
        k = k.at[p * cin : (p + 1) * cin, p * cout : (p + 1) * cout].set(w2)
    return k.reshape(1, 1, 4 * cin, 4 * cout)


class FPNPackedParams(NamedTuple):
    """Folded constants for one packed FPN lateral+merge chain
    (see fold_fpn_packed)."""

    k_lat: jnp.ndarray  # (1, 1, 4*Cin, 4C) lateral{level}, block-diagonal
    a_lat: jnp.ndarray
    b_lat: jnp.ndarray
    k_merge: jnp.ndarray  # (3, 3, 4C, 4C) merge{level}
    a_merge: jnp.ndarray
    b_merge: jnp.ndarray


def fold_fpn_packed(
    variables, level: int = 0, eps: float = 1e-5
) -> FPNPackedParams:
    """Fold fpn.lateral{level} + fpn.merge{level} (models/layers.FPN) into
    packed constants: block-diagonal 1x1 lateral, dense-packed 3x3 merge,
    BN running stats as per-channel affines phase-tiled x4.  Levels 0 and 1
    only — the top level has no merge chain."""
    p = variables["params"]["fpn"]
    s = variables["batch_stats"]["fpn"]

    def affine(name):
        a, b = _bn_affine(
            p[name]["BatchNorm_0"]["scale"],
            p[name]["BatchNorm_0"]["bias"],
            s[name]["BatchNorm_0"]["mean"],
            s[name]["BatchNorm_0"]["var"],
            eps,
        )
        return (
            jnp.tile(a, 4).astype(jnp.float32),
            jnp.tile(b, 4).astype(jnp.float32),
        )

    a_lat, b_lat = affine(f"lateral{level}")
    k_lat = block_diag_1x1_packed(
        p[f"lateral{level}"]["Conv_0"]["kernel"].astype(jnp.float32)
    )
    a_merge, b_merge = affine(f"merge{level}")
    k_merge = dense_kernel_packed(
        p[f"merge{level}"]["Conv_0"]["kernel"].astype(jnp.float32)
    )
    return FPNPackedParams(k_lat, a_lat, b_lat, k_merge, a_merge, b_merge)


class SSHPackedParams(NamedTuple):
    """Folded constants for one packed SSH level + its heads
    (see fold_ssh_heads_packed)."""

    k3: jnp.ndarray  # (3, 3, 4C, 4*C/2) conv3
    a3: jnp.ndarray
    b3: jnp.ndarray
    k5_1: jnp.ndarray  # (3, 3, 4C, C) conv5_1
    a5_1: jnp.ndarray
    b5_1: jnp.ndarray
    k5_2: jnp.ndarray  # (3, 3, C, C) conv5_2
    a5_2: jnp.ndarray
    b5_2: jnp.ndarray
    k7_1: jnp.ndarray  # (3, 3, C, C) conv7_1
    a7_1: jnp.ndarray
    b7_1: jnp.ndarray
    k7_2: jnp.ndarray  # (3, 3, C, C) conv7_2
    a7_2: jnp.ndarray
    b7_2: jnp.ndarray
    k_cls: jnp.ndarray  # (1, 1, 4C, 4*2A)
    b_cls: jnp.ndarray
    k_box: jnp.ndarray  # (1, 1, 4C, 4*4A)
    b_box: jnp.ndarray
    k_ldm: jnp.ndarray  # (1, 1, 4C, 4*10A)
    b_ldm: jnp.ndarray


def _head_kernel_packed(w, b, half: int, quarter: int):
    """1x1 head kernel on the natural concat [y3|y5|y7] -> block-diagonal
    packed kernel on the branch-major packed concat
    [y3 phases (4*half) | y5 phases (4*quarter) | y7 phases (4*quarter)].
    """
    assert w.shape[:2] == (1, 1), w.shape
    cin, cout = w.shape[2], w.shape[3]
    assert cin == half + 2 * quarter, (cin, half, quarter)
    k = jnp.zeros((4 * cin, 4 * cout), w.dtype)
    w2 = w.reshape(cin, cout)
    for p in range(4):
        cols = slice(p * cout, (p + 1) * cout)
        k = k.at[p * half : (p + 1) * half, cols].set(w2[:half])
        base = 4 * half
        k = k.at[
            base + p * quarter : base + (p + 1) * quarter, cols
        ].set(w2[half : half + quarter])
        base = 4 * half + 4 * quarter
        k = k.at[
            base + p * quarter : base + (p + 1) * quarter, cols
        ].set(w2[half + quarter :])
    return k.reshape(1, 1, 4 * cin, 4 * cout), jnp.tile(b, 4)


def fold_ssh_heads_packed(
    variables, level: int = 0, eps: float = 1e-5
) -> SSHPackedParams:
    """Fold ssh{level} + cls/box/ldm{level} params into packed constants.

    `variables` is the RetinaFace variables tree (models/retinaface.py);
    BN running stats fold into per-channel affines, phase-tiled x4.
    """
    p = variables["params"]
    s = variables["batch_stats"]
    ssh_p, ssh_s = p[f"ssh{level}"], s[f"ssh{level}"]

    def conv_bn(name):
        pp, st = ssh_p[name], ssh_s[name]
        a, b = _bn_affine(
            pp["BatchNorm_0"]["scale"],
            pp["BatchNorm_0"]["bias"],
            st["BatchNorm_0"]["mean"],
            st["BatchNorm_0"]["var"],
            eps,
        )
        k = dense_kernel_packed(pp["Conv_0"]["kernel"].astype(jnp.float32))
        return k, jnp.tile(a, 4).astype(jnp.float32), jnp.tile(b, 4).astype(
            jnp.float32
        )

    k3, a3, b3 = conv_bn("conv3")
    k5_1, a5_1, b5_1 = conv_bn("conv5_1")
    k5_2, a5_2, b5_2 = conv_bn("conv5_2")
    k7_1, a7_1, b7_1 = conv_bn("conv7_1")
    k7_2, a7_2, b7_2 = conv_bn("conv7_2")

    half = k3.shape[3] // 4
    quarter = k5_2.shape[3] // 4

    def head(name):
        hw = p[name]["kernel"].astype(jnp.float32)
        hb = p[name]["bias"].astype(jnp.float32)
        return _head_kernel_packed(hw, hb, half, quarter)

    k_cls, b_cls = head(f"cls{level}")
    k_box, b_box = head(f"box{level}")
    k_ldm, b_ldm = head(f"ldm{level}")
    return SSHPackedParams(
        k3, a3, b3,
        k5_1, a5_1, b5_1,
        k5_2, a5_2, b5_2,
        k7_1, a7_1, b7_1,
        k7_2, a7_2, b7_2,
        k_cls, b_cls, k_box, b_box, k_ldm, b_ldm,
    )


def _conv(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _bn_act(y, a, b, negative_slope, compute_dtype, act=False):
    y = y.astype(jnp.float32) * a + b
    if act:
        y = (
            jnp.maximum(y, negative_slope * y)
            if negative_slope > 0
            else jnp.maximum(y, 0.0)
        )
    return y.astype(compute_dtype)


def fpn_packed(
    c: jnp.ndarray,
    p_up: jnp.ndarray,
    fp: FPNPackedParams,
    negative_slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    pre_packed: bool = False,
) -> jnp.ndarray:
    """Packed FPN lateral+merge chain: (B, H, W, Cin) backbone feature + the
    (B, H/2, W/2, C) next-coarser pyramid level -> packed P (B, H/2, W/2, 4C).

    Equivalent to FPN's merge(lateral(C) + up2(P_next)) (models/layers.FPN)
    on the half-resolution grid: block-diagonal lateral, channel-tiled
    nearest upsample (exact because up2(P)[2by+qi, 2bx+qj] is P[by, bx] for
    every phase), dense-packed 3x3 merge.

    pre_packed: c is already the phase-packed (B, H/2, W/2, 4Cin) layout.
    """
    pad1 = ((1, 1), (1, 1))
    x = (c if pre_packed else space_to_depth2(c)).astype(compute_dtype)
    lat = _bn_act(
        _conv(x, fp.k_lat.astype(compute_dtype), ((0, 0), (0, 0))),
        fp.a_lat, fp.b_lat, negative_slope, compute_dtype, act=True,
    )
    up = jnp.concatenate([p_up.astype(compute_dtype)] * 4, axis=-1)
    merged = lat + up
    return _bn_act(
        _conv(merged, fp.k_merge.astype(compute_dtype), pad1),
        fp.a_merge, fp.b_merge, negative_slope, compute_dtype, act=True,
    )


def ssh_heads_packed(
    feat: jnp.ndarray,
    sp: SSHPackedParams,
    num_anchors: int,
    negative_slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    pre_packed: bool = False,
):
    """(B, H, W, C) pyramid level -> packed-order head maps for the level.

    Equivalent to SSH(C)(feat) + the level's cls/box/ldm 1x1 heads + the
    2-class softmax (models/retinaface.py), with every conv on the
    (H/2, W/2) grid at 4C channels.  Returns {"score": (B,H/2,W/2,4A),
    "bbox": (B,H/2,W/2,4*4A), "landmark": (B,H/2,W/2,4*10A)} float32, whose
    flattened rows follow packed_anchor_perm's order.

    pre_packed: feat is already the 2x2 phase-packed (B, H/2, W/2, 4C)
    layout (e.g. fpn0_packed's output) — skip the space-to-depth.
    """

    def bn(y, a, b, act=False):
        return _bn_act(y, a, b, negative_slope, compute_dtype, act)

    x = (feat if pre_packed else space_to_depth2(feat)).astype(compute_dtype)
    pad1 = ((1, 1), (1, 1))
    y3 = bn(_conv(x, sp.k3.astype(compute_dtype), pad1), sp.a3, sp.b3)
    y5_1 = bn(
        _conv(x, sp.k5_1.astype(compute_dtype), pad1), sp.a5_1, sp.b5_1,
        act=True,
    )
    y5 = bn(_conv(y5_1, sp.k5_2.astype(compute_dtype), pad1), sp.a5_2, sp.b5_2)
    y7_1 = bn(
        _conv(y5_1, sp.k7_1.astype(compute_dtype), pad1), sp.a7_1, sp.b7_1,
        act=True,
    )
    y7 = bn(_conv(y7_1, sp.k7_2.astype(compute_dtype), pad1), sp.a7_2, sp.b7_2)
    ctx = jnp.concatenate([y3, y5, y7], axis=-1)
    ctx = jnp.maximum(ctx, 0)

    def head(k, b):
        return (
            _conv(ctx, k.astype(compute_dtype), ((0, 0), (0, 0))).astype(
                jnp.float32
            )
            + b
        )

    a = num_anchors
    cls = head(sp.k_cls, sp.b_cls)
    bsz, h2, w2, _ = cls.shape
    logits = cls.reshape(bsz, h2, w2, 4 * a, 2)
    score = jax.nn.softmax(logits, axis=-1)[..., 1]
    box = head(sp.k_box, sp.b_box)
    ldm = head(sp.k_ldm, sp.b_ldm)
    return {"score": score, "bbox": box, "landmark": ldm}

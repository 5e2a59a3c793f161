"""Dense-front re-expression: MobileNet0.25's first four convs on the s4d grid.

Profiled on v5e at batch 8 (tools/profile_detect.py), the mnet detect graph
spends 58% of its 4.58 ms in the narrow-channel front: the 3-channel stem
conv (1.05 ms — XLA lane-pads the 3-channel operand 42x), the uint8->bf16
convert of the full 640^2 frame (0.61 ms), and the 8/16-channel depthwise
convs at 320^2 (0.98 ms).  All of it is layout cost, not FLOPs (the whole
front is ~0.9 GFLOP at batch 8 — 5 us at peak).

Like ops/stem_s4d.py for R50, the fix is algebraic: on the host-side 4x4
space-to-depth layout (ops.image.s4d_layout_host, (B, H/4, W/4, 48) uint8),
the chain

    conv1 3x3/s2 (3->8) + BN + leaky          [320^2 x 8]
    ds1.dw 3x3/s1 depthwise(8) + BN + leaky   [320^2 x 8]
    ds1.pw 1x1 (8->16) + BN + leaky           [320^2 x 16]
    ds2.dw 3x3/s2 depthwise(16) + BN + leaky  [160^2 x 16]

re-expresses EXACTLY (modulo float order) as four dense convs on the
160^2 grid, with the 2x2 phases of the 320^2 intermediate grid carried in
channels (phase-major channel p*C + c, p = pi*2 + pj):

    A: (2,2,48,32)  pad (1,0)   stem; output = phase-packed conv1
    B: (3,3,32,32)  pad (1,1)   ds1.dw as a phase-structured dense conv
    C: (1,1,32,64)  -           ds1.pw, block-diagonal over phases
    D: (2,2,64,16)  pad (1,0)   ds2.dw; stride-2 consumes the packing and
                                emits the NATURAL 160^2 x 16 tensor

Every intermediate is 160^2 x {32,64} — MXU-aligned channel counts and ~5%
of the HBM traffic of the 3-channel/lane-padded original.  BatchNorm
affines replicate across the packed phases; leaky-ReLU is elementwise and
layout-blind.  The dense B/C/D kernels embed the depthwise/grouped
structure as zeros — nominal FLOPs inflate ~8x but remain trivially small.

Derivation (kernel index <-> tap): a source row r = S*m' + g (S the output
stride in block space) lands in s4d block m' + floor(g/4) at phase g mod 4,
and in 2x2 phase space at block m' + floor(g/2), phase g mod 2; taps
spanning blocks {-1, 0} give 2-tap kernels with pad (1, 0), spanning
{-1, 0, 1} give 3-tap kernels with pad (1, 1).

Exactness vs the standard chain is proven in tests/test_mnet_s4d.py
(f32 exact, bf16 rounding-close), wired into the serving graph via
pipeline.detection.make_batched_fn(stem="s4d") for the MobileNet backbone.

The MID extension (`mnet_s4d_mid`) continues the same algebra one stage
deeper: the ds2.pw / ds3.dw / ds3.pw / ds4.dw chain still runs at 160^2
with 32 channels — a quarter of the 128 MXU lanes, so its tensors occupy
(and move) 4x their logical bytes in lane-padded HBM tiles.  Re-packed on
the 80^2 grid carrying the 2x2 phases of 160^2 (one in-graph
space-to-depth of the 160^2 x 16 front output), the chain becomes

    E: (1,1,64,128)             ds2.pw, block-diagonal over phases
    F: (3,3,128,128) pad (1,1)  ds3.dw as a phase-structured dense conv
    G: (1,1,128,128)            ds3.pw, block-diagonal
    H: (2,2,128,32)  pad (1,0)  ds4.dw; the stride consumes the packing
                                and emits the NATURAL 80^2 x 32 tensor

— every tensor exactly 128 lanes wide.  The dense F embeds dw(32) with
zeros (~2 GFLOP/img nominal inflation at 640^2, ~80 us/batch-8 at peak —
bought back many times over in HBM traffic).  The packed kernels reuse
_pw_kernel_packed / _dw_kernel_packed unchanged: their derivation depends
only on the packing block (2) and torch pad-1 conventions, not on which
grid level is being packed.

Reference lineage: the reference treats the detector as an opaque Triton
model (face_detection.rs:254-284); this transform is TPU-first algebra with
no reference counterpart.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ssh_packed import _conv
import numpy as np


class MnetS4DParams(NamedTuple):
    """Folded constants for the dense mnet front (see fold_mnet_s4d_params)."""

    mean48: jnp.ndarray
    scale48: jnp.ndarray
    k_a: jnp.ndarray  # (2, 2, 48, 32)
    a_a: jnp.ndarray  # (32,) BN scale, phase-tiled
    b_a: jnp.ndarray  # (32,) BN bias, phase-tiled
    k_b: jnp.ndarray  # (3, 3, 32, 32)
    a_b: jnp.ndarray
    b_b: jnp.ndarray
    k_c: jnp.ndarray  # (1, 1, 32, 64)
    a_c: jnp.ndarray  # (64,)
    b_c: jnp.ndarray
    k_d: jnp.ndarray  # (2, 2, 64, 16)
    a_d: jnp.ndarray  # (16,)
    b_d: jnp.ndarray


def _bn_affine(scale, bias, mean, var, eps=1e-5):
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def _stem_kernel_s4d(w1_rgb: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,8) stride-2 stem kernel -> (2,2,48,32) dense s4d kernel.

    Output channel (pi*2+pj)*8 + o is the (pi,pj) phase of the 320^2 stem
    output; input channel (ry*4+rx)*3 + c is s4d_layout_host's, with c in
    BGR source order (the BGR->RGB flip folds into the channel permutation).
    """
    assert w1_rgb.shape[:3] == (3, 3, 3), w1_rgb.shape
    oc = w1_rgb.shape[3]
    src, dst, phase = [], [], []
    for pi in range(2):
        for pj in range(2):
            for u in range(3):
                for v in range(3):
                    gy, gx = 2 * pi + u - 1, 2 * pj + v - 1
                    ka, ry = gy // 4 + 1, gy % 4
                    kb, rx = gx // 4 + 1, gx % 4
                    for c_rgb in range(3):
                        c_bgr = 2 - c_rgb
                        src.append((u * 3 + v) * 3 + c_rgb)
                        dst.append((ka * 2 + kb) * 48 + (ry * 4 + rx) * 3 + c_bgr)
                        phase.append(pi * 2 + pj)
    w_flat = jnp.reshape(w1_rgb, (27, oc))
    k = (
        jnp.zeros((4 * 48, 4, oc), w1_rgb.dtype)
        .at[np.asarray(dst), np.asarray(phase)]
        .set(w_flat[np.asarray(src)])
    )
    return k.reshape(2, 2, 48, 4 * oc)


def _dw_kernel_packed(wdw: jnp.ndarray, stride_out: int) -> jnp.ndarray:
    """Depthwise (3,3,1,C) stride-1/2 kernel -> dense phase-space kernel.

    stride_out=1: (3,3,4C,4C) pad (1,1) — packed 2x2 phases in and out
    (ds1.dw: taps span block offsets {-1, 0, +1}).
    stride_out=2: (2,2,4C,C) pad (1,0) — packed input, NATURAL output grid
    (ds2.dw: the stride consumes the packing; taps span blocks {-1, 0}).
    Channel layouts are phase-major: (qi*2 + qj)*C + c.
    """
    assert wdw.shape[:3] == (3, 3, 1), wdw.shape
    ch = wdw.shape[3]
    if stride_out == 1:
        kk, phases = 3, ((0, 0), (0, 1), (1, 0), (1, 1))
    else:
        kk, phases = 2, ((0, 0),)
    rows, cols, taps = [], [], []
    for p_idx, (pi, pj) in enumerate(phases):
        for u in range(3):
            for v in range(3):
                # Source offset on the 320^2 grid; for stride_out=2 the
                # output pixel m reads rows 2m + (u-1).
                gy = (pi if stride_out == 1 else 0) + u - 1
                gx = (pj if stride_out == 1 else 0) + v - 1
                ka, qi = gy // 2 + 1, gy % 2
                kb, qj = gx // 2 + 1, gx % 2
                for c in range(ch):
                    rows.append(((ka * kk + kb) * 4 + (qi * 2 + qj)) * ch + c)
                    cols.append(p_idx * ch + c)
                    taps.append(u * 3 + v)
    wv = jnp.reshape(wdw, (9, ch))
    vals = wv[np.asarray(taps), np.asarray(cols) % ch]
    k = (
        jnp.zeros((kk * kk * 4 * ch, len(phases) * ch), wdw.dtype)
        .at[np.asarray(rows), np.asarray(cols)]
        .set(vals)
    )
    return k.reshape(kk, kk, 4 * ch, len(phases) * ch)


def _pw_kernel_packed(wpw: jnp.ndarray) -> jnp.ndarray:
    """Pointwise (1,1,Cin,Cout) -> block-diagonal (1,1,4Cin,4Cout) over phases."""
    assert wpw.shape[:2] == (1, 1), wpw.shape
    cin, cout = wpw.shape[2], wpw.shape[3]
    k = jnp.zeros((4 * cin, 4 * cout), wpw.dtype)
    w = jnp.reshape(wpw, (cin, cout))
    for p in range(4):
        k = k.at[p * cin : (p + 1) * cin, p * cout : (p + 1) * cout].set(w)
    return k.reshape(1, 1, 4 * cin, 4 * cout)


def fold_mnet_s4d_params(
    variables,
    pixel_means: Tuple[float, float, float],
    pixel_stds: Tuple[float, float, float],
    pixel_scale: float,
    eps: float = 1e-5,
) -> MnetS4DParams:
    """Fold the mnet front (conv1 + ds1 + ds2.dw, standard 3x3 stem) into
    dense s4d constants.  `variables` is the RetinaFace variables tree."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]

    def bn(mod, sub=None):
        pp = p[mod][sub] if sub else p[mod]
        ss = s[mod][sub] if sub else s[mod]
        return _bn_affine(
            pp["BatchNorm_0"]["scale"],
            pp["BatchNorm_0"]["bias"],
            ss["BatchNorm_0"]["mean"],
            ss["BatchNorm_0"]["var"],
            eps,
        )

    k_a = _stem_kernel_s4d(p["conv1"]["Conv_0"]["kernel"].astype(jnp.float32))
    a1, b1 = bn("conv1")
    k_b = _dw_kernel_packed(
        p["ds1"]["dw"]["Conv_0"]["kernel"].astype(jnp.float32), stride_out=1
    )
    a2, b2 = bn("ds1", "dw")
    k_c = _pw_kernel_packed(
        p["ds1"]["pw"]["Conv_0"]["kernel"].astype(jnp.float32)
    )
    a3, b3 = bn("ds1", "pw")
    k_d = _dw_kernel_packed(
        p["ds2"]["dw"]["Conv_0"]["kernel"].astype(jnp.float32), stride_out=2
    )
    a4, b4 = bn("ds2", "dw")

    mean3 = np.asarray(pixel_means, np.float32) * pixel_scale
    scale3 = (1.0 / np.asarray(pixel_stds, np.float32)) / pixel_scale
    # s4d channels are (ry*4+rx)*3 + c with c in BGR order.
    mean48 = jnp.asarray(np.tile(mean3[::-1], 16))
    scale48 = jnp.asarray(np.tile(scale3[::-1], 16))

    def tile4(v):
        return jnp.tile(v, 4).astype(jnp.float32)

    return MnetS4DParams(
        mean48, scale48,
        k_a, tile4(a1), tile4(b1),
        k_b, tile4(a2), tile4(b2),
        k_c, tile4(a3), tile4(b3),
        k_d, a4.astype(jnp.float32), b4.astype(jnp.float32),
    )


class MnetS4DMidParams(NamedTuple):
    """Folded constants for the packed mid chain (see fold_mnet_s4d_mid_params)."""

    k_e: jnp.ndarray  # (1, 1, 64, 128) ds2.pw block-diagonal
    a_e: jnp.ndarray
    b_e: jnp.ndarray
    k_f: jnp.ndarray  # (3, 3, 128, 128) ds3.dw phase-dense
    a_f: jnp.ndarray
    b_f: jnp.ndarray
    k_g: jnp.ndarray  # (1, 1, 128, 128) ds3.pw block-diagonal
    a_g: jnp.ndarray
    b_g: jnp.ndarray
    k_h: jnp.ndarray  # (2, 2, 128, 32) ds4.dw, consumes the packing
    a_h: jnp.ndarray
    b_h: jnp.ndarray


def fold_mnet_s4d_mid_params(variables, eps: float = 1e-5) -> MnetS4DMidParams:
    """Fold ds2.pw + ds3(dw,pw) + ds4.dw into packed-phase dense constants."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]

    def bn(mod, sub):
        pp, ss = p[mod][sub], s[mod][sub]
        return _bn_affine(
            pp["BatchNorm_0"]["scale"],
            pp["BatchNorm_0"]["bias"],
            ss["BatchNorm_0"]["mean"],
            ss["BatchNorm_0"]["var"],
            eps,
        )

    def tile4(v):
        return jnp.tile(v, 4).astype(jnp.float32)

    k_e = _pw_kernel_packed(p["ds2"]["pw"]["Conv_0"]["kernel"].astype(jnp.float32))
    a_e, b_e = bn("ds2", "pw")
    k_f = _dw_kernel_packed(
        p["ds3"]["dw"]["Conv_0"]["kernel"].astype(jnp.float32), stride_out=1
    )
    a_f, b_f = bn("ds3", "dw")
    k_g = _pw_kernel_packed(p["ds3"]["pw"]["Conv_0"]["kernel"].astype(jnp.float32))
    a_g, b_g = bn("ds3", "pw")
    k_h = _dw_kernel_packed(
        p["ds4"]["dw"]["Conv_0"]["kernel"].astype(jnp.float32), stride_out=2
    )
    a_h, b_h = bn("ds4", "dw")
    return MnetS4DMidParams(
        k_e, tile4(a_e), tile4(b_e),
        k_f, tile4(a_f), tile4(b_f),
        k_g, tile4(a_g), tile4(b_g),
        k_h, a_h.astype(jnp.float32), b_h.astype(jnp.float32),
    )


def mnet_s4d_mid(
    y16: jnp.ndarray,
    mp: MnetS4DMidParams,
    negative_slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H/4, W/4, 16) front output -> (B, H/8, W/8, 32) ds4.dw output.

    Equivalent to ds2.pw + ds3(dw,pw) + ds4.dw (each BN + leaky) of
    MobileNetV1_025; the result feeds ds4.pw (front_precomputed="ds4.pw").
    """
    b, h, w, c = y16.shape
    assert h % 2 == 0 and w % 2 == 0, y16.shape

    def bn_leaky(y, a, bb):
        y = y.astype(jnp.float32) * a + bb
        return jnp.maximum(y, negative_slope * y).astype(compute_dtype)

    # space_to_depth(2): channel (qi*2 + qj)*C + c — the packed kernels'
    # phase-major convention.
    y = y16.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    y = y.astype(compute_dtype)
    y = _conv(y, mp.k_e.astype(compute_dtype), ((0, 0), (0, 0)))
    y = bn_leaky(y, mp.a_e, mp.b_e)
    y = _conv(y, mp.k_f.astype(compute_dtype), ((1, 1), (1, 1)))
    y = bn_leaky(y, mp.a_f, mp.b_f)
    y = _conv(y, mp.k_g.astype(compute_dtype), ((0, 0), (0, 0)))
    y = bn_leaky(y, mp.a_g, mp.b_g)
    y = _conv(y, mp.k_h.astype(compute_dtype), ((1, 0), (1, 0)))
    y = bn_leaky(y, mp.a_h, mp.b_h)
    return y.astype(out_dtype)


def mnet_s4d_front(
    x_s4d_u8: jnp.ndarray,
    fp: MnetS4DParams,
    negative_slope: float = 0.1,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H/4, W/4, 48) uint8 BGR s4d frames -> (B, H/4, W/4, 16).

    Equivalent to normalize + conv1/BN/leaky + ds1(dw,pw)/BN/leaky +
    ds2.dw/BN/leaky of MobileNetV1_025; the result feeds ds2.pw
    (MobileNetV1_025's front_precomputed entry point).
    """

    def bn_leaky(y, a, b):
        y = y.astype(jnp.float32) * a + b
        return jnp.maximum(y, negative_slope * y).astype(compute_dtype)

    xn = ((x_s4d_u8.astype(jnp.float32) - fp.mean48) * fp.scale48).astype(
        compute_dtype
    )
    y = _conv(xn, fp.k_a.astype(compute_dtype), ((1, 0), (1, 0)))
    y = bn_leaky(y, fp.a_a, fp.b_a)
    y = _conv(y, fp.k_b.astype(compute_dtype), ((1, 1), (1, 1)))
    y = bn_leaky(y, fp.a_b, fp.b_b)
    y = _conv(y, fp.k_c.astype(compute_dtype), ((0, 0), (0, 0)))
    y = bn_leaky(y, fp.a_c, fp.b_c)
    y = _conv(y, fp.k_d.astype(compute_dtype), ((1, 0), (1, 0)))
    y = bn_leaky(y, fp.a_d, fp.b_d)
    return y.astype(out_dtype)

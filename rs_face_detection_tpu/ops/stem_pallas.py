"""Fused Pallas TPU stem for space-to-depth ResNet backbones.

One kernel replaces the R50 serving path's whole stem chain —
uint8 convert + normalize (ops/image.s2d_stem_input), the 4x4/s1 stem conv on
the 2x2 space-to-depth layout (models/resnet.ResNet50), BatchNorm + ReLU, and
the 3x3/s2 max-pool — without ever materializing the (B, H/2, W/2, 64)
pre-pool activation in HBM.

Why: the R50 batch-8 @640 profile splits ~1.3 ms of the 8.1 ms device graph
across exactly these ops (stem conv 0.68 ms at ~15% MXU utilization because
XLA contracts over only 12 input channels, uint8->bf16 relayout copy 0.35 ms,
reduce_window max-pool 0.29 ms), almost all of it HBM traffic for the 105 MB
pre-pool tensor.  The fused kernel reads the uint8 input once and writes the
26 MB post-pool output once; the conv runs as two (rows * W/4, 192) @
(192, 64) MXU matmuls per row tile (even / odd output columns) with the full
4*4*12-deep im2col contraction.

Mosaic-shaped design notes (each clause dodges a real lowering limit):
  - input columns are pre-split by parity on the XLA side, so the kernel's
    column max-pool needs no strided slices (unsupported: >2D gather);
  - row tiles arrive as non-overlapping main (16-row) + halo (4-row)
    BlockSpec blocks of the same operand — BlockSpec index maps cannot
    express overlap, and manual DMA cannot slice the lane-padded
    12-channel operand;
  - column shifts use pltpu.roll before slicing from offset 0 — a sliced
    operand with a nonzero sublane offset cannot enter a concatenate;
  - the 3x3/s2 row pool is a statically unrolled max over outer-dim rows.

Numerics: identical op order to the XLA chain — normalize in f32, cast to the
compute dtype (bf16 in serving), conv accumulates in f32 on the MXU, BN affine
and ReLU in f32 — so results match the XLA path to bf16 rounding (bit-exact in
f32 mode; see tests/test_stem_pallas.py).  The BGR->RGB channel flip is folded
into the conv kernel's input-channel axis and the normalize constants, so the
kernel consumes the native loader's raw BGR pre-s2d frames with zero data
movement (ops/image.s2d_layout_host layout).

Reference lineage: the stem semantics mirror the remote Triton R50 detector's
first layers (SURVEY.md §2; /root/reference/src/pipeline/module/
face_detection.rs:254-284 treats the network as a black box) as re-expressed
by models/resnet.ResNet50; this kernel is a TPU-first fusion of those ops,
not a translation of any reference code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: pooled rows produced per grid step (conv rows per tile = 2*_TILE_P + 1).
_TILE_P = 8
#: input rows per tile: 2*_TILE_P main + 4 halo (conv taps reach 3 past the
#: tile's first conv row and the pool's last conv row needs +1).
_HALO = 4


def supported_shape(h2: int, w2: int) -> bool:
    """Whether the fused stem handles an (H/2, W/2) pre-s2d frame size."""
    return h2 % (2 * _TILE_P) == 0 and w2 % 4 == 0


def _stem_kernel(
    xem_ref,  # VMEM (1, 16, Wj, 12) uint8: even cols, main rows
    xeh_ref,  # VMEM (1, 4, Wj, 12) uint8: even cols, halo rows
    xom_ref,  # VMEM (1, 16, Wj, 12) uint8: odd cols, main rows
    xoh_ref,  # VMEM (1, 4, Wj, 12) uint8: odd cols, halo rows
    w_ref,  # VMEM (192, 64) compute-dtype im2col weights, (dy, dx, cin) rows
    bn_ref,  # VMEM (2, 64) f32: row 0 = scale, row 1 = bias
    norm_ref,  # VMEM (2, 12) f32: row 0 = mean, row 1 = scale (per channel)
    out_ref,  # VMEM (1, _TILE_P, W/4, 64) out dtype
    shift_ref,  # VMEM scratch (3, rows_in, W/4, 12) compute-dtype
    *,
    compute_dtype,
    h2: int,
):
    t = pl.program_id(1)
    wj = xem_ref.shape[2]  # padded parity-plane width = W/4 + 2
    wq = wj - 2  # pooled cols = W/4
    rows_in = 2 * _TILE_P + _HALO
    rows_conv = 2 * _TILE_P + 1
    row0 = 2 * _TILE_P * t

    # Normalize in f32 (same op order as ops/image.s2d_stem_input), then cast
    # to the matmul dtype.  Channel constants are in the *input's* (BGR s2d)
    # order — the RGB flip lives in the weight layout.  The conv pads the
    # *normalized* image with zeros, but the uint8 pre-pad zeros would
    # normalize to -mean*scale, so the border is zeroed explicitly (pad rows:
    # top 3 / bottom 1 of the padded frame; pad cols: first and last j).
    mean = norm_ref[0:1, :][None]  # (1, 1, 12)
    scale = norm_ref[1:2, :][None]
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows_in, wj, 1), 0) + row0
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows_in, wj, 1), 1)
    inside = (grow >= 3) & (grow < h2 + 3) & (gcol >= 1) & (gcol < wj - 1)

    def norm(main_ref, halo_ref):
        x = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # (rows_in, wj, 12)
        # Mosaic has no direct uint8->f32 cast; widen through int32 first.
        v = (x.astype(jnp.int32).astype(jnp.float32) - mean) * scale
        return jnp.where(inside, v, 0.0).astype(compute_dtype)

    xe = norm(xem_ref, xeh_ref)
    xo = norm(xom_ref, xoh_ref)

    # Column shifts: a sliced value keeps its sublane offset in Mosaic's
    # layout and offset-mismatched values cannot enter a concatenate, so
    # shifted slabs take a scratch-ref roundtrip — the store relayouts to the
    # ref's offset-0 layout.
    def shifted(x, s, slot):
        if s == 0:
            return x[:, 0:wq]
        shift_ref[slot] = x[:, s : s + wq]
        return shift_ref[slot]

    e0, e1, e2 = shifted(xe, 0, 0), shifted(xe, 1, 0), shifted(xe, 2, 1)
    o0, o1 = shifted(xo, 0, 0), shifted(xo, 1, 2)

    # im2col from offset-0 slabs (row slices hit the untiled leading dim
    # only).  Conv output col x taps padded original cols x+dx (dx 0..3); in
    # parity space, even x=2q taps [E[q], O[q], E[q+1], O[q+1]] and odd
    # x=2q+1 taps [O[q], E[q+1], O[q+1], E[q+2]] — both in ascending-dx
    # order, so one (192, 64) weight matrix (row = (dy*4 + dx)*12 + cin)
    # serves both matmuls.
    def im2col(slabs):
        z = jnp.concatenate(
            [s[dy : dy + rows_conv] for dy in range(4) for s in slabs],
            axis=-1,
        )  # (rows_conv, wq, 192)
        return z.reshape(rows_conv * wq, 192)

    def conv_bn_relu(z):
        acc = jax.lax.dot_general(
            z,
            w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(acc * bn_ref[0:1, :] + bn_ref[1:2, :], 0.0)
        return y.reshape(rows_conv, wq, 64)

    c_even = conv_bn_relu(im2col([e0, o0, e1, o1]))  # conv cols 2q
    c_odd = conv_bn_relu(im2col([o0, e1, o1, e2]))  # conv cols 2q+1

    # Row 0 of tile 0 is the pool's top padding row (conv row -1): the pool
    # pads with -inf (torch MaxPool2d(3, 2, 1)); post-ReLU values are >= 0 so
    # any negative sentinel is equivalent.
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows_conv, 1, 1), 0)
    top_pad = (t == 0) & (rid == 0)
    c_even = jnp.where(top_pad, -1.0, c_even)
    c_odd = jnp.where(top_pad, -1.0, c_odd)

    # 3x3/s2 max-pool.  Columns: pooled q = max(C[2q-1], C[2q], C[2q+1]) =
    # max(odd[q-1], even[q], odd[q]) with odd[-1] = pad.
    prev_odd = jnp.concatenate(
        [jnp.full((rows_conv, 1, 64), -1.0, c_odd.dtype), c_odd[:, : wq - 1]],
        axis=1,
    )
    colmax = jnp.maximum(prev_odd, jnp.maximum(c_even, c_odd))

    # Rows: pooled local row p = max over conv rows 2p, 2p+1, 2p+2 (static
    # unrolled — Mosaic has no strided slicing).
    for p in range(_TILE_P):
        out_ref[0, p] = jnp.maximum(
            colmax[2 * p], jnp.maximum(colmax[2 * p + 1], colmax[2 * p + 2])
        ).astype(out_ref.dtype)


def fold_stem_params(
    kernel_rgb: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    pixel_means: Tuple[float, float, float],
    pixel_stds: Tuple[float, float, float],
    pixel_scale: float,
    eps: float = 1e-5,
):
    """Fold BGR flip / normalize / BatchNorm into kernel-ready constants.

    kernel_rgb: the model's (4, 4, 12, 64) s2d stem kernel, whose input
    channels expect the RGB-flipped s2d layout produced by s2d_stem_input.
    Returns (w192, bn2, norm2): im2col weights with BGR-ordered input
    channels, the BN affine as (2, 64) f32, and per-channel normalize
    constants as (2, 12) f32 in BGR s2d order (with the pipeline's
    mean*pixel_scale / (1/std)/pixel_scale folding applied).
    """
    assert kernel_rgb.shape[:3] == (4, 4, 12), kernel_rgb.shape
    # s2d channel k = block*3 + c; flip c within each block (its own inverse).
    perm = np.concatenate([np.arange(3)[::-1] + 3 * i for i in range(4)])
    w = jnp.asarray(kernel_rgb)[:, :, perm, :]
    w192 = w.reshape(192, w.shape[-1])

    a = bn_scale / jnp.sqrt(bn_var + eps)
    bn2 = jnp.stack([a, bn_bias - bn_mean * a]).astype(jnp.float32)

    mean3 = np.asarray(pixel_means, np.float32) * pixel_scale
    scale3 = (1.0 / np.asarray(pixel_stds, np.float32)) / pixel_scale
    # BGR order = reverse within each 3-channel block.
    norm2 = jnp.asarray(
        np.stack([np.tile(mean3[::-1], 4), np.tile(scale3[::-1], 4)])
    )
    return w192, bn2, norm2


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "out_dtype", "interpret")
)
def fused_stem_s2d(
    x_pre_s2d_u8: jnp.ndarray,
    w192: jnp.ndarray,
    bn2: jnp.ndarray,
    norm2: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H/2, W/2, 12) uint8 BGR pre-s2d frames -> (B, H/4, W/4, 64) pooled.

    Equivalent to s2d_stem_input + ConvBN(64, 4x4, pad (2,1)) + ReLU +
    max_pool(3x3, s2, pad 1) with the folded constants from
    `fold_stem_params`.  Requires H/2 % 16 == 0 and W/2 % 4 == 0 (tile math);
    callers fall back to the XLA chain otherwise.
    """
    b, h2, w2, c = x_pre_s2d_u8.shape
    assert c == 12, x_pre_s2d_u8.shape
    assert h2 % (2 * _TILE_P) == 0 and w2 % 4 == 0, x_pre_s2d_u8.shape
    n_tiles = h2 // (2 * _TILE_P)
    wq = w2 // 2  # pooled width (W/4 of the original image)
    wj = wq + 2

    # Split columns by parity and pad: +3/+1 rows for the conv halo and one
    # column-pair each side (orig cols -2/-1 and w2/w2+1).
    xe = jnp.pad(x_pre_s2d_u8[:, :, 0::2, :], ((0, 0), (3, 1), (1, 1), (0, 0)))
    xo = jnp.pad(x_pre_s2d_u8[:, :, 1::2, :], ((0, 0), (3, 1), (1, 1), (0, 0)))

    main = pl.BlockSpec(
        (1, 2 * _TILE_P, wj, 12), lambda bi, ti: (bi, ti, 0, 0)
    )
    # Halo rows 2P*t + 2P .. + _HALO-1 expressed in _HALO-row block units.
    hb = 2 * _TILE_P // _HALO
    halo = pl.BlockSpec(
        (1, _HALO, wj, 12), lambda bi, ti: (bi, hb * ti + hb, 0, 0)
    )

    out = pl.pallas_call(
        functools.partial(_stem_kernel, compute_dtype=compute_dtype, h2=h2),
        grid=(b, n_tiles),
        out_shape=jax.ShapeDtypeStruct((b, h2 // 2, wq, 64), out_dtype),
        in_specs=[
            main,
            halo,
            main,
            halo,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_P, wq, 64), lambda bi, ti: (bi, ti, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 2 * _TILE_P + _HALO, wq, 12), compute_dtype),
        ],
        interpret=interpret,
    )(xe, xe, xo, xo, w192.astype(compute_dtype), bn2, norm2)
    return out

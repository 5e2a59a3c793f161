"""Dense-stem re-expression: the R50 stem as one MXU-shaped XLA conv.

The serving R50 stem chain — uint8 convert + normalize
(ops/image.s2d_stem_input), 4x4/s1 conv on the 2x2 space-to-depth layout
(models/resnet.ResNet50), BatchNorm + ReLU, 3x3/s2 max-pool — is
mathematically a 7x7/s2 conv + pool on the original frame.  On the 2x2 s2d
grid XLA contracts over only 12 input channels (~15% MXU) and the
convert / pool ops shuffle a 105 MB intermediate through HBM: the chain
profiles at ~1.3 ms of the 8.1 ms R50 batch-8 graph.

This module re-expresses the same math on a 4x4 space-to-depth layout
(ops/image.s4d_layout_host, (B, H/4, W/4, 48) uint8):

  - the conv becomes a single dense 3x3 conv with 48 input and 256 output
    channels at (H/4, W/4) resolution — the four output channel groups are
    the 2x2 phases of the original stride-2 output grid.  Contraction depth
    9*48 = 432 tiles cleanly onto the MXU.  (The materialized kernel embeds
    the original taps with zeros — ~2.3x the nominal FLOPs — but the dense
    shape more than wins them back.)
  - the 3x3/s2 max-pool becomes elementwise maxes over phase channel
    slices with one shifted-row and one shifted-column term, all fusible:
    pool row p reads conv rows 2p-1, 2p, 2p+1 = phases (p-1, 1), (p, 0),
    (p, 1).  The -1 pad sentinel is exact because post-ReLU values are >= 0
    (torch MaxPool2d(3, 2, 1) pads with -inf).

Numerics: normalize in f32 -> cast to compute dtype -> conv (f32 accumulate)
-> BN affine + ReLU in f32, matching s2d_stem_input + ConvBN semantics;
f32 mode is exact vs the s2d chain and bf16 matches to rounding
(tests/test_stem_s4d.py).  The BGR->RGB flip is folded into the kernel's
input-channel order, so the host sends raw BGR s4d frames.

Reference lineage: same stem semantics as models/resnet.ResNet50's
re-expression of the Triton R50 first layers (face_detection.rs:254-284
treats the network as opaque); this is a further TPU-first algebraic
transform, not reference code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def s2d_to_s4d_kernel(kernel_s2d: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, 12, 64) s2d stem kernel -> (3, 3, 48, 256) dense s4d kernel.

    Input channels stay in the *same* per-pixel channel order as the s2d
    kernel's (callers fold the BGR flip before or after — the transform is
    order-agnostic in c).  Output channel layout: (sy*2 + sx)*64 + o for the
    2x2 output phases (sy, sx).

    Derivation: conv' output at s4d block (By, Bx), phase (sy, sx) must equal
    the s2d conv at grid position (2*By + sy, 2*Bx + sx), whose tap (dy, dx)
    reads s2d cell (2*By + sy + dy - 2, ...) [pad (2, 1)].  With
    g = s + d - 2: block offset floor(g/2) in {-1, 0, 1} -> 3x3 kernel, s2d
    sub-row g mod 2; s2d cell phase (qy, qx) maps to s4d channel row
    ry = 2*(g mod 2) + qy.
    """
    assert kernel_s2d.shape[:3] == (4, 4, 12), kernel_s2d.shape
    oc = kernel_s2d.shape[3]
    # Static index plan (numpy ints only — jit-traceable on the values).
    src, dst, phase = [], [], []
    for sy in range(2):
        for sx in range(2):
            for dy in range(4):
                for dx in range(4):
                    gy, gx = sy + dy - 2, sx + dx - 2
                    ky, ay = gy // 2 + 1, gy % 2
                    kx, ax = gx // 2 + 1, gx % 2
                    for q in range(12):
                        qy, qx, c = q // 6, (q % 6) // 3, q % 3
                        c48 = ((2 * ay + qy) * 4 + (2 * ax + qx)) * 3 + c
                        src.append((dy * 4 + dx) * 12 + q)
                        dst.append((ky * 3 + kx) * 48 + c48)
                        phase.append(sy * 2 + sx)
    k2_flat = jnp.reshape(kernel_s2d, (192, oc))
    k4 = (
        jnp.zeros((9 * 48, 4, oc), kernel_s2d.dtype)
        .at[np.asarray(dst), np.asarray(phase)]
        .set(k2_flat[np.asarray(src)])
    )
    return k4.reshape(3, 3, 48, 4 * oc)


def fold_s4d_params(
    kernel_s2d_rgb: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    pixel_means: Tuple[float, float, float],
    pixel_stds: Tuple[float, float, float],
    pixel_scale: float,
    eps: float = 1e-5,
):
    """Fold the BGR flip / normalize / BatchNorm into s4d-stem constants.

    kernel_s2d_rgb: the model's (4, 4, 12, 64) s2d stem kernel (input
    channels in the RGB-flipped order s2d_stem_input produces).  Returns
    (k4, bn_a256, bn_b256, mean48, scale48) where k4 consumes raw BGR s4d
    frames and the BN affine is tiled across the four output phases.
    """
    # Flip each 3-channel group to BGR (its own inverse), then transform.
    perm = np.concatenate([np.arange(3)[::-1] + 3 * i for i in range(4)])
    k2_bgr = jnp.asarray(kernel_s2d_rgb)[:, :, perm, :]
    k4 = s2d_to_s4d_kernel(k2_bgr)

    a = bn_scale / jnp.sqrt(bn_var + eps)
    b = bn_bias - bn_mean * a
    bn_a256 = jnp.tile(a, 4).astype(jnp.float32)
    bn_b256 = jnp.tile(b, 4).astype(jnp.float32)

    mean3 = np.asarray(pixel_means, np.float32) * pixel_scale
    scale3 = (1.0 / np.asarray(pixel_stds, np.float32)) / pixel_scale
    mean48 = jnp.asarray(np.tile(mean3[::-1], 16))
    scale48 = jnp.asarray(np.tile(scale3[::-1], 16))
    return k4, bn_a256, bn_b256, mean48, scale48


def stem_s4d(
    x_s4d_u8: jnp.ndarray,
    k4: jnp.ndarray,
    bn_a256: jnp.ndarray,
    bn_b256: jnp.ndarray,
    mean48: jnp.ndarray,
    scale48: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H/4, W/4, 48) uint8 BGR s4d frames -> (B, H/4, W/4, 64) pooled.

    Equivalent to s2d_stem_input + ConvBN(64, 4x4, pad (2,1)) + ReLU +
    max_pool(3x3, s2, pad 1) with constants from `fold_s4d_params`.
    """
    xn = ((x_s4d_u8.astype(jnp.float32) - mean48) * scale48).astype(
        compute_dtype
    )
    # One conv per row phase (sy): identical math to a single 256-out conv
    # split on output channels, but the pool then consumes each phase
    # directly — profiled ~0.3 ms faster per R50 batch-8 step than slicing a
    # fused 256-channel output (XLA materializes the channel-slice copies).
    oc4 = k4.shape[-1]
    oc = oc4 // 4
    kd = k4.astype(compute_dtype)

    def phase_conv(lo, hi):
        y = jax.lax.conv_general_dilated(
            xn,
            kd[..., lo:hi],
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(
            y.astype(jnp.float32) * bn_a256[lo:hi] + bn_b256[lo:hi], 0.0
        )

    y0 = phase_conv(0, 2 * oc)  # phase sy=0 (both sx)
    y1 = phase_conv(2 * oc, 4 * oc)  # phase sy=1
    # Pool row p = max(conv[2p-1], conv[2p], conv[2p+1]) = max of phase
    # (p-1, 1), (p, 0), (p, 1); -1 sentinel == -inf for post-ReLU values.
    y1_up = jnp.pad(
        y1[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)), constant_values=-1.0
    )
    r = jnp.maximum(y1_up, jnp.maximum(y0, y1))  # (B, Hq, Wq, 2*oc)

    x0 = r[..., :oc]  # phase sx=0
    x1 = r[..., oc:]  # phase sx=1
    x1_left = jnp.pad(
        x1[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)), constant_values=-1.0
    )
    pooled = jnp.maximum(x1_left, jnp.maximum(x0, x1))
    return pooled.astype(out_dtype)

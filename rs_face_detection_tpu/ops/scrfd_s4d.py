"""Dense-front re-expression: SCRFD's two stem convs on the s4d grid.

Same disease, same cure as ops/mnet_s4d.py: SCRFD's front

    stem1 3x3/s2 dense (3->w)  + BN + relu     [H/2 x W/2 x w]
    stem2 3x3/s2 dense (w->w)  + BN + relu     [H/4 x W/4 x w]

reads a 3-channel image (XLA lane-pads the operand 42x) and runs w=32
channels at half resolution — both far below the 128 MXU lanes.  On the
host-side 4x4 space-to-depth layout (ops.image.s4d_layout_host,
(B, H/4, W/4, 48) uint8) the chain re-expresses EXACTLY (modulo float
order) as two dense convs on the H/4 grid:

    A: (2,2,48,4w)  pad (1,0)   stem1; output = 2x2 phase-packed stem1
                                (phase-major channel p*w + c)
    B: (2,2,4w,w)   pad (1,0)   stem2; the stride consumes the packing and
                                emits the NATURAL H/4 x W/4 x w tensor

With w=32 the intermediate is exactly 128 lanes.  Unlike the mnet front
there is no depthwise structure to embed — both kernels are genuinely
dense, so the only nominal-FLOP inflation is the s4d zero-tap padding of
kernel A (16/9, same as the R50 stem fold).

Derivation (shared with mnet_s4d): a source row r = 2m' + g (output
stride 2, torch pad 1 so g = u - 1 in {-1, 0, 1}) lands in packed block
m' + (g // 2) at phase g % 2 — taps span block offsets {-1, 0}, giving
2-tap kernels with pad (1, 0).  Kernel A additionally maps the 4x4 s4d
input phases through the same formula at stride 4 (reusing mnet_s4d's
_stem_kernel_s4d, which also folds the BGR->RGB channel flip).

Exactness is proven in tests/test_scrfd_s4d.py (f32 exact); wired into
serving via SCRFDDetection.make_batched_fn(stem="s4d") and
DetectionServer's layout auto-selection.

Reference lineage: the reference's eKYC config names `scrfd` but ships no
model (ekyc_pipeline/config.rs:10-17); this transform is TPU-first algebra
with no reference counterpart.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mnet_s4d import _conv, _bn_affine, _stem_kernel_s4d


class ScrfdS4DParams(NamedTuple):
    """Folded constants for the dense SCRFD front (fold_scrfd_s4d_params)."""

    mean48: jnp.ndarray  # (48,) normalize mean in s4d channel order
    scale48: jnp.ndarray  # (48,)
    k_a: jnp.ndarray  # (2, 2, 48, 4w) stem1, phase-packed output
    a_a: jnp.ndarray  # (4w,) BN scale, phase-tiled
    b_a: jnp.ndarray  # (4w,)
    k_b: jnp.ndarray  # (2, 2, 4w, w) stem2, consumes the packing
    a_b: jnp.ndarray  # (w,)
    b_b: jnp.ndarray  # (w,)


def _dense_kernel_packed_s2(w2: jnp.ndarray) -> jnp.ndarray:
    """Dense (3,3,Cin,Cout) stride-2 torch-pad-1 kernel -> packed (2,2,4Cin,Cout).

    Input channels are the 2x2 phase-packed layout (qi*2 + qj)*Cin + c;
    output is the natural half-grid.  Taps span packed block offsets
    {-1, 0} (pad (1, 0)); the (block, phase) pairs for g = u-1 in
    {-1, 0, 1} are (0,1), (1,0), (1,1) — distinct, so no tap collides.
    """
    assert w2.shape[:2] == (3, 3), w2.shape
    cin, cout = w2.shape[2], w2.shape[3]
    k = jnp.zeros((2, 2, 4 * cin, cout), w2.dtype)
    for u in range(3):
        gy = u - 1
        ka, qi = gy // 2 + 1, gy % 2
        for v in range(3):
            gx = v - 1
            kb, qj = gx // 2 + 1, gx % 2
            p = qi * 2 + qj
            k = k.at[ka, kb, p * cin : (p + 1) * cin, :].set(w2[u, v])
    return k


def fold_scrfd_s4d_params(
    variables, mean: float, scale: float, eps: float = 1e-5
) -> ScrfdS4DParams:
    """Fold stem1 + stem2 (+ the scalar normalize) into dense s4d constants.

    `variables` is the SCRFD variables tree; `mean`/`scale` are the eKYC
    detection config's scalar normalize constants (x - mean) * scale —
    identical per channel, so the BGR->RGB flip lives entirely in kernel
    A's channel permutation (mnet_s4d._stem_kernel_s4d).
    """
    p, s = variables["params"], variables["batch_stats"]

    def bn(mod):
        return _bn_affine(
            p[mod]["BatchNorm_0"]["scale"],
            p[mod]["BatchNorm_0"]["bias"],
            s[mod]["BatchNorm_0"]["mean"],
            s[mod]["BatchNorm_0"]["var"],
            eps,
        )

    k_a = _stem_kernel_s4d(p["stem1"]["Conv_0"]["kernel"].astype(jnp.float32))
    a1, b1 = bn("stem1")
    k_b = _dense_kernel_packed_s2(
        p["stem2"]["Conv_0"]["kernel"].astype(jnp.float32)
    )
    a2, b2 = bn("stem2")

    mean48 = jnp.full((48,), np.float32(mean))
    scale48 = jnp.full((48,), np.float32(scale))
    return ScrfdS4DParams(
        mean48,
        scale48,
        k_a,
        jnp.tile(a1, 4).astype(jnp.float32),
        jnp.tile(b1, 4).astype(jnp.float32),
        k_b,
        a2.astype(jnp.float32),
        b2.astype(jnp.float32),
    )


def scrfd_s4d_front(
    x_s4d_u8: jnp.ndarray,
    fp: ScrfdS4DParams,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H/4, W/4, 48) uint8 BGR s4d frames -> (B, H/4, W/4, w).

    Equivalent to normalize + stem1/BN/relu + stem2/BN/relu of SCRFD; the
    result feeds s3a (SCRFD's stem_precomputed entry point).
    """

    def bn_relu(y, a, b):
        y = y.astype(jnp.float32) * a + b
        return jnp.maximum(y, 0.0).astype(compute_dtype)

    xn = ((x_s4d_u8.astype(jnp.float32) - fp.mean48) * fp.scale48).astype(
        compute_dtype
    )
    y = _conv(xn, fp.k_a.astype(compute_dtype), ((1, 0), (1, 0)))
    y = bn_relu(y, fp.a_a, fp.b_a)
    y = _conv(y, fp.k_b.astype(compute_dtype), ((1, 0), (1, 0)))
    y = bn_relu(y, fp.a_b, fp.b_b)
    return y.astype(out_dtype)

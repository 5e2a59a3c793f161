"""Serving-precision helpers: pre-cast weights to the compute dtype.

flax modules here follow the f32-params / bf16-compute convention
(models/layers.py): every `apply` re-casts each conv/dense kernel from f32 to
bfloat16 inside the serving graph.  For R50 that is ~27M parameters — ~160 MB
of pure HBM convert traffic (~0.2 ms on v5e) paid on *every* batch.  Casting
the kernels once at load time makes the in-graph casts no-ops (flax's
promote_dtype sees the target dtype and passes through) without touching
numerics: the conv consumed bf16 weights either way.

BatchNorm / PReLU / bias leaves stay f32 — they are tiny, and BN's affine
math benefits from f32.  Training should NOT use this (optimizers want f32
master weights); it is a serving-path transform, applied by bench.py and the
serving registry paths.

The reference has no analog (weights lived behind Triton, SURVEY.md §2);
this is TPU-native serving hygiene.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_kernels(variables: Any, dtype=jnp.bfloat16) -> Any:
    """Return `variables` with every >=2D 'kernel' param cast to `dtype`.

    Matches nn.Conv / nn.Dense kernels (path leaf name "kernel", rank >= 2);
    leaves BatchNorm stats/affine, biases, PReLU alphas, and every non-params
    collection untouched.
    """

    def cast(path, leaf):
        name = path[-1].key if path else ""
        if name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return leaf.astype(dtype)
        return leaf

    out = dict(variables)
    if "params" in out:
        out["params"] = jax.tree_util.tree_map_with_path(cast, out["params"])
    return out

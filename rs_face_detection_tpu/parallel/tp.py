"""Tensor parallelism for the ViT eKYC graphs (Megatron-style sharding).

The reference has no tensor parallelism (its only scale-out was a gRPC hop
to Triton — SURVEY.md §2 parallelism table), and for the CNN detectors data
parallelism saturates ICI long before TP pays for itself.  The ViT-L/14
anti-spoofing graphs (/root/reference/src/pipeline/ekyc_pipeline/
config.rs:95-138) are the one model family here where TP is the right tool:
at 1024 width / 24 layers the parameters are ~300 MB and each image is a
257-token sequence, so sharding attention heads and MLP columns over a
"model" mesh axis cuts both per-chip weight memory and per-layer latency.

The design is idiomatic GSPMD, not hand-written collectives: we annotate
PARAMETER shardings with the classic Megatron pattern and let XLA propagate
activation shardings and insert the one all-reduce per block pair:

  - attention q/k/v projections: column-parallel over heads
    (kernel (W, H, D) -> P(None, "model", None)) — each chip computes its
    own heads end-to-end, no communication inside attention;
  - attention out-projection: row-parallel (kernel (H, D, W) ->
    P("model", None, None)) — contraction over the sharded head axis, XLA
    inserts a psum to rebuild the replicated residual stream;
  - MLP fc1: column-parallel (kernel (W, 4W) -> P(None, "model")), the
    GELU runs on the sharded hidden axis;
  - MLP fc2: row-parallel (kernel (4W, W) -> P("model", None)) + psum.

Everything else (layernorms, embeddings, patchify, heads) is replicated —
they are tiny, and keeping the residual stream replicated means the TP
program is numerically the single-device program up to reduction order.

Batch stays sharded over "data", so a ("data", "model") mesh serves
DP x TP simultaneously; collectives ride ICI.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def vit_tp_param_spec(path: tuple, shape: tuple, mesh: Mesh) -> P:
    """Megatron sharding rule for one ViT parameter.

    `path` is the flax param path as a tuple of names (e.g.
    ("params", "block3", "attn", "query", "kernel")).
    """
    if mesh.shape.get("model", 1) == 1:
        return P()
    names = [getattr(p, "key", str(p)) for p in path]
    if "attn" in names:
        leaf = names[-1]
        if any(n in ("query", "key", "value") for n in names):
            # kernel (W, H, D): shard heads; bias (H, D): shard heads.
            return P(None, "model", None) if leaf == "kernel" else P("model", None)
        if "out" in names:
            # kernel (H, D, W): contraction over sharded heads; bias replicated.
            return P("model", None, None) if leaf == "kernel" else P()
    if "fc1" in names:
        return P(None, "model") if names[-1] == "kernel" else P("model")
    if "fc2" in names:
        return P("model", None) if names[-1] == "kernel" else P()
    return P()


def vit_tp_shardings(variables: Any, mesh: Mesh):
    """NamedSharding pytree for a ViT variables tree under the TP rule."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, vit_tp_param_spec(path, np.shape(x), mesh)),
        variables,
    )


def check_tp_compatible(heads: int, hidden: int, mesh: Mesh) -> None:
    model = mesh.shape.get("model", 1)
    if heads % model:
        raise ValueError(
            f"{heads} attention heads not divisible by model axis {model}"
        )
    if hidden % model:
        raise ValueError(f"MLP hidden {hidden} not divisible by model axis {model}")


def make_tp_vit_fn(model, variables, mesh: Mesh, *, place_variables: bool = True):
    """Jit a ViT forward with DP batch + TP parameter shardings.

    Returns (fn, sharded_variables): `fn(variables, images)` is compiled with
    in_shardings matching the Megatron parameter layout and the batch sharded
    over "data"; outputs come back batch-sharded.  Pass the returned
    sharded_variables (device_put under the same shardings) so dispatch is
    transfer-free.  place_variables=False skips that device_put (returns
    None in its place) for callers that only trace/export the program and
    never run it — e.g. runtime/aot.export_tp_vit, where uploading the full
    weight tree through a tunneled device would be pure waste.

    The per-chip program: every block runs its heads/MLP columns locally and
    XLA inserts one all-reduce after `attn.out` and one after `fc2` — 2
    psums/block over ICI, the textbook Megatron schedule, derived entirely
    from the parameter annotations (no hand-written collectives).
    """
    from rs_face_detection_tpu.models.vit import _CONFIGS

    if getattr(model, "fused_attention", False):
        raise ValueError(
            "fused_attention=True cannot be tensor-parallelized: the Pallas "
            "flash-attention custom call is opaque to GSPMD, so the "
            "head-sharded q/k/v activations cannot be partitioned through "
            "it. Build the ViT with fused_attention=False for TP (XLA still "
            "fuses the attention math per shard)."
        )
    cfg = _CONFIGS[model.config]
    check_tp_compatible(cfg.heads, cfg.width * 4, mesh)

    param_shardings = vit_tp_shardings(variables, mesh)
    data = NamedSharding(mesh, P("data"))
    sharded_vars = (
        jax.device_put(variables, param_shardings) if place_variables else None
    )

    @functools.partial(
        jax.jit,
        in_shardings=(param_shardings, data),
        out_shardings=data,
    )
    def fwd(variables, images):
        return model.apply(variables, images, train=False)

    return fwd, sharded_vars

"""Vision Transformer for the CLIP-style eKYC anti-spoofing heads.

The reference's eKYC config names `face_anti_spoofing_crop_l14` and
`face_anti_spoofing_fi_l14` — CLIP ViT-L/14 @ 224 with ImageNet
normalization (/root/reference/src/pipeline/ekyc_pipeline/config.rs:95-138).
This is the TPU-native ViT powering them: patchify conv, pre-LN transformer
blocks, CLS token, classification head.  Attention and MLP are pure einsum/
matmul — exactly the shapes XLA maps onto the MXU; bf16 compute, f32
params/softmax.

The `clip_*` configs reproduce the OpenAI CLIP visual-encoder structure
(ln_pre after the embeddings, QuickGELU MLPs, ln_post on the class token
followed by the embedding projection) so a public CLIP state_dict loads
structurally via models/clip_import.py; the plain `vit_*` configs are the
lighter test/deployment variants.  LayerNorm epsilon follows torch (1e-5)
so imported weights reproduce torch outputs.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


#: Experiment knob for tools/ab_vit.py: None = stock 128-tile block sizes,
#: "single" = one q/k block spanning the whole padded sequence.
FLASH_BLOCK_OVERRIDE = None


def _flash_attention_fn(query, key, value, bias=None, mask=None, **_kwargs):
    """flax attention_fn backed by the Pallas TPU flash-attention kernel.

    Inference-only drop-in for flax's dot_product_attention on TPU: the
    (B, heads, N, N) score/probability tensors never touch HBM — QK^T,
    the online softmax, and PV run in one VMEM-resident kernel.  At
    ViT-L/14 b8 the unfused path materializes 34 MB of f32 scores per
    layer three times over; that HBM traffic is what this removes.

    The sequence is zero-padded to the 128-lane grid; SegmentIds mask the
    pad keys (pad rows' outputs are sliced off).  q/k/v arrive flax-shaped
    (B, N, heads, head_dim) and unscaled — sm_scale applies the 1/sqrt(d)
    the standard path folds into the scores.

    MEASURED NEGATIVE at ViT-L/14 N=257 (tools/ab_vit.py, v5e,
    2026-08-19): XLA 634.7 img/s b8 (12.60 ms, MFU 0.52) vs this kernel
    at 331.3 (stock 128-tiles) and 509.9 (whole-sequence 384 block).
    At this scale the per-layer score tensor is small enough that XLA's
    fused softmax chain stays MXU-bound, while the kernel pays the
    257->384 pad (+49% K/V work) plus per-grid-step overhead.  Kept
    opt-in for genuinely long sequences; do not enable for CLIP FAS
    serving without re-measuring.
    """
    assert bias is None and mask is None, "ViT attention is dense"
    assert not _kwargs.get("dropout_rate"), (
        "fused_attention is inference-only: the Pallas kernel has no "
        "attention dropout"
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = query.shape
    pad = (-n) % 128
    np_ = n + pad

    def prep(t):
        t = jnp.transpose(t, (0, 2, 1, 3))  # (B, H, N, D)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))

    if FLASH_BLOCK_OVERRIDE == "single":
        # Whole padded sequence as one q/k block: at ViT scale (N=384) the
        # stock 128-tiles launch b*h*(N/128)^2 grid steps per layer whose
        # per-step work is far too small to hide the grid overhead.
        block_sizes = BlockSizes(
            block_q=np_, block_k_major=np_, block_k=np_, block_b=1
        )
    else:
        block_sizes = BlockSizes.get_default(b, h, np_, np_, d)

    seg = jnp.pad(jnp.ones((b, n), jnp.int32), ((0, 0), (0, pad)))
    out = flash_attention(
        prep(query),
        prep(key),
        prep(value),
        segment_ids=SegmentIds(seg, seg),
        sm_scale=1.0 / math.sqrt(d),
        block_sizes=block_sizes,
    )
    return jnp.transpose(out[:, :, :n, :], (0, 2, 1, 3))


class ViTConfig(NamedTuple):
    patch: int
    width: int
    depth: int
    heads: int
    # CLIP-structure options (OpenAI visual tower):
    pre_ln: bool = False  # ln_pre after cls+pos embedding
    quick_gelu: bool = False  # x * sigmoid(1.702 x) instead of exact GELU
    proj_dim: int = 0  # embedding projection after ln_post (0 = none)


_CONFIGS = {
    "vit_tiny_test": ViTConfig(16, 64, 2, 2),
    "vit_b16": ViTConfig(16, 768, 12, 12),
    "vit_l14": ViTConfig(14, 1024, 24, 16),
    # OpenAI CLIP visual encoders (proj_dim = shared embedding width).
    "clip_tiny_test": ViTConfig(16, 64, 2, 2, pre_ln=True, quick_gelu=True,
                                proj_dim=32),
    "clip_b16": ViTConfig(16, 768, 12, 12, pre_ln=True, quick_gelu=True,
                          proj_dim=512),
    "clip_l14": ViTConfig(14, 1024, 24, 16, pre_ln=True, quick_gelu=True,
                          proj_dim=768),
}


def _gelu(x: jnp.ndarray, quick: bool) -> jnp.ndarray:
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    # exact erf GELU (torch nn.GELU default) — flax's default is the tanh
    # approximation, which would silently mismatch a future torch import
    return nn.gelu(x, approximate=False)


class _Block(nn.Module):
    width: int
    heads: int
    quick_gelu: bool = False
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln1"
        )(x)
        attn_kwargs = (
            {"attention_fn": _flash_attention_fn} if self.fused_attention else {}
        )
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
            **attn_kwargs,
        )(y, y)
        x = x + y
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln2"
        )(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = _gelu(y, self.quick_gelu)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """Patchify -> CLS + pos embed [-> ln_pre] -> transformer -> head."""

    config: str = "vit_l14"
    num_classes: int = 2
    softmax: bool = True
    dtype: Any = jnp.float32
    #: TPU-only serving option: Pallas flash-attention kernel instead of the
    #: materialized-scores path (same params, same math; _flash_attention_fn).
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = _CONFIGS[self.config]
        patch, width = cfg.patch, cfg.width
        b, h, w, _ = x.shape
        x = nn.Conv(
            width,
            (patch, patch),
            strides=(patch, patch),
            padding="VALID",
            use_bias=not cfg.pre_ln,  # CLIP's conv1 has no bias
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patchify",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, width)  # (B, N, W)

        cls = self.param(
            "cls", nn.initializers.normal(0.02), (1, 1, width), jnp.float32
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, x.shape[1], width),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        if cfg.pre_ln:
            x = nn.LayerNorm(
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="ln_pre",
            )(x.astype(jnp.float32)).astype(self.dtype)

        for i in range(cfg.depth):
            x = _Block(
                width,
                cfg.heads,
                quick_gelu=cfg.quick_gelu,
                dtype=self.dtype,
                fused_attention=self.fused_attention,
                name=f"block{i}",
            )(x)

        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_final"
        )(x[:, 0].astype(jnp.float32))
        if cfg.proj_dim:
            # CLIP embedding projection (visual.proj, no bias).
            x = nn.Dense(
                cfg.proj_dim, use_bias=False, param_dtype=jnp.float32, name="proj"
            )(x)
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32, name="head")(x)
        return jax.nn.softmax(logits, axis=-1) if self.softmax else logits


def init_vit(
    config: str = "vit_l14",
    num_classes: int = 2,
    image_size: Sequence[int] = (224, 224),
    dtype: Any = jnp.float32,
    seed: int = 0,
    fused_attention: bool = False,
):
    model = ViT(
        config=config,
        num_classes=num_classes,
        dtype=dtype,
        fused_attention=fused_attention,
    )
    w, h = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables

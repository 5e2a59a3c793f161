"""Vision Transformer for the CLIP-style eKYC anti-spoofing heads.

The reference's eKYC config names `face_anti_spoofing_crop_l14` and
`face_anti_spoofing_fi_l14` — CLIP ViT-L/14 @ 224 with ImageNet
normalization (/root/reference/src/pipeline/ekyc_pipeline/config.rs:95-138).
This is the TPU-native ViT powering them: patchify conv, pre-LN transformer
blocks, CLS token, classification head.  Attention and MLP are pure einsum/
matmul — exactly the shapes XLA maps onto the MXU; bf16 compute, f32
params/softmax.

`vit_l14` builds the full-size config; smaller named configs exist for tests
and lighter deployments.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_CONFIGS = {
    # name: (patch, width, depth, heads)
    "vit_tiny_test": (16, 64, 2, 2),
    "vit_b16": (16, 768, 12, 12),
    "vit_l14": (14, 1024, 24, 16),
}


class _Block(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="ln2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """Patchify -> CLS + pos embed -> transformer -> head probabilities."""

    config: str = "vit_l14"
    num_classes: int = 2
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        patch, width, depth, heads = _CONFIGS[self.config]
        b, h, w, _ = x.shape
        x = nn.Conv(
            width,
            (patch, patch),
            strides=(patch, patch),
            padding="VALID",
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

        for i in range(depth):
            x = _Block(width, heads, dtype=self.dtype, name=f"block{i}")(x)

        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="ln_final")(
            x[:, 0].astype(jnp.float32)
        )
        logits = nn.Dense(self.num_classes, param_dtype=jnp.float32, name="head")(x)
        return jax.nn.softmax(logits, axis=-1) if self.softmax else logits


def init_vit(
    config: str = "vit_l14",
    num_classes: int = 2,
    image_size: Sequence[int] = (224, 224),
    dtype: Any = jnp.float32,
    seed: int = 0,
):
    model = ViT(config=config, num_classes=num_classes, dtype=dtype)
    w, h = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables

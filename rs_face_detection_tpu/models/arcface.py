"""ArcFace-style embedding network (IResNet) — the `face_identification` model.

In-process replacement for the reference's remote embedding model
(face_extraction.rs:79-165): consumes aligned 112x112 RGB crops normalized
with (px - 127.5) * 0.0078125 and emits a 512-d feature row per face.

Architecture: improved ResNet (IResNet) exactly as insightface's
arcface_torch `iresnet.py` defines it — BN -> 3x3 conv -> BN -> per-channel
PReLU -> strided 3x3 conv -> BN residual blocks (torch-symmetric padding),
stages [3, 4, 14, 3] for iresnet50, tail BN -> flatten -> FC(512) -> affine
BatchNorm1d.  Public insightface state_dicts load structurally via
models.checkpoint_maps.iresnet_map (torch NCHW flatten order handled by the
"dense_nchw" import kind).

L2 normalization happens in the pipeline (per-row; see utils.rs:148-154 — the
reference normalizes each (1, 512) batch by its Frobenius norm, identical to
per-row at its batch_size=1 default).
"""

from __future__ import annotations

import functools

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PReLUChannel

_STAGES = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
}


class _IBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dt,
            param_dtype=jnp.float32,
            name=name,
        )
        conv = lambda f, s, name: nn.Conv(  # noqa: E731
            f,
            (3, 3),
            strides=(s, s),
            padding=((1, 1), (1, 1)),  # torch pad=1 (differs from SAME at s=2)
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name=name,
        )

        y = bn("bn1")(x)
        y = conv(self.features, 1, "conv1")(y)
        y = bn("bn2")(y)
        y = PReLUChannel(name="prelu")(y)
        y = conv(self.features, self.strides, "conv2")(y)
        y = bn("bn3")(y)

        shortcut = x
        if x.shape[-1] != self.features or self.strides != 1:
            shortcut = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=dt,
                param_dtype=jnp.float32,
                name="down_conv",
            )(x)
            shortcut = bn("down_bn")(shortcut)
        return y + shortcut


class IResNet(nn.Module):
    """IResNet trunk + 512-d embedding head for 112x112 inputs."""

    depth: str = "iresnet50"
    embedding_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stages = _STAGES[self.depth]
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(
            64,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=dt,
            param_dtype=jnp.float32,
            name="stem",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dt,
            param_dtype=jnp.float32,
            name="stem_bn",
        )(x)
        x = PReLUChannel(name="stem_prelu")(x)

        for stage, (blocks, width) in enumerate(zip(stages, (64, 128, 256, 512))):
            for block in range(blocks):
                x = _IBlock(
                    width,
                    strides=2 if block == 0 else 1,
                    dtype=dt,
                    name=f"s{stage}b{block}",
                )(x, train)

        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dt,
            param_dtype=jnp.float32,
            name="tail_bn",
        )(x)
        # NHWC flatten; torch checkpoints flatten NCHW — the import kind
        # "dense_nchw" permutes fc.weight's input dim to compensate.
        x = x.astype(jnp.float32).reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_dim, param_dtype=jnp.float32, name="fc")(x)
        # insightface `features`: affine BatchNorm1d (weight frozen at 1.0 in
        # training but present in every public state_dict).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            param_dtype=jnp.float32,
            name="feat_bn",
        )(x)
        return x


def init_arcface(
    depth: str = "iresnet50",
    embedding_dim: int = 512,
    image_size: Sequence[int] = (112, 112),
    dtype: Any = jnp.float32,
    seed: int = 0,
):
    model = IResNet(depth=depth, embedding_dim=embedding_dim, dtype=dtype)
    width, height = image_size
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables

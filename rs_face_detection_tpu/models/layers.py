"""Shared flax building blocks: conv-bn-act, FPN, SSH context module.

The reference never defines these networks — they lived behind Triton
(SURVEY.md §0); the architecture here follows the RetinaFace paper
(PAPERS.md: arxiv 1905.00641) re-expressed TPU-first: NHWC layouts, bfloat16
compute with float32 params/accumulation, channel counts kept MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def leaky_relu(negative_slope: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def act(x: jnp.ndarray) -> jnp.ndarray:
        return nn.leaky_relu(x, negative_slope=negative_slope)

    return act


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel k = (bi*b + bj)*C + c.

    The standard TPU stem transform: a stride-b conv on few channels becomes
    a stride-1 conv on b*b*C channels, filling MXU lanes instead of wasting
    125 of 128 on a 3-channel input.
    """
    b, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (x.shape, block)
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional activation (NHWC)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Callable[[jnp.ndarray], jnp.ndarray] | None = nn.relu
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseSeparable(nn.Module):
    """MobileNetV1 depthwise-separable conv block."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    negative_slope: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        act = leaky_relu(self.negative_slope)
        x = ConvBN(
            in_ch,
            (3, 3),
            self.strides,
            groups=in_ch,
            act=act,
            dtype=self.dtype,
            name="dw",
        )(x, train)
        x = ConvBN(
            self.features, (1, 1), (1, 1), act=act, dtype=self.dtype, name="pw"
        )(x, train)
        return x


class FPN(nn.Module):
    """3-level feature pyramid: lateral 1x1 + top-down upsample + merge 3x3."""

    out_channels: int
    negative_slope: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Sequence[jnp.ndarray]:
        """feats: [C3, C4, C5] (strides 8, 16, 32) -> [P3, P4, P5]."""
        act = leaky_relu(self.negative_slope) if self.negative_slope > 0 else nn.relu
        laterals = [
            ConvBN(
                self.out_channels,
                (1, 1),
                act=act,
                dtype=self.dtype,
                name=f"lateral{i}",
            )(f, train)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]  # P5
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(outs[0], laterals[i].shape)
            merged = laterals[i] + up
            merged = ConvBN(
                self.out_channels,
                (3, 3),
                act=act,
                dtype=self.dtype,
                name=f"merge{i}",
            )(merged, train)
            outs.insert(0, merged)
        return outs  # [P3, P4, P5]


def _upsample_nearest_2x(x: jnp.ndarray, target_shape) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample cropped to the lateral's spatial shape."""
    b, h, w, c = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up[:, : target_shape[1], : target_shape[2], :]


class SSH(nn.Module):
    """SSH context module: parallel 3x3 / 5x5 / 7x7 receptive-field branches.

    RetinaFace paper §3 context modelling: the 5x5 and 7x7 paths are stacked
    3x3 convs; outputs concat to `out_channels` then ReLU.
    """

    out_channels: int
    negative_slope: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.out_channels % 4 == 0
        act = leaky_relu(self.negative_slope) if self.negative_slope > 0 else nn.relu
        half = self.out_channels // 2
        quarter = self.out_channels // 4

        conv3 = ConvBN(half, (3, 3), act=None, dtype=self.dtype, name="conv3")(
            x, train
        )
        conv5_1 = ConvBN(
            quarter, (3, 3), act=act, dtype=self.dtype, name="conv5_1"
        )(x, train)
        conv5 = ConvBN(
            quarter, (3, 3), act=None, dtype=self.dtype, name="conv5_2"
        )(conv5_1, train)
        conv7_1 = ConvBN(
            quarter, (3, 3), act=act, dtype=self.dtype, name="conv7_1"
        )(conv5_1, train)
        conv7 = ConvBN(
            quarter, (3, 3), act=None, dtype=self.dtype, name="conv7_2"
        )(conv7_1, train)

        out = jnp.concatenate([conv3, conv5, conv7], axis=-1)
        return nn.relu(out)

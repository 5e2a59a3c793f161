"""MobileNetV1-0.25 backbone for RetinaFace (the reference's light detector).

Standard MobileNetV1 ladder at width multiplier 0.25, returning the three
feature maps the FPN consumes: C3 (stride 8, 64ch), C4 (stride 16, 128ch),
C5 (stride 32, 256ch).  NHWC, bf16-friendly.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, DepthwiseSeparable, leaky_relu


class MobileNetV1_025(nn.Module):
    """Width-0.25 MobileNetV1 trunk emitting (C3, C4, C5)."""

    dtype: Any = jnp.float32
    negative_slope: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        act = leaky_relu(self.negative_slope)
        dt = self.dtype

        # Stage 1 -> stride 8, 64 channels.
        x = ConvBN(8, (3, 3), (2, 2), act=act, dtype=dt, name="conv1")(x, train)
        x = DepthwiseSeparable(16, (1, 1), dtype=dt, name="ds1")(x, train)
        x = DepthwiseSeparable(32, (2, 2), dtype=dt, name="ds2")(x, train)
        x = DepthwiseSeparable(32, (1, 1), dtype=dt, name="ds3")(x, train)
        x = DepthwiseSeparable(64, (2, 2), dtype=dt, name="ds4")(x, train)
        x = DepthwiseSeparable(64, (1, 1), dtype=dt, name="ds5")(x, train)
        c3 = x

        # Stage 2 -> stride 16, 128 channels.
        x = DepthwiseSeparable(128, (2, 2), dtype=dt, name="ds6")(x, train)
        for i in range(5):
            x = DepthwiseSeparable(128, (1, 1), dtype=dt, name=f"ds{7 + i}")(
                x, train
            )
        c4 = x

        # Stage 3 -> stride 32, 256 channels.
        x = DepthwiseSeparable(256, (2, 2), dtype=dt, name="ds12")(x, train)
        x = DepthwiseSeparable(256, (1, 1), dtype=dt, name="ds13")(x, train)
        c5 = x

        return c3, c4, c5

"""MobileNetV1-0.25 backbone for RetinaFace (the reference's light detector).

Standard MobileNetV1 ladder at width multiplier 0.25, returning the three
feature maps the FPN consumes: C3 (stride 8, 64ch), C4 (stride 16, 128ch),
C5 (stride 32, 256ch).  NHWC, bf16-friendly.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, DepthwiseSeparable, leaky_relu, space_to_depth


class MobileNetV1_025(nn.Module):
    """Width-0.25 MobileNetV1 trunk emitting (C3, C4, C5).

    stem_space_to_depth replaces the 3-channel 3x3/s2 stem with the
    exactly-equivalent 2x2/s1 conv on the 2x2 space-to-depth input
    (12 channels); imported 3x3 weights convert via
    models.import_weights.stem_to_s2d.  Default False: profiled on v5e, the
    mnet stem is also OUTPUT-channel-starved (8 of 128 lanes), so the s2d
    layout copies cost more than the conv saves (unlike the 64-out ResNet
    stem, where s2d is a net win and defaults on).
    """

    dtype: Any = jnp.float32
    negative_slope: float = 0.1
    stem_space_to_depth: bool = False
    quant: bool = False
    #: training option: rematerialize each depthwise-separable block on the
    #: backward pass (jax.checkpoint via nn.remat) — recompute instead of
    #: save activations.  Applies to the standard path only (the serving
    #: front_precomputed fast paths never train).  Same params, same math.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        front_precomputed: Any = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        act = leaky_relu(self.negative_slope)
        dt = self.dtype

        if front_precomputed:
            # front_precomputed=True: x is the ds2.dw output (B, H/4, W/4,
            # 16) from the dense s4d front (ops/mnet_s4d.py); resume at
            # ds2.pw.  front_precomputed="ds4.pw": x is the ds4.dw output
            # (B, H/8, W/8, 32) from front + packed mid (mnet_s4d_mid);
            # resume at ds4.pw.
            if front_precomputed == "ds4.pw":
                x = DepthwiseSeparable(
                    64, (2, 2), dtype=dt, quant=self.quant, name="ds4"
                )(x.astype(dt), train, skip_dw=True)
            else:
                x = DepthwiseSeparable(
                    32, (2, 2), dtype=dt, quant=self.quant, name="ds2"
                )(x.astype(dt), train, skip_dw=True)
                x = DepthwiseSeparable(32, (1, 1), dtype=dt, quant=self.quant, name="ds3")(x, train)
                x = DepthwiseSeparable(64, (2, 2), dtype=dt, quant=self.quant, name="ds4")(x, train)
            x = DepthwiseSeparable(64, (1, 1), dtype=dt, quant=self.quant, name="ds5")(x, train)
            c3 = x
            x = DepthwiseSeparable(128, (2, 2), dtype=dt, quant=self.quant, name="ds6")(x, train)
            for i in range(5):
                x = DepthwiseSeparable(
                    128, (1, 1), dtype=dt, quant=self.quant, name=f"ds{7 + i}"
                )(x, train)
            c4 = x
            x = DepthwiseSeparable(256, (2, 2), dtype=dt, quant=self.quant, name="ds12")(x, train)
            x = DepthwiseSeparable(256, (1, 1), dtype=dt, quant=self.quant, name="ds13")(x, train)
            return c3, c4, x

        # static_argnums=(2,): `train` drives Python control flow (BN).
        DS = (
            nn.remat(DepthwiseSeparable, static_argnums=(2,))
            if self.remat
            else DepthwiseSeparable
        )

        # Stage 1 -> stride 8, 64 channels.

        if self.stem_space_to_depth:
            if x.shape[-1] == 3:
                b0, h0, w0, _ = x.shape
                if h0 % 2 or w0 % 2:
                    # Odd dims: append a HIGH-side zero to reach even size —
                    # it falls inside the torch conv's right-pad region, so
                    # the s2d conv stays exactly equal to the classic stem
                    # (see test_s2d_stem_odd_inputs).
                    x = jnp.pad(x, ((0, 0), (0, h0 % 2), (0, w0 % 2), (0, 0)))
                x = space_to_depth(x, 2)
            # else: 12 channels — input arrived pre-transformed via
            # ops.image.s2d_stem_input (uint8-domain fused preprocess).
            # Exactly equivalent to conv 3x3/s2 pad 1 (torch convention):
            # 2x2 kernel, block-space pad (1, 0) (import_weights.stem_to_s2d).
            x = ConvBN(
                8,
                (2, 2),
                (1, 1),
                act=act,
                padding=((1, 0), (1, 0)),
                dtype=dt,
                quant=self.quant,
                name="conv1",
            )(x, train)
        else:
            x = ConvBN(
                8, (3, 3), (2, 2), act=act, dtype=dt, quant=self.quant, name="conv1"
            )(x, train)
        x = DS(16, (1, 1), dtype=dt, quant=self.quant, name="ds1")(x, train)
        x = DS(32, (2, 2), dtype=dt, quant=self.quant, name="ds2")(x, train)
        x = DS(32, (1, 1), dtype=dt, quant=self.quant, name="ds3")(x, train)
        x = DS(64, (2, 2), dtype=dt, quant=self.quant, name="ds4")(x, train)
        x = DS(64, (1, 1), dtype=dt, quant=self.quant, name="ds5")(x, train)
        c3 = x

        # Stage 2 -> stride 16, 128 channels.
        x = DS(128, (2, 2), dtype=dt, quant=self.quant, name="ds6")(x, train)
        for i in range(5):
            x = DS(128, (1, 1), dtype=dt, quant=self.quant, name=f"ds{7 + i}")(
                x, train
            )
        c4 = x

        # Stage 3 -> stride 32, 256 channels.
        x = DS(256, (2, 2), dtype=dt, quant=self.quant, name="ds12")(x, train)
        x = DS(256, (1, 1), dtype=dt, quant=self.quant, name="ds13")(x, train)
        c5 = x

        return c3, c4, c5

"""ResNet-50 backbone for the RetinaFace-R50 flagship configuration.

Standard bottleneck ResNet in NHWC emitting (C3, C4, C5) = strides (8, 16, 32)
with (512, 1024, 2048) channels — the heavy detector variant named in
BASELINE.json config 2.  bf16 compute / f32 params; channel counts are
multiples of 128 so every conv tiles cleanly onto the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, space_to_depth


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    quant: bool = False
    #: re-express the stage-boundary 3x3/s2 conv as a dense 2x2/s1 conv on a
    #: space-to-depth layout (layers.S2DStride2Conv) and the 1x1/s2 proj as
    #: subsample + 1x1/s1 — exact, strided-access-free, MXU-shaped.
    s2d_boundary: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out_ch = self.features * 4
        q = self.quant
        strided = self.strides == (2, 2)
        s2d = self.s2d_boundary and strided and not q
        y = ConvBN(
            self.features, (1, 1), act=nn.relu, dtype=self.dtype, quant=q, name="c1"
        )(x, train)
        y = ConvBN(
            self.features,
            (3, 3),
            self.strides,
            act=nn.relu,
            dtype=self.dtype,
            quant=q,
            s2d_stride2=s2d,
            name="c2",
        )(y, train)
        y = ConvBN(out_ch, (1, 1), act=None, dtype=self.dtype, quant=q, name="c3")(
            y, train
        )
        if residual.shape != y.shape:
            # A 1x1/s2 conv reads only the even grid: subsampling first is
            # exactly equivalent and keeps the conv itself stride-1.
            proj_in = x[:, ::2, ::2, :] if s2d else x
            residual = ConvBN(
                out_ch,
                (1, 1),
                (1, 1) if s2d else self.strides,
                act=None,
                dtype=self.dtype,
                quant=q,
                name="proj",
            )(proj_in, train)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet-50 trunk emitting (C3, C4, C5).

    stem_space_to_depth (default True) replaces the MXU-hostile 7x7/s2 conv
    on 3 channels with an exactly-equivalent 4x4/s1 conv on the 2x2
    space-to-depth input (12 channels): same receptive field and output, ~4x
    better MXU lane utilization.  Imported 7x7 weights convert exactly via
    models.import_weights.stem7x7_to_s2d.

    All strided convs and the maxpool use torch padding semantics (symmetric
    k//2 — layers.torch_padding), so torchvision-layout checkpoints
    (e.g. biubug6 RetinaFace-R50, models.checkpoint_maps) bit-match.
    """

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stem_space_to_depth: bool = True
    quant: bool = False
    #: dense re-expression of the three stage-boundary stride-2 convs
    #: (see Bottleneck.s2d_boundary) — param-layout-identical opt-in.
    s2d_boundary: bool = False
    #: training option: rematerialize each bottleneck block on the backward
    #: pass (jax.checkpoint via nn.remat) — activations are recomputed
    #: instead of saved, trading ~1 extra forward of FLOPs for O(depth)
    #: less activation HBM.  Same params, same math.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        stem_precomputed: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        if stem_precomputed:
            # x is the post-stem, post-maxpool (B, H/4, W/4, 64) activation —
            # the fused Pallas stem (ops/stem_pallas.fused_stem_s2d) computed
            # conv+BN+ReLU+pool out-of-module; skip straight to stage 0.
            pass
        elif self.stem_space_to_depth:
            if x.shape[-1] == 3:
                b0, h0, w0, _ = x.shape
                if h0 % 2 or w0 % 2:
                    # Odd dims: append a HIGH-side zero to reach even size.
                    # The extra column falls inside the torch conv's own
                    # right-pad region, so the s2d conv stays exactly equal
                    # to the classic stem (see test_s2d_stem_odd_inputs).
                    x = jnp.pad(x, ((0, 0), (0, h0 % 2), (0, w0 % 2), (0, 0)))
                x = space_to_depth(x, 2)
            # else: 12 channels — input arrived pre-transformed via
            # ops.image.s2d_stem_input (uint8-domain fused preprocess).
            # Exactly equivalent to conv 7x7/s2 pad 3 (torch convention):
            # tap u lands at block floor((u-3)/2)+2, phase (u-3) mod 2 ->
            # 4x4 kernel, block-space pad (2, 1) (import_weights.stem_to_s2d).
            x = ConvBN(
                64,
                (4, 4),
                (1, 1),
                act=nn.relu,
                padding=((2, 1), (2, 1)),
                dtype=dt,
                quant=self.quant,
                name="stem",
            )(x, train)
        else:
            x = ConvBN(
                64, (7, 7), (2, 2), act=nn.relu, dtype=dt, quant=self.quant, name="stem"
            )(x, train)
        if not stem_precomputed:
            # Torch MaxPool2d(3, stride=2, padding=1) semantics: explicit
            # (1, 1) pads (flax pads max_pool with -inf, matching torch).
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        feats = []
        # static_argnums=(2,): `train` drives Python control flow (BN mode).
        Block = (
            nn.remat(Bottleneck, static_argnums=(2,))
            if self.remat
            else Bottleneck
        )
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(blocks):
                strides = (2, 2) if block == 0 and stage > 0 else (1, 1)
                x = Block(
                    width,
                    strides,
                    dtype=dt,
                    quant=self.quant,
                    s2d_boundary=self.s2d_boundary,
                    name=f"s{stage}b{block}",
                )(x, train)
            feats.append(x)
        # feats strides: [4, 8, 16, 32] -> return C3..C5.
        return feats[1], feats[2], feats[3]

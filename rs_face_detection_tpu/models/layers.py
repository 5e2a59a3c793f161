"""Shared flax building blocks: conv-bn-act, FPN, SSH context module.

The reference never defines these networks — they lived behind Triton
(SURVEY.md §0); the architecture here follows the RetinaFace paper
(PAPERS.md: arxiv 1905.00641) re-expressed TPU-first: NHWC layouts, bfloat16
compute with float32 params/accumulation, channel counts kept MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def leaky_relu(negative_slope: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def act(x: jnp.ndarray) -> jnp.ndarray:
        return nn.leaky_relu(x, negative_slope=negative_slope)

    return act


class PReLUChannel(nn.Module):
    """Per-channel PReLU: y = max(x, 0) + alpha[c] * min(x, 0).

    Matches torch nn.PReLU(num_parameters=C) — one learnable slope per
    channel (last axis), init 0.25 — which is what insightface's iresnet
    uses throughout; flax's nn.PReLU has a single scalar slope and cannot
    structurally accept those checkpoints.
    """

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda _, shape: jnp.full(shape, self.init_value, jnp.float32),
            (x.shape[-1],),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


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


class Int8Conv(nn.Module):
    """int8 x int8 -> int32 conv on the MXU (v5e: 2x the bf16 peak).

    Weights are per-output-channel symmetric int8 (`kernel_q` x
    `kernel_scale`, see ops.quantize.quantize_array); activations quantize
    per-tensor against a *static* calibrated absolute maximum (`amax`), so
    serving pays no extra reductions — the quantize op is one elementwise
    pass that XLA fuses into the producer.  With calibrate=True the conv
    instead runs in float on the dequantized weights (the calibration
    forward used to record `amax` ranges).

    The reference has no low-precision story (fp32 over the wire to Triton
    throughout — SURVEY.md §2); this is the TPU-native serving fast path.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, amax: jnp.ndarray, calibrate: bool = False
    ) -> jnp.ndarray:
        kh, kw = self.kernel
        kq = self.param(
            "kernel_q",
            nn.initializers.zeros,
            (kh, kw, x.shape[-1], self.features),
            jnp.int8,
        )
        ks = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        dims = ("NHWC", "HWIO", "NHWC")
        if calibrate:
            w = kq.astype(self.dtype) * ks.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w,
                self.strides,
                self.padding,
                dimension_numbers=dims,
            )
        sx = jnp.maximum(amax, jnp.float32(1e-8)) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            kq,
            self.strides,
            self.padding,
            dimension_numbers=dims,
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (sx * ks)).astype(self.dtype)


class S2DStride2Conv(nn.Module):
    """3x3/s2 conv re-expressed as a dense 2x2/s1 conv on a 2x2 s2d layout.

    TPU stride-2 convs profile ~3.4x off peak (Mosaic/XLA lack an efficient
    strided-window access path), while stride-1 convs run near peak.  The
    identity: output (i, j) of a 3x3/s2 pad-1 conv reads input rows
    2i-1..2i+1 = s2d block rows {i-1 (phase 1), i (phase 0 and 1)}, so on
    the (H/2, W/2, 4C) space-to-depth layout the same map is a 2x2/s1 conv
    with block-space pad (1, 0): tap (by, qy) covers dy = 2*(by-1) + qy + 1,
    with the (by=0, qy=0) slot zero.  9 of 16 tap-slots carry the original
    taps (16/9 nominal FLOP inflation), but the conv becomes MXU-shaped —
    the same algebra that won for the stem (ops/stem_s4d.py).

    The parameter stays in the original (3, 3, C, F) layout under the same
    "kernel" name, so checkpoints trained or imported for the plain conv
    load unchanged; the kernel transform is a tiny in-graph scatter.
    f32 mode is exact vs the strided conv (zero-embedded taps contribute
    exact zeros).  Opt-in via ResNet50(s2d_boundary=True).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (
            "s2d stride-2 path needs even spatial dims",
            x.shape,
        )
        k3 = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, c, self.features),
            jnp.float32,
        )
        # (by, qy) -> dy tap index (dy+1), the (0, 0) slot stays zero.
        taps = [(0, 1, 0), (1, 0, 1), (1, 1, 2)]
        k2 = jnp.zeros((2, 2, 4 * c, self.features), jnp.float32)
        for by, qy, ty in taps:
            for bx, qx, tx in taps:
                g = qy * 2 + qx
                k2 = k2.at[by, bx, g * c : (g + 1) * c, :].set(k3[ty, tx])
        xs = space_to_depth(x, 2)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype),
            k2.astype(self.dtype),
            (1, 1),
            ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def torch_padding(kernel: Tuple[int, int]):
    """Symmetric k//2 padding — the torch Conv2d `padding=k//2` convention.

    Identical to XLA SAME for stride 1 (odd kernels), but NOT for stride 2,
    where SAME derives asymmetric (0,1)/(2,3) pads.  Public checkpoints
    (torchvision, biubug6 RetinaFace, insightface iresnet) are trained with
    the symmetric convention, so it is the default everywhere here — without
    it, imported weights could never bit-match at image edges.
    """
    kh, kw = kernel
    assert kh % 2 == 1 and kw % 2 == 1, kernel
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional activation (NHWC).

    The default padding "TORCH" resolves to symmetric k//2 padding (see
    `torch_padding`) — equal to SAME at stride 1, torch-checkpoint-exact at
    stride 2.

    quant=True swaps the conv for Int8Conv (groups == 1 only: depthwise
    convs are bandwidth-bound, int8 buys them nothing).  Calibration state
    (per-layer activation amax) lives in the "quant_stats" collection and is
    recorded whenever that collection is mutable in `apply`.

    s2d_stride2=True swaps a 3x3/s2 conv for the dense space-to-depth
    re-expression (S2DStride2Conv) — same params, same math, MXU-shaped.
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Callable[[jnp.ndarray], jnp.ndarray] | None = nn.relu
    padding: Any = "TORCH"
    dtype: Dtype = jnp.float32
    quant: bool = False
    s2d_stride2: bool = False

    def _padding(self):
        if isinstance(self.padding, str) and self.padding == "TORCH":
            return torch_padding(self.kernel)
        return self.padding

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.s2d_stride2 and not self.quant:
            assert (
                self.kernel == (3, 3)
                and self.strides == (2, 2)
                and self.groups == 1
            ), (self.kernel, self.strides, self.groups)
            x = S2DStride2Conv(self.features, dtype=self.dtype, name="Conv_0")(x)
        elif self.quant and self.groups == 1:
            amax_v = self.variable(
                "quant_stats", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            calibrating = self.is_mutable_collection("quant_stats")
            if calibrating:
                amax_v.value = jnp.maximum(
                    amax_v.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            x = Int8Conv(
                self.features,
                self.kernel,
                self.strides,
                padding=self._padding(),
                dtype=self.dtype,
                name="Conv_0",  # path-compatible with the float variant
            )(x, amax_v.value, calibrate=calibrating)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.strides,
                padding=self._padding(),
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
    quant: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, skip_dw: bool = False
    ) -> jnp.ndarray:
        act = leaky_relu(self.negative_slope)
        if not skip_dw:
            # skip_dw: x is the depthwise stage's output, precomputed by a
            # fused front (ops/mnet_s4d.py) — only the pointwise conv runs.
            in_ch = x.shape[-1]
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
            self.features,
            (1, 1),
            (1, 1),
            act=act,
            dtype=self.dtype,
            quant=self.quant,
            name="pw",
        )(x, train)
        return x


class FPN(nn.Module):
    """3-level feature pyramid: lateral 1x1 + top-down upsample + merge 3x3."""

    out_channels: int
    negative_slope: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jnp.ndarray],
        train: bool = False,
        skip_levels: Sequence[int] = (),
    ) -> Sequence[jnp.ndarray]:
        """feats: [C3, C4, C5] (strides 8, 16, 32) -> [P3, P4, P5].

        skip_levels: serving fast path (ops/ssh_packed.fpn_packed) — don't
        run lateral{i}/merge{i} for listed levels (0/1 only; the top level
        is lateral-only and can't be skipped: coarser outputs feed finer
        merges); the level's slot is None and the caller re-expresses the
        chain on the packed grid from C_i + the next-coarser level.  The
        skipped params still exist (init always builds them).
        """
        assert len(feats) - 1 not in skip_levels, "top FPN level is required"
        # Downward-closed: a computed level needs every coarser level's
        # output for its top-down merge, so skipping level i forces skipping
        # all finer levels j < i.
        assert all(
            j in skip_levels for i in skip_levels for j in range(i)
        ), f"skip_levels {tuple(skip_levels)} must be downward-closed"
        act = leaky_relu(self.negative_slope) if self.negative_slope > 0 else nn.relu
        laterals = [
            None
            if i in skip_levels
            else ConvBN(
                self.out_channels,
                (1, 1),
                act=act,
                dtype=self.dtype,
                quant=self.quant,
                name=f"lateral{i}",
            )(f, train)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]  # P5
        for i in range(len(laterals) - 2, -1, -1):
            if laterals[i] is None:
                outs.insert(0, None)
                continue
            up = _upsample_nearest_2x(outs[0], laterals[i].shape)
            merged = laterals[i] + up
            merged = ConvBN(
                self.out_channels,
                (3, 3),
                act=act,
                dtype=self.dtype,
                quant=self.quant,
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
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.out_channels % 4 == 0
        act = leaky_relu(self.negative_slope) if self.negative_slope > 0 else nn.relu
        half = self.out_channels // 2
        quarter = self.out_channels // 4

        conv3 = ConvBN(half, (3, 3), act=None, dtype=self.dtype, quant=self.quant, name="conv3")(
            x, train
        )
        conv5_1 = ConvBN(
            quarter, (3, 3), act=act, dtype=self.dtype, quant=self.quant, name="conv5_1"
        )(x, train)
        conv5 = ConvBN(
            quarter, (3, 3), act=None, dtype=self.dtype, quant=self.quant, name="conv5_2"
        )(conv5_1, train)
        conv7_1 = ConvBN(
            quarter, (3, 3), act=act, dtype=self.dtype, quant=self.quant, name="conv7_1"
        )(conv5_1, train)
        conv7 = ConvBN(
            quarter, (3, 3), act=None, dtype=self.dtype, quant=self.quant, name="conv7_2"
        )(conv7_1, train)

        out = jnp.concatenate([conv3, conv5, conv7], axis=-1)
        return nn.relu(out)

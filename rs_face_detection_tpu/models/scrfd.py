"""SCRFD-style detector for the eKYC pipeline.

The reference's eKYC pipeline names an `scrfd` detector but ships only a
config stub (/root/reference/src/pipeline/ekyc_pipeline/config.rs:10-17,
pipeline.rs:3-6 — empty struct).  This implements the capability: a
sample-and-computation-redistributed face detector (SCRFD, Guo et al. 2021)
re-designed TPU-first — compact residual backbone, PAFPN neck (top-down +
bottom-up path aggregation), and a head SHARED across FPN levels predicting
per-anchor sigmoid score, distance-encoded box (l, t, r, b in stride units)
and 5-point landmarks.

Output contract per stride s in (8, 16, 32):
  {"score": (B, H, W, A), "bbox": (B, H, W, A*4), "kps": (B, H, W, A*10)}
with A = 2 anchors per cell, both centered at (x*s, y*s) — decoded by
ops.box_decode.distance2bbox / distance2kps.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import _upsample_nearest_2x, ConvBN


class _ResBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBN(
            self.features, (3, 3), self.strides, act=nn.relu, dtype=self.dtype, name="c1"
        )(x, train)
        y = ConvBN(self.features, (3, 3), act=None, dtype=self.dtype, name="c2")(y, train)
        if x.shape != y.shape:
            x = ConvBN(
                self.features, (1, 1), self.strides, act=None, dtype=self.dtype, name="proj"
            )(x, train)
        return nn.relu(x + y)


class _PAFPN(nn.Module):
    """FPN top-down + bottom-up path aggregation, all levels -> out_channels."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [
            ConvBN(self.out_channels, (1, 1), act=nn.relu, dtype=self.dtype, name=f"lat{i}")(
                f, train
            )
            for i, f in enumerate(feats)
        ]
        # Top-down.
        td = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(td[0], laterals[i].shape)
            merged = ConvBN(
                self.out_channels, (3, 3), act=nn.relu, dtype=self.dtype, name=f"td{i}"
            )(laterals[i] + up, train)
            td.insert(0, merged)
        # Bottom-up augmentation.
        outs = [td[0]]
        for i in range(1, len(td)):
            down = ConvBN(
                self.out_channels, (3, 3), (2, 2), act=nn.relu, dtype=self.dtype, name=f"bu{i}"
            )(outs[-1], train)
            down = down[:, : td[i].shape[1], : td[i].shape[2], :]
            outs.append(nn.relu(td[i] + down))
        return outs


class _SharedHead(nn.Module):
    """Head shared across levels: conv tower + score/bbox/kps 1x1 convs."""

    channels: int
    num_anchors: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i in range(2):
            x = nn.Conv(
                self.channels,
                (3, 3),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"tower{i}",
            )(x)
            x = nn.GroupNorm(
                num_groups=16, dtype=self.dtype, param_dtype=jnp.float32, name=f"gn{i}"
            )(x)
            x = nn.relu(x)
        a = self.num_anchors
        score = nn.Conv(a, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="cls")(
            x
        ).astype(jnp.float32)
        bbox = nn.Conv(
            a * 4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="bbox"
        )(x).astype(jnp.float32)
        kps = nn.Conv(
            a * 10, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="kps"
        )(x).astype(jnp.float32)
        return score, bbox, kps


class SCRFD(nn.Module):
    """Compact SCRFD-style detector emitting per-stride maps."""

    width: int = 32  # backbone base width
    neck_channels: int = 64
    num_anchors: int = 2
    dtype: Any = jnp.float32
    #: Duck-type marker for the serving layout auto-selection
    #: (parallel.serving.DetectionServer; ops/scrfd_s4d.py dense front).
    backbone = "scrfd"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        raw: bool = False,
        stem_precomputed: bool = False,
        # NOTE: keyed by STRIDE (8/16/32) — RetinaFace's analogous
        # skip_head_levels is keyed by pyramid level INDEX (0/1/2).
        skip_head_strides: Tuple[int, ...] = (),
    ) -> Dict[int, Dict[str, jnp.ndarray]]:
        dt = self.dtype
        w = self.width
        x = x.astype(dt)
        if not stem_precomputed:
            # Stem to stride 4 (skipped when the dense s4d front already
            # produced the H/4 x W/4 x w feature — ops/scrfd_s4d.py).
            x = ConvBN(w, (3, 3), (2, 2), act=nn.relu, dtype=dt, name="stem1")(x, train)
            x = ConvBN(w, (3, 3), (2, 2), act=nn.relu, dtype=dt, name="stem2")(x, train)
        # Stages to strides 8/16/32.
        c3 = _ResBlock(w * 2, (2, 2), dtype=dt, name="s3a")(x, train)
        c3 = _ResBlock(w * 2, dtype=dt, name="s3b")(c3, train)
        c4 = _ResBlock(w * 4, (2, 2), dtype=dt, name="s4a")(c3, train)
        c4 = _ResBlock(w * 4, dtype=dt, name="s4b")(c4, train)
        c5 = _ResBlock(w * 8, (2, 2), dtype=dt, name="s5a")(c4, train)
        c5 = _ResBlock(w * 8, dtype=dt, name="s5b")(c5, train)

        pyramid = _PAFPN(self.neck_channels, dtype=dt, name="neck")(
            [c3, c4, c5], train
        )
        head = _SharedHead(
            self.neck_channels, self.num_anchors, dtype=dt, name="head"
        )

        out: Dict[int, Dict[str, jnp.ndarray]] = {}
        for stride, feat in zip((8, 16, 32), pyramid):
            if stride in skip_head_strides:
                # Caller runs the packed head externally
                # (ops/scrfd_packed.py) on the raw pyramid feature.
                out[stride] = {"feat": feat}
                continue
            score, bbox, kps = head(feat, train)
            if not raw:
                score = jax.nn.sigmoid(score)
            out[stride] = {"score": score, "bbox": bbox, "kps": kps}
        return out


def init_scrfd(
    image_size: Sequence[int] = (640, 640),
    width: int = 32,
    dtype: Any = jnp.float32,
    seed: int = 0,
    neck_channels: int = 32,
    num_anchors: int = 2,
):
    """(model, variables).  neck_channels/num_anchors plumb the module's
    configurable fields (the pipeline's anchor tables assume the default
    num_anchors=2 — override both together)."""
    model = SCRFD(
        width=width, dtype=dtype,
        neck_channels=neck_channels, num_anchors=num_anchors,
    )
    w, h = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables

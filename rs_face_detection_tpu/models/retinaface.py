"""RetinaFace detector network: backbone + FPN + SSH + multi-task heads.

This is the in-process replacement for the reference's remote
`face_detection_retina` Triton model (face_detection.rs:254-284).  The output
contract feeds the same decode chain: per FPN stride, a face probability per
anchor plus 4 bbox deltas and 10 landmark deltas per anchor, laid out NHWC so
the flattened (h, w, a) order matches the precomputed anchor plane
(ops/anchors.py).  Heads emit float32 regardless of compute dtype; the 2-class
softmax happens in-graph so downstream consumes probabilities exactly like the
reference's sliced score tensor (face_detection.rs:322).
"""

from __future__ import annotations

import functools

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FPN, SSH
from .mobilenet import MobileNetV1_025
from .resnet import ResNet50

#: per-backbone (fpn/ssh channels, leaky-relu slope, s2d-stem default)
_BACKBONES = {
    "mobilenet025": (64, 0.1, False),
    "resnet50": (256, 0.0, True),
}


class RetinaFace(nn.Module):
    """Multi-level face detector.

    Returns {stride: {"score": (B,H,W,A), "bbox": (B,H,W,A*4),
    "landmark": (B,H,W,A*10)}} for strides (8, 16, 32); `raw=True` swaps the
    softmax face probability for the raw 2-class logits (training).
    """

    backbone: str = "mobilenet025"
    num_anchors: int = 2
    dtype: Any = jnp.float32
    #: None -> per-backbone default (_BACKBONES); bool overrides.
    stem_s2d: Any = None
    #: int8 serving mode (ops.quantize.quantize_retinaface builds the variables).
    quant: bool = False
    #: R50 only: dense re-expression of stage-boundary stride-2 convs
    #: (models.resnet.ResNet50.s2d_boundary) — param-layout-identical opt-in.
    s2d_boundary: bool = False
    #: training option: rematerialize backbone blocks on the backward pass
    #: (nn.remat in the backbones) — same params/math, less activation HBM.
    remat: bool = False

    def _backbone_spec(self):
        try:
            return _BACKBONES[self.backbone]
        except KeyError:
            raise ValueError(
                f"unknown backbone: {self.backbone!r} "
                f"(expected one of {sorted(_BACKBONES)})"
            ) from None

    def negative_slope(self) -> float:
        """The backbone family's leaky-ReLU slope (0.0 = plain ReLU)."""
        return self._backbone_spec()[1]

    def uses_s2d_stem(self) -> bool:
        """Whether the backbone stem consumes the 2x2 space-to-depth layout.

        When True, callers may feed a pre-transformed (B, H/2, W/2, 12) input
        (ops.image.s2d_stem_input) instead of (B, H, W, 3); the backbone
        skips its internal reshuffle in that case.
        """
        if self.stem_s2d is not None:
            return bool(self.stem_s2d)
        return self._backbone_spec()[2]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        raw: bool = False,
        stem_precomputed: Any = False,
        skip_head_levels: Sequence[int] = (),
        skip_fpn_levels: Sequence[int] = (),
    ) -> Dict[int, Dict[str, jnp.ndarray]]:
        """skip_head_levels: serving fast path (ops/ssh_packed.py) — for each
        listed pyramid level i, don't run ssh{i}/cls{i}/box{i}/ldm{i} here;
        return out[stride] = {"feat": P} so the caller can run the packed
        re-expression on the half-resolution grid.  The skipped levels'
        params still exist (init always builds them); they feed the packed
        kernels via fold_ssh_heads_packed.

        skip_fpn_levels: additionally skip the FPN's lateral{i}/merge{i}
        chain for listed levels (0/1 only; each must also be in
        skip_head_levels); out[stride] becomes {"c": C_i} and the caller
        rebuilds the packed pyramid level from C_i + the next-coarser level
        via ops/ssh_packed.fpn_packed."""
        if self.backbone not in _BACKBONES:
            raise ValueError(f"unknown backbone: {self.backbone!r}")
        channels, slope, _ = _BACKBONES[self.backbone]
        dt = self.dtype
        s2d = self.uses_s2d_stem()

        if self.backbone == "mobilenet025":
            # stem_precomputed: x is the dense s4d front's output
            # (ops/mnet_s4d.py, the ds2.dw tensor); resume at ds2.pw.
            feats = MobileNetV1_025(
                dtype=dt, stem_space_to_depth=s2d, quant=self.quant,
                remat=self.remat, name="body"
            )(x.astype(dt), train, front_precomputed=stem_precomputed)
        else:
            feats = ResNet50(
                dtype=dt,
                stem_space_to_depth=s2d,
                quant=self.quant,
                s2d_boundary=self.s2d_boundary,
                remat=self.remat,
                name="body",
            )(x.astype(dt), train, stem_precomputed=stem_precomputed)

        bad_fpn = [
            i
            for i in skip_fpn_levels
            if i not in (0, 1) or i not in skip_head_levels
        ]
        if bad_fpn:
            raise ValueError(
                f"skip_fpn_levels {bad_fpn}: only levels 0/1 have a "
                "lateral+merge chain, and each must also be in "
                "skip_head_levels"
            )
        pyramid = FPN(
            channels, negative_slope=slope, dtype=dt, quant=self.quant, name="fpn"
        )(feats, train, skip_levels=skip_fpn_levels)
        contexts = [
            None
            if i in skip_head_levels
            else SSH(
                channels,
                negative_slope=slope,
                dtype=dt,
                quant=self.quant,
                name=f"ssh{i}",
            )(p, train)
            for i, p in enumerate(pyramid)
        ]

        a = self.num_anchors
        out: Dict[int, Dict[str, jnp.ndarray]] = {}
        for i, (stride, feat) in enumerate(zip((8, 16, 32), contexts)):
            if feat is None:
                if pyramid[i] is None:  # FPN level skipped too: raw C_i
                    out[stride] = {"c": feats[i]}
                else:
                    out[stride] = {"feat": pyramid[i]}
                continue
            cls = nn.Conv(
                a * 2, (1, 1), dtype=dt, param_dtype=jnp.float32, name=f"cls{i}"
            )(feat).astype(jnp.float32)
            box = nn.Conv(
                a * 4, (1, 1), dtype=dt, param_dtype=jnp.float32, name=f"box{i}"
            )(feat).astype(jnp.float32)
            ldm = nn.Conv(
                a * 10, (1, 1), dtype=dt, param_dtype=jnp.float32, name=f"ldm{i}"
            )(feat).astype(jnp.float32)

            b, h, w, _ = cls.shape
            logits = cls.reshape(b, h, w, a, 2)
            if raw:
                score = logits
            else:
                score = jax.nn.softmax(logits, axis=-1)[..., 1]
            out[stride] = {"score": score, "bbox": box, "landmark": ldm}
        return out


def init_retinaface(
    backbone: str = "mobilenet025",
    image_size: Sequence[int] = (640, 640),
    dtype: Any = jnp.float32,
    seed: int = 0,
    stem_s2d: Any = None,
    s2d_boundary: bool = False,
):
    """Build a RetinaFace module and initialize variables for a static size.

    Returns (module, variables) with variables = {"params", "batch_stats"}.
    stem_s2d overrides the backbone's space-to-depth stem default (serving
    paths that feed host-reshuffled 12-channel input want True even for the
    MobileNet backbone, whose device-side-s2d default is False).
    s2d_boundary (R50): dense stage-boundary stride-2 convs — same params.
    """
    model = RetinaFace(
        backbone=backbone,
        dtype=dtype,
        stem_s2d=stem_s2d,
        s2d_boundary=s2d_boundary,
    )
    width, height = image_size
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables

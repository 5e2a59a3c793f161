"""Concrete import maps for public PyTorch checkpoints.

The reference consumed trained models from a Triton repository
(face_pipeline/pipeline.rs:89-116; model names in face_pipeline/config.rs:
22-95); the public weights for those model families circulate as PyTorch
state_dicts.  This module pins down the exact {flax_path: (torch_key, kind)}
mapping for each supported layout:

  - RetinaFace-MobileNet0.25 / RetinaFace-R50 in the `biubug6/
    Pytorch_Retinaface` layout (`mobilenet0.25_Final.pth`,
    `Resnet50_Final.pth`): `body.stage*/layer*`, `fpn.output*/merge*`,
    `ssh{1,2,3}.*`, `ClassHead/BboxHead/LandmarkHead.{i}.conv1x1`.
  - ArcFace IResNet in the insightface `arcface_torch` layout
    (`backbone.pth`): `conv1/bn1/prelu`, `layer{1..4}.{j}.*`, `bn2`, `fc`,
    `features`.

Layout fidelity is proven by tests/test_checkpoint_maps.py: torch mirror
networks carrying the public key names are built, randomized, imported
through these maps, and the flax forwards must match the torch forwards —
including end-to-end through the fused detect graph.

All conv/pool padding follows the torch convention (layers.torch_padding),
so imported weights reproduce torch outputs bit-for-bit modulo float
accumulation order.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .import_weights import apply_mapping

#: iresnet stage sizes (insightface arcface_torch iresnet.py).
_IRESNET_STAGES = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
}


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop a leading 'module.' (DataParallel artifact) from every key."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _conv_bn(m: Dict, flax_mod: str, torch_mod: str, s2d: bool = False) -> None:
    """biubug6 conv_bn/conv_bn1X1/conv_bn_no_relu: Sequential(Conv, BN, ...)."""
    kind = "conv_s2d" if s2d else "conv"
    m[f"params/{flax_mod}/Conv_0/kernel"] = (f"{torch_mod}.0", kind)
    m[f"params/{flax_mod}/BatchNorm_0"] = (f"{torch_mod}.1", "bn")


def _conv_dw(m: Dict, flax_mod: str, torch_mod: str) -> None:
    """biubug6 conv_dw: Sequential(dw Conv, BN, Leaky, pw Conv, BN, Leaky)."""
    m[f"params/{flax_mod}/dw/Conv_0/kernel"] = (f"{torch_mod}.0", "conv")
    m[f"params/{flax_mod}/dw/BatchNorm_0"] = (f"{torch_mod}.1", "bn")
    m[f"params/{flax_mod}/pw/Conv_0/kernel"] = (f"{torch_mod}.3", "conv")
    m[f"params/{flax_mod}/pw/BatchNorm_0"] = (f"{torch_mod}.4", "bn")


def _retinaface_neck_and_heads(m: Dict) -> None:
    """FPN + SSH + heads — identical key layout for both backbones."""
    # FPN: output{1,2,3} laterals (1x1 conv_bn), merge1 -> P3, merge2 -> P4.
    for i, name in enumerate(("output1", "output2", "output3")):
        _conv_bn(m, f"fpn/lateral{i}", f"fpn.{name}")
    _conv_bn(m, "fpn/merge0", "fpn.merge1")
    _conv_bn(m, "fpn/merge1", "fpn.merge2")
    # SSH: torch ssh1/ssh2/ssh3 -> flax ssh0/ssh1/ssh2.  Note biubug6's
    # inconsistent capitalization: conv3X3/conv5X5_1/conv5X5_2/conv7X7_2 but
    # lowercase conv7x7_3.
    for i in range(3):
        t = f"ssh{i + 1}"
        _conv_bn(m, f"ssh{i}/conv3", f"{t}.conv3X3")
        _conv_bn(m, f"ssh{i}/conv5_1", f"{t}.conv5X5_1")
        _conv_bn(m, f"ssh{i}/conv5_2", f"{t}.conv5X5_2")
        _conv_bn(m, f"ssh{i}/conv7_1", f"{t}.conv7X7_2")
        _conv_bn(m, f"ssh{i}/conv7_2", f"{t}.conv7x7_3")
    # Heads: ModuleList of conv1x1 (with bias), one per FPN level.
    for i in range(3):
        m[f"params/cls{i}"] = (f"ClassHead.{i}.conv1x1", "conv_bias")
        m[f"params/box{i}"] = (f"BboxHead.{i}.conv1x1", "conv_bias")
        m[f"params/ldm{i}"] = (f"LandmarkHead.{i}.conv1x1", "conv_bias")


def retinaface_mobilenet025_map(stem_s2d: bool = False) -> Dict[str, Tuple]:
    """biubug6 mobilenet0.25_Final.pth layout -> RetinaFace(mobilenet025).

    stem_s2d must match the flax model's stem layout
    (RetinaFace.uses_s2d_stem(); MobileNet defaults to False).
    """
    m: Dict[str, Tuple] = {}
    # stage1: conv_bn(3->8,s2) + conv_dw x5 (ds1..ds5).
    _conv_bn(m, "body/conv1", "body.stage1.0", s2d=stem_s2d)
    for i in range(1, 6):
        _conv_dw(m, f"body/ds{i}", f"body.stage1.{i}")
    # stage2: conv_dw x6 (ds6..ds11); stage3: conv_dw x2 (ds12, ds13).
    for i in range(6):
        _conv_dw(m, f"body/ds{6 + i}", f"body.stage2.{i}")
    for i in range(2):
        _conv_dw(m, f"body/ds{12 + i}", f"body.stage3.{i}")
    _retinaface_neck_and_heads(m)
    return m


def retinaface_resnet50_map(stem_s2d: bool = True) -> Dict[str, Tuple]:
    """biubug6 Resnet50_Final.pth layout -> RetinaFace(resnet50).

    The backbone keys are torchvision resnet50 under `body.` (biubug6 uses
    IntermediateLayerGetter, which preserves torchvision names).  stem_s2d
    must match the flax model (ResNet50 defaults to True; the 7x7 stem
    converts exactly via the conv_s2d kind).
    """
    m: Dict[str, Tuple] = {}
    m["params/body/stem/Conv_0/kernel"] = (
        "body.conv1",
        "conv_s2d" if stem_s2d else "conv",
    )
    m["params/body/stem/BatchNorm_0"] = ("body.bn1", "bn")
    for s, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            t = f"body.layer{s + 1}.{b}"
            f = f"params/body/s{s}b{b}"
            for c in (1, 2, 3):
                m[f"{f}/c{c}/Conv_0/kernel"] = (f"{t}.conv{c}", "conv")
                m[f"{f}/c{c}/BatchNorm_0"] = (f"{t}.bn{c}", "bn")
            if b == 0:
                m[f"{f}/proj/Conv_0/kernel"] = (f"{t}.downsample.0", "conv")
                m[f"{f}/proj/BatchNorm_0"] = (f"{t}.downsample.1", "bn")
    _retinaface_neck_and_heads(m)
    return m


def iresnet_map(depth: str = "iresnet50") -> Dict[str, Tuple]:
    """insightface arcface_torch backbone.pth layout -> IResNet."""
    m: Dict[str, Tuple] = {
        "params/stem/kernel": ("conv1", "conv"),
        "params/stem_bn": ("bn1", "bn"),
        "params/stem_prelu/alpha": ("prelu.weight", "raw"),
        "params/tail_bn": ("bn2", "bn"),
        # torch flattens (B, 512, 7, 7) NCHW before fc; permute to NHWC order.
        "params/fc": ("fc", "dense_nchw", (512, 7, 7)),
        "params/feat_bn": ("features", "bn"),
    }
    for s, blocks in enumerate(_IRESNET_STAGES[depth]):
        for b in range(blocks):
            t = f"layer{s + 1}.{b}"
            f = f"params/s{s}b{b}"
            m[f"{f}/bn1"] = (f"{t}.bn1", "bn")
            m[f"{f}/conv1/kernel"] = (f"{t}.conv1", "conv")
            m[f"{f}/bn2"] = (f"{t}.bn2", "bn")
            m[f"{f}/prelu/alpha"] = (f"{t}.prelu.weight", "raw")
            m[f"{f}/conv2/kernel"] = (f"{t}.conv2", "conv")
            m[f"{f}/bn3"] = (f"{t}.bn3", "bn")
            if b == 0:  # every stage opens with stride 2 -> downsample
                m[f"{f}/down_conv/kernel"] = (f"{t}.downsample.0", "conv")
                m[f"{f}/down_bn"] = (f"{t}.downsample.1", "bn")
    return m


def load_retinaface_state_dict(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    backbone: str,
    stem_s2d: bool,
    strict: bool = True,
) -> Dict[str, Any]:
    """Import a public RetinaFace state_dict into RetinaFace variables.

    Accepts raw or 'module.'-prefixed state_dicts.  strict=True raises if any
    torch tensor goes unconsumed (catches layout drift).
    """
    sd = strip_module_prefix(state_dict)
    if backbone == "mobilenet025":
        mapping = retinaface_mobilenet025_map(stem_s2d=stem_s2d)
    elif backbone == "resnet50":
        mapping = retinaface_resnet50_map(stem_s2d=stem_s2d)
    else:
        raise ValueError(f"unknown backbone {backbone!r}")
    new_vars, unconsumed = apply_mapping(variables, sd, mapping)
    if strict and unconsumed:
        raise ValueError(f"unconsumed torch keys: {unconsumed[:8]}...")
    return new_vars


def load_iresnet_state_dict(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    depth: str = "iresnet50",
    strict: bool = True,
) -> Dict[str, Any]:
    """Import an insightface arcface_torch backbone.pth into IResNet variables."""
    sd = strip_module_prefix(state_dict)
    new_vars, unconsumed = apply_mapping(variables, sd, iresnet_map(depth))
    if strict and unconsumed:
        raise ValueError(f"unconsumed torch keys: {unconsumed[:8]}...")
    return new_vars

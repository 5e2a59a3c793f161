"""Import path for mmdet-layout SCRFD checkpoints (VERDICT r2 #5b).

The reference's eKYC pipeline names an `scrfd` detector
(/root/reference/src/pipeline/ekyc_pipeline/config.rs:10-17).  Public SCRFD
weights (insightface) are trained in an mmdetection fork; their torch
state_dicts carry the mmdet module naming:

    backbone.stem.{0,1,3,4,6,7}.*          deep 3-conv stem (ResNetV1e) or
    backbone.conv1 / backbone.bn1          classic 7x7 stem
    backbone.layer{s}.{b}.conv1/bn1/conv2/bn2[/downsample.{0,1}]
    neck.lateral_convs.{i}.conv.*          PAFPN: 1x1 laterals,
    neck.fpn_convs.{i}.conv.*              3x3 smoothing,
    neck.downsample_convs.{i}.conv.*       bottom-up 3x3/s2,
    neck.pafpn_convs.{i}.conv.*            3x3 outputs
    bbox_head.cls_convs.0.{j}.conv/gn.*    shared stacked tower (GN)
    bbox_head.reg_convs.0.{j}.conv/gn.*
    bbox_head.stride_cls.{k}.*             per-stride 3x3 prediction convs
    bbox_head.stride_reg.{k}.*             (ModuleDict keys "8"/"(8, 8)"
    bbox_head.stride_kps.{k}.*              both seen in the wild)
    bbox_head.scales.{i}.scale             per-stride regression scale

`scrfd_spec_from_state_dict` derives the full architecture (stem form and
widths, per-stage block counts/planes/block type, neck width, tower depth,
anchors, landmark head presence) from tensor shapes alone — the same
approach proven for MiniFASNet — and `SCRFDImportedNet` is a faithful flax
re-expression of the mmdet forward (BN eps 1e-5, GN 32 groups by default,
nearest-neighbor top-down upsample, PAFPN bottom-up augmentation, shared
head with per-stride scales).

Oracle caveat: this environment has no network egress, so layout fidelity
is proven against a torch mirror built to the same mmdet conventions
(tests/torch_mirrors.py::SCRFDMirror + tests/test_scrfd_import.py) — the
strongest oracle reachable here.  The importer is shape-derived and
`strict` mode reports every unconsumed key, so any naming drift in a real
checkpoint surfaces immediately rather than silently.

Output contract matches models/scrfd.SCRFD: per stride
{"score": (B,H,W,A), "bbox": (B,H,W,A*4), "kps": (B,H,W,A*10)}, consumed by
the eKYC pipeline's distance decode (ops.box_decode.distance2bbox).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SCRFDImportSpec:
    deep_stem: bool
    stem_channels: Tuple[int, ...]  # conv output widths, stem order
    block: str  # "basic" | "bottleneck"
    stage_blocks: Tuple[int, ...]
    stage_planes: Tuple[int, ...]  # block OUTPUT widths per stage
    neck_in_start: int  # first backbone stage feeding the neck (0-based)
    neck_out: int
    num_levels: int
    stacked_convs: int
    head_channels: int
    num_anchors: int
    use_kps: bool
    head_norm: str  # "gn" | "bn"
    gn_groups: int
    strides: Tuple[int, ...] = (8, 16, 32)


def _count(sd: Mapping[str, Any], fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


def scrfd_spec_from_state_dict(sd: Mapping[str, Any]) -> SCRFDImportSpec:
    """Derive the architecture from tensor shapes (minifas-style)."""
    deep_stem = "backbone.stem.0.weight" in sd
    if deep_stem:
        stem_channels = []
        i = 0
        while f"backbone.stem.{i}.weight" in sd:
            stem_channels.append(int(np.asarray(sd[f"backbone.stem.{i}.weight"]).shape[0]))
            i += 3  # Conv at 0, BN at 1, ReLU at 2 (no params)
        stem_channels = tuple(stem_channels)
    elif "backbone.conv1.weight" in sd:
        stem_channels = (int(np.asarray(sd["backbone.conv1.weight"]).shape[0]),)
    else:
        raise ValueError("no recognizable backbone stem keys")

    block = "bottleneck" if "backbone.layer1.0.conv3.weight" in sd else "basic"
    stage_blocks: List[int] = []
    stage_planes: List[int] = []
    s = 1
    while f"backbone.layer{s}.0.conv1.weight" in sd:
        blocks = 0
        while f"backbone.layer{s}.{blocks}.conv1.weight" in sd:
            blocks += 1
        last_conv = "conv3" if block == "bottleneck" else "conv2"
        planes = int(
            np.asarray(sd[f"backbone.layer{s}.0.{last_conv}.weight"]).shape[0]
        )
        stage_blocks.append(blocks)
        stage_planes.append(planes)
        s += 1
    if not stage_blocks:
        raise ValueError("no backbone.layer* stages found")

    n_lat = _count(sd, "neck.lateral_convs.{0}.conv.weight")
    if n_lat == 0:
        raise ValueError("no neck.lateral_convs found")
    neck_out = int(np.asarray(sd["neck.lateral_convs.0.conv.weight"]).shape[0])
    lat_in = [
        int(np.asarray(sd[f"neck.lateral_convs.{i}.conv.weight"]).shape[1])
        for i in range(n_lat)
    ]
    # Locate which backbone stages feed the neck by matching widths.
    start = 0
    for cand in range(len(stage_planes) - n_lat + 1):
        if list(stage_planes[cand : cand + n_lat]) == lat_in:
            start = cand
            break
    else:
        raise ValueError(
            f"neck input widths {lat_in} do not match stage planes {stage_planes}"
        )

    stacked = _count(sd, "bbox_head.cls_convs.0.{0}.conv.weight")
    if stacked == 0:
        raise ValueError("no bbox_head.cls_convs tower found")
    head_ch = int(np.asarray(sd["bbox_head.cls_convs.0.0.conv.weight"]).shape[0])
    head_norm = "gn" if "bbox_head.cls_convs.0.0.gn.weight" in sd else "bn"

    cls_keys = _stride_head_keys(sd, "stride_cls")
    if not cls_keys:
        raise ValueError("no bbox_head.stride_cls prediction convs found")
    num_anchors = int(np.asarray(sd[cls_keys[0] + ".weight"]).shape[0])
    use_kps = bool(_stride_head_keys(sd, "stride_kps"))
    return SCRFDImportSpec(
        deep_stem=deep_stem,
        stem_channels=stem_channels,
        block=block,
        stage_blocks=tuple(stage_blocks),
        stage_planes=tuple(stage_planes),
        neck_in_start=start,
        neck_out=neck_out,
        num_levels=n_lat,
        stacked_convs=stacked,
        head_channels=head_ch,
        num_anchors=num_anchors,
        use_kps=use_kps,
        head_norm=head_norm,
        gn_groups=(
            _gn_groups(np.asarray(sd["bbox_head.cls_convs.0.0.gn.weight"]).shape[0])
            if head_norm == "gn"
            else 32
        ),
    )


def _gn_groups(channels: int) -> int:
    """Default GN group count — NOT recoverable from tensor shapes (GN has
    only per-channel affine params).  The insightface SCRFD configs use
    norm_cfg num_groups=16; fall back to smaller powers of two for narrow
    test widths.  Override via load_scrfd_state_dict(gn_groups=...)."""
    for g in (16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


def _stride_head_keys(sd: Mapping[str, Any], name: str) -> List[str]:
    """Per-stride prediction conv module prefixes, in stride order.

    ModuleDict keys appear as both "8" and "(8, 8)" in the wild; collect
    whatever prefix exists and sort numerically by the first integer found.
    """
    import re

    prefixes = set()
    pat = re.compile(rf"^bbox_head\.{name}\.([^.]+)\.weight$")
    for k in sd:
        m = pat.match(k)
        if m:
            prefixes.add(f"bbox_head.{name}.{m.group(1)}")

    def stride_of(prefix: str) -> int:
        nums = re.findall(r"\d+", prefix.rsplit(".", 1)[1])
        return int(nums[0]) if nums else 0

    return sorted(prefixes, key=stride_of)


# ---------------------------------------------------------------------------
# the flax network (mmdet forward semantics)
# ---------------------------------------------------------------------------


def _torch_pad(k: int):
    p = k // 2
    return ((p, p), (p, p))


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=_torch_pad(self.kernel),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(x) if self.relu else x


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _ConvBNReLU(self.planes, 3, self.stride, dtype=self.dtype, name="cb1")(x)
        y = _ConvBNReLU(self.planes, 3, 1, relu=False, dtype=self.dtype, name="cb2")(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = _ConvBNReLU(
                self.planes, 1, self.stride, relu=False, dtype=self.dtype, name="down"
            )(x)
        return nn.relu(x + y)


class _Bottleneck(nn.Module):
    planes: int  # OUTPUT width (4x mid)
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.planes // 4
        y = _ConvBNReLU(mid, 1, 1, dtype=self.dtype, name="cb1")(x)
        y = _ConvBNReLU(mid, 3, self.stride, dtype=self.dtype, name="cb2")(y)
        y = _ConvBNReLU(self.planes, 1, 1, relu=False, dtype=self.dtype, name="cb3")(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = _ConvBNReLU(
                self.planes, 1, self.stride, relu=False, dtype=self.dtype, name="down"
            )(x)
        return nn.relu(x + y)


class _ConvModule(nn.Module):
    """mmdet ConvModule: conv (+bias when no norm) + optional GN/BN + ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: Optional[str] = None  # None | "gn" | "bn"
    gn_groups: int = 32
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=_torch_pad(self.kernel),
            use_bias=self.norm is None,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.norm == "gn":
            x = nn.GroupNorm(
                num_groups=self.gn_groups,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="gn",
            )(x.astype(jnp.float32)).astype(self.dtype)
        elif self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=True,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="bn",
            )(x.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(x) if self.relu else x


class SCRFDImportedNet(nn.Module):
    """mmdet-layout SCRFD: deep-stem ResNet + PAFPN + shared SCRFD head."""

    spec: SCRFDImportSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, raw: bool = False
    ) -> Dict[int, Dict[str, jnp.ndarray]]:
        sp = self.spec
        dt = self.dtype
        x = x.astype(dt)

        # Stem (stride 4 with the 3x3/s2 maxpool).
        if sp.deep_stem:
            for i, ch in enumerate(sp.stem_channels):
                x = _ConvBNReLU(
                    ch, 3, 2 if i == 0 else 1, dtype=dt, name=f"stem{i}"
                )(x)
        else:
            x = _ConvBNReLU(sp.stem_channels[0], 7, 2, dtype=dt, name="stem0")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # Stages: layer1 stride 1, later stages stride 2 (mmdet ResNet).
        feats = []
        Block = _BasicBlock if sp.block == "basic" else _Bottleneck
        for s, (blocks, planes) in enumerate(zip(sp.stage_blocks, sp.stage_planes)):
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                x = Block(planes, stride, dtype=dt, name=f"s{s}b{b}")(x)
            feats.append(x)
        inputs = feats[sp.neck_in_start : sp.neck_in_start + sp.num_levels]

        # PAFPN (mmdet forward: laterals -> top-down add -> fpn convs ->
        # bottom-up add -> pafpn convs on all but the lowest level).
        laterals = [
            _ConvModule(sp.neck_out, 1, relu=False, dtype=dt, name=f"lat{i}")(f)
            for i, f in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            laterals[i - 1] = laterals[i - 1] + up[
                :, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2], :
            ]
        inter = [
            _ConvModule(sp.neck_out, 3, relu=False, dtype=dt, name=f"fpn{i}")(l)
            for i, l in enumerate(laterals)
        ]
        for i in range(len(inter) - 1):
            inter[i + 1] = inter[i + 1] + _ConvModule(
                sp.neck_out, 3, stride=2, relu=False, dtype=dt, name=f"down{i}"
            )(inter[i])
        outs = [inter[0]] + [
            _ConvModule(sp.neck_out, 3, relu=False, dtype=dt, name=f"pafpn{i}")(
                inter[i + 1]
            )
            for i in range(len(inter) - 1)
        ]

        # Shared head with per-stride scales.
        a = sp.num_anchors
        out: Dict[int, Dict[str, jnp.ndarray]] = {}
        cls_tower = [
            _ConvModule(
                sp.head_channels,
                3,
                norm=sp.head_norm,
                gn_groups=sp.gn_groups,
                dtype=dt,
                name=f"cls_t{j}",
            )
            for j in range(sp.stacked_convs)
        ]
        reg_tower = [
            _ConvModule(
                sp.head_channels,
                3,
                norm=sp.head_norm,
                gn_groups=sp.gn_groups,
                dtype=dt,
                name=f"reg_t{j}",
            )
            for j in range(sp.stacked_convs)
        ]
        for i, (stride, feat) in enumerate(zip(sp.strides, outs)):
            c = feat
            for mod in cls_tower:
                c = mod(c)
            r = feat
            for mod in reg_tower:
                r = mod(r)
            score = nn.Conv(
                a, (3, 3), padding=_torch_pad(3), dtype=dt,
                param_dtype=jnp.float32, name=f"pred_cls{i}",
            )(c).astype(jnp.float32)
            scale = self.param(f"scale{i}", nn.initializers.ones, (), jnp.float32)
            bbox = nn.Conv(
                a * 4, (3, 3), padding=_torch_pad(3), dtype=dt,
                param_dtype=jnp.float32, name=f"pred_reg{i}",
            )(r).astype(jnp.float32) * scale
            entry = {
                "score": score if raw else jax.nn.sigmoid(score),
                "bbox": bbox,
            }
            if sp.use_kps:
                entry["kps"] = nn.Conv(
                    a * 10, (3, 3), padding=_torch_pad(3), dtype=dt,
                    param_dtype=jnp.float32, name=f"pred_kps{i}",
                )(r).astype(jnp.float32)
            out[stride] = entry
        return out


def init_scrfd_imported(
    spec: SCRFDImportSpec,
    image_size: Sequence[int] = (640, 640),
    dtype: Any = jnp.float32,
    seed: int = 0,
):
    import functools

    model = SCRFDImportedNet(spec=spec, dtype=dtype)
    w, h = image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables


# ---------------------------------------------------------------------------
# the import map
# ---------------------------------------------------------------------------


def scrfd_map(spec: SCRFDImportSpec, sd: Mapping[str, Any]) -> Dict[str, Tuple]:
    """{flax_path: (torch_key, kind)} for a SCRFDImportedNet of `spec`."""
    m: Dict[str, Tuple] = {}

    def conv_bn(f: str, t_conv: str, t_bn: str) -> None:
        m[f"params/{f}/conv/kernel"] = (t_conv, "conv")
        m[f"params/{f}/bn"] = (t_bn, "bn")

    if spec.deep_stem:
        for i in range(len(spec.stem_channels)):
            conv_bn(f"stem{i}", f"backbone.stem.{i * 3}", f"backbone.stem.{i * 3 + 1}")
    else:
        conv_bn("stem0", "backbone.conv1", "backbone.bn1")

    for s, blocks in enumerate(spec.stage_blocks):
        for b in range(blocks):
            t = f"backbone.layer{s + 1}.{b}"
            f = f"s{s}b{b}"
            n_convs = 3 if spec.block == "bottleneck" else 2
            for c in range(1, n_convs + 1):
                conv_bn(f"{f}/cb{c}", f"{t}.conv{c}", f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                conv_bn(f"{f}/down", f"{t}.downsample.0", f"{t}.downsample.1")

    for i in range(spec.num_levels):
        m[f"params/lat{i}/conv"] = (f"neck.lateral_convs.{i}.conv", "conv_bias")
        m[f"params/fpn{i}/conv"] = (f"neck.fpn_convs.{i}.conv", "conv_bias")
    for i in range(spec.num_levels - 1):
        m[f"params/down{i}/conv"] = (f"neck.downsample_convs.{i}.conv", "conv_bias")
        m[f"params/pafpn{i}/conv"] = (f"neck.pafpn_convs.{i}.conv", "conv_bias")

    for j in range(spec.stacked_convs):
        for tower, torch_tower in (("cls_t", "cls_convs"), ("reg_t", "reg_convs")):
            base = f"bbox_head.{torch_tower}.0.{j}"
            m[f"params/{tower}{j}/conv/kernel"] = (f"{base}.conv", "conv")
            if spec.head_norm == "gn":
                m[f"params/{tower}{j}/gn/scale"] = (f"{base}.gn.weight", "raw")
                m[f"params/{tower}{j}/gn/bias"] = (f"{base}.gn.bias", "raw")
            else:
                m[f"params/{tower}{j}/bn"] = (f"{base}.bn", "bn")

    for kind, flax_name in (
        ("stride_cls", "pred_cls"),
        ("stride_reg", "pred_reg"),
        ("stride_kps", "pred_kps"),
    ):
        keys = _stride_head_keys(sd, kind)
        if not keys:
            continue
        for i, prefix in enumerate(keys):
            m[f"params/{flax_name}{i}"] = (prefix, "conv_bias")
    for i in range(spec.num_levels):
        key = f"bbox_head.scales.{i}.scale"
        if key in sd:
            m[f"params/scale{i}"] = (key, "raw")
    return m


def load_scrfd_state_dict(
    state_dict: Mapping[str, Any],
    image_size: Sequence[int] = (640, 640),
    dtype: Any = jnp.float32,
    strict: bool = True,
    gn_groups: Optional[int] = None,
):
    """Build a SCRFDImportedNet matching `state_dict` and import it.

    gn_groups overrides the head GroupNorm group count (shape-underdetermined;
    defaults to the mmdet SCRFD convention, 16 when divisible).
    Returns (model, variables, spec).
    """
    from .checkpoint_maps import strip_module_prefix
    from .import_weights import apply_mapping

    sd = {
        k: np.asarray(v) for k, v in strip_module_prefix(state_dict).items()
    }
    spec = scrfd_spec_from_state_dict(sd)
    if gn_groups is not None:
        spec = dataclasses.replace(spec, gn_groups=gn_groups)
    model, variables = init_scrfd_imported(spec, image_size, dtype=dtype)
    new_vars, unconsumed = apply_mapping(variables, sd, scrfd_map(spec, sd))
    if strict and unconsumed:
        raise ValueError(f"unconsumed torch keys: {unconsumed[:8]}...")
    return model, jax.tree.map(jnp.asarray, new_vars), spec

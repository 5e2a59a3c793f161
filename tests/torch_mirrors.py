"""Torch mirror networks carrying the PUBLIC checkpoint key layouts.

These replicate the state_dict layouts (key names, tensor shapes, module
order) of the public checkpoints our import maps target:

  - biubug6/Pytorch_Retinaface: `mobilenet0.25_Final.pth` /
    `Resnet50_Final.pth` — MobileNetV1 stages / torchvision resnet50 under
    `body.`, `fpn.output*/merge*`, `ssh{1,2,3}`, ModuleList heads.
  - insightface arcface_torch `backbone.pth` — iresnet conv1/bn1/prelu,
    layer{1..4}, bn2/fc/features.

Tests build these mirrors, randomize every tensor, export state_dict, import
through models.checkpoint_maps, and assert flax forward == torch forward.
No code is copied from any repository; the modules are written from the
published state_dict layout contract (key names + shapes) that the import
maps must satisfy.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# biubug6-layout RetinaFace building blocks
# ---------------------------------------------------------------------------


def conv_bn(inp, oup, stride=1, leaky=0.0):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        nn.BatchNorm2d(oup),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def conv_bn_no_relu(inp, oup, stride=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        nn.BatchNorm2d(oup),
    )


def conv_bn1X1(inp, oup, stride=1, leaky=0.0):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 1, stride, 0, bias=False),
        nn.BatchNorm2d(oup),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def conv_dw(inp, oup, stride, leaky=0.1):
    return nn.Sequential(
        nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
        nn.BatchNorm2d(inp),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
        nn.Conv2d(inp, oup, 1, 1, 0, bias=False),
        nn.BatchNorm2d(oup),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


class MobileNetV1(nn.Module):
    def __init__(self):
        super().__init__()
        self.stage1 = nn.Sequential(
            conv_bn(3, 8, 2, leaky=0.1),
            conv_dw(8, 16, 1),
            conv_dw(16, 32, 2),
            conv_dw(32, 32, 1),
            conv_dw(32, 64, 2),
            conv_dw(64, 64, 1),
        )
        self.stage2 = nn.Sequential(
            conv_dw(64, 128, 2),
            conv_dw(128, 128, 1),
            conv_dw(128, 128, 1),
            conv_dw(128, 128, 1),
            conv_dw(128, 128, 1),
            conv_dw(128, 128, 1),
        )
        self.stage3 = nn.Sequential(conv_dw(128, 256, 2), conv_dw(256, 256, 1))

    def forward(self, x):
        c3 = self.stage1(x)
        c4 = self.stage2(c3)
        c5 = self.stage3(c4)
        return [c3, c4, c5]


class Bottleneck(nn.Module):
    """torchvision-style resnet Bottleneck (stride on conv2 — 'v1.5')."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet50Body(nn.Module):
    """torchvision resnet50 trunk with the torchvision key names, emitting
    (layer2, layer3, layer4) like biubug6's IntermediateLayerGetter."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c3, c4, c5]


class FPNMirror(nn.Module):
    def __init__(self, in_list, out):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.output1 = conv_bn1X1(in_list[0], out, 1, leaky)
        self.output2 = conv_bn1X1(in_list[1], out, 1, leaky)
        self.output3 = conv_bn1X1(in_list[2], out, 1, leaky)
        self.merge1 = conv_bn(out, out, leaky=leaky)
        self.merge2 = conv_bn(out, out, leaky=leaky)

    def forward(self, feats):
        o1 = self.output1(feats[0])
        o2 = self.output2(feats[1])
        o3 = self.output3(feats[2])
        up3 = F.interpolate(o3, size=o2.shape[2:], mode="nearest")
        o2 = self.merge2(o2 + up3)
        up2 = F.interpolate(o2, size=o1.shape[2:], mode="nearest")
        o1 = self.merge1(o1 + up2)
        return [o1, o2, o3]


class SSHMirror(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        leaky = 0.1 if out_ch <= 64 else 0.0
        self.conv3X3 = conv_bn_no_relu(in_ch, out_ch // 2)
        self.conv5X5_1 = conv_bn(in_ch, out_ch // 4, leaky=leaky)
        self.conv5X5_2 = conv_bn_no_relu(out_ch // 4, out_ch // 4)
        self.conv7X7_2 = conv_bn(out_ch // 4, out_ch // 4, leaky=leaky)
        self.conv7x7_3 = conv_bn_no_relu(out_ch // 4, out_ch // 4)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class ClassHead(nn.Module):
    def __init__(self, in_ch, anchors=2):
        super().__init__()
        self.conv1x1 = nn.Conv2d(in_ch, anchors * 2, 1)

    def forward(self, x):
        return self.conv1x1(x).permute(0, 2, 3, 1).reshape(x.shape[0], -1, 2)


class BboxHead(nn.Module):
    def __init__(self, in_ch, anchors=2):
        super().__init__()
        self.conv1x1 = nn.Conv2d(in_ch, anchors * 4, 1)

    def forward(self, x):
        return self.conv1x1(x).permute(0, 2, 3, 1).reshape(x.shape[0], -1, 4)


class LandmarkHead(nn.Module):
    def __init__(self, in_ch, anchors=2):
        super().__init__()
        self.conv1x1 = nn.Conv2d(in_ch, anchors * 10, 1)

    def forward(self, x):
        return self.conv1x1(x).permute(0, 2, 3, 1).reshape(x.shape[0], -1, 10)


class RetinaFaceMirror(nn.Module):
    """biubug6-layout RetinaFace.  forward returns per-level
    (score_prob (B,N,), bbox (B,N,4), ldm (B,N,10)) lists, level order
    [stride8, stride16, stride32]."""

    def __init__(self, backbone="mobilenet025"):
        super().__init__()
        if backbone == "mobilenet025":
            self.body = MobileNetV1()
            in_list, out = [64, 128, 256], 64
        elif backbone == "resnet50":
            self.body = ResNet50Body()
            in_list, out = [512, 1024, 2048], 256
        else:
            raise ValueError(backbone)
        self.fpn = FPNMirror(in_list, out)
        self.ssh1 = SSHMirror(out, out)
        self.ssh2 = SSHMirror(out, out)
        self.ssh3 = SSHMirror(out, out)
        self.ClassHead = nn.ModuleList([ClassHead(out) for _ in range(3)])
        self.BboxHead = nn.ModuleList([BboxHead(out) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList([LandmarkHead(out) for _ in range(3)])

    def forward(self, x):
        fpn = self.fpn(self.body(x))
        feats = [self.ssh1(fpn[0]), self.ssh2(fpn[1]), self.ssh3(fpn[2])]
        scores = [
            F.softmax(self.ClassHead[i](f), dim=-1)[..., 1]
            for i, f in enumerate(feats)
        ]
        bboxes = [self.BboxHead[i](f) for i, f in enumerate(feats)]
        ldms = [self.LandmarkHead[i](f) for i, f in enumerate(feats)]
        return scores, bboxes, ldms


# ---------------------------------------------------------------------------
# insightface-layout IResNet
# ---------------------------------------------------------------------------


def _conv3x3(inp, oup, stride=1):
    return nn.Conv2d(inp, oup, 3, stride, 1, bias=False)


class IBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(inplanes, eps=1e-05)
        self.conv1 = _conv3x3(inplanes, planes)
        self.bn2 = nn.BatchNorm2d(planes, eps=1e-05)
        self.prelu = nn.PReLU(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn3 = nn.BatchNorm2d(planes, eps=1e-05)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class IResNetMirror(nn.Module):
    STAGES = {
        "iresnet18": (2, 2, 2, 2),
        "iresnet34": (3, 4, 6, 3),
        "iresnet50": (3, 4, 14, 3),
        "iresnet100": (3, 13, 30, 3),
    }

    def __init__(self, depth="iresnet50", num_features=512):
        super().__init__()
        blocks = self.STAGES[depth]
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=1e-05)
        self.prelu = nn.PReLU(64)
        self.layer1 = self._make_layer(64, blocks[0], 2)
        self.layer2 = self._make_layer(128, blocks[1], 2)
        self.layer3 = self._make_layer(256, blocks[2], 2)
        self.layer4 = self._make_layer(512, blocks[3], 2)
        self.bn2 = nn.BatchNorm2d(512, eps=1e-05)
        self.fc = nn.Linear(512 * 7 * 7, num_features)
        self.features = nn.BatchNorm1d(num_features, eps=1e-05)

    def _make_layer(self, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
            nn.BatchNorm2d(planes, eps=1e-05),
        )
        layers = [IBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(IBasicBlock(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        return self.features(self.fc(x))


# ---------------------------------------------------------------------------
# torchvision-layout resnet18 classifier (quality / FQA heads)
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.bn2(self.conv2(self.relu(self.bn1(self.conv1(x)))))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet18ClassifierMirror(nn.Module):
    """torchvision resnet18 with an arbitrary-width fc head."""

    def __init__(self, num_outputs=4):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 1)
        self.layer2 = self._make_layer(128, 2)
        self.layer3 = self._make_layer(256, 2)
        self.layer4 = self._make_layer(512, 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_outputs)

    def _make_layer(self, planes, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers.append(BasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


# ---------------------------------------------------------------------------
# Silent-Face-layout MiniFASNet
# ---------------------------------------------------------------------------


class MFConvBlock(nn.Module):
    """Conv_block: conv(no bias) + BN + PReLU(C)."""

    def __init__(self, inp, oup, kernel=(1, 1), stride=(1, 1), padding=(0, 0), groups=1):
        super().__init__()
        self.conv = nn.Conv2d(inp, oup, kernel, stride, padding, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(oup)
        self.prelu = nn.PReLU(oup)

    def forward(self, x):
        return self.prelu(self.bn(self.conv(x)))


class MFLinearBlock(nn.Module):
    """Linear_block: conv(no bias) + BN."""

    def __init__(self, inp, oup, kernel=(1, 1), stride=(1, 1), padding=(0, 0), groups=1):
        super().__init__()
        self.conv = nn.Conv2d(inp, oup, kernel, stride, padding, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(oup)

    def forward(self, x):
        return self.bn(self.conv(x))


class MFSEModule(nn.Module):
    def __init__(self, channels, reduct):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, reduct, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(reduct)
        self.relu = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(reduct, channels, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(channels)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = self.sigmoid(self.bn2(self.fc2(self.relu(self.bn1(self.fc1(self.avg_pool(x)))))))
        return x * s


class MFDepthWise(nn.Module):
    def __init__(self, inp, mid1, mid2, out, groups, stride=1, residual=False, se_reduct=0):
        super().__init__()
        self.conv = MFConvBlock(inp, mid1)
        self.conv_dw = MFConvBlock(
            mid1, mid2, kernel=(3, 3), stride=(stride, stride), padding=(1, 1),
            groups=groups,
        )
        self.project = MFLinearBlock(mid2, out)
        if se_reduct:
            self.se_module = MFSEModule(out, se_reduct)
        self.residual = residual
        self._has_se = bool(se_reduct)

    def forward(self, x):
        y = self.project(self.conv_dw(self.conv(x)))
        if self._has_se:
            y = self.se_module(y)
        return x + y if self.residual else y


class MFResidual(nn.Module):
    """Stage of residual Depth_Wise blocks under a 'model' Sequential."""

    def __init__(self, blocks):
        super().__init__()
        self.model = nn.Sequential(*blocks)

    def forward(self, x):
        return self.model(x)


class MiniFASNetMirror(nn.Module):
    """Silent-Face MiniFASNet layout, parameterized like our flax spec.

    Default widths: a compact V2-proportioned net (SE optional) so tests run
    fast; the import path must work for ANY widths — that is the point of the
    shape-derived spec.
    """

    def __init__(self, input_hw=(80, 80), emb=128, num_classes=3, se=False,
                 width=16):
        super().__init__()
        w = width
        self.conv1 = MFConvBlock(3, w, kernel=(3, 3), stride=(2, 2), padding=(1, 1))
        self.conv2_dw = MFConvBlock(w, w, kernel=(3, 3), stride=(1, 1),
                                    padding=(1, 1), groups=w)
        self.conv_23 = MFDepthWise(w, w * 3, w * 3, w * 2, groups=w * 3, stride=2)
        self.conv_3 = MFResidual([
            MFDepthWise(w * 2, w * 2, w * 2, w * 2, groups=w * 2, residual=True,
                        se_reduct=(w // 2 if (se and i == 1) else 0))
            for i in range(2)
        ])
        self.conv_34 = MFDepthWise(w * 2, w * 6, w * 6, w * 4, groups=w * 6, stride=2)
        self.conv_4 = MFResidual([
            MFDepthWise(w * 4, w * 4, w * 4, w * 4, groups=w * 4, residual=True,
                        se_reduct=(w if (se and i == 2) else 0))
            for i in range(3)
        ])
        self.conv_45 = MFDepthWise(w * 4, w * 8, w * 8, w * 4, groups=w * 8, stride=2)
        self.conv_5 = MFResidual([
            MFDepthWise(w * 4, w * 4, w * 4, w * 4, groups=w * 4, residual=True,
                        se_reduct=(w if se else 0))
            for i in range(1)
        ])
        self.conv_6_sep = MFConvBlock(w * 4, w * 16)
        kh, kw = (input_hw[0] + 15) // 16, (input_hw[1] + 15) // 16
        self.conv_6_dw = MFLinearBlock(w * 16, w * 16, kernel=(kh, kw),
                                       groups=w * 16)
        self.linear = nn.Linear(w * 16, emb, bias=False)
        self.bn = nn.BatchNorm1d(emb)
        self.drop = nn.Dropout(0.0)
        self.prob = nn.Linear(emb, num_classes, bias=False)

    def forward(self, x):
        x = self.conv2_dw(self.conv1(x))
        x = self.conv_3(self.conv_23(x))
        x = self.conv_4(self.conv_34(x))
        x = self.conv_5(self.conv_45(x))
        x = self.conv_6_dw(self.conv_6_sep(x))
        x = torch.flatten(x, 1)
        x = self.bn(self.linear(x))
        return self.prob(self.drop(x))


# ---------------------------------------------------------------------------
# randomization helper
# ---------------------------------------------------------------------------


def randomize_state_dict(module: nn.Module, seed: int = 0):
    """Randomize every tensor (params AND running stats) reproducibly.

    Keeps activations well-conditioned through deep forwards so float-error
    comparisons stay meaningful: conv/linear weights fan-in scaled
    (N(0, 1/sqrt(fan_in))), BN weights ~ 1 + N(0, 0.1), running stats near
    standard, 1-D tensors (biases, PReLU slopes) ~ N(0, 0.1).
    """
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for key, t in sd.items():
        if t.dtype not in (torch.float32, torch.float64):
            continue
        if key.endswith("running_var"):
            t.copy_(torch.rand(t.shape, generator=g) + 0.5)
        elif key.endswith("running_mean"):
            t.copy_(torch.randn(t.shape, generator=g) * 0.1)
        elif t.ndim >= 2:
            fan_in = int(np.prod(t.shape[1:]))
            t.copy_(torch.randn(t.shape, generator=g) / max(fan_in, 1) ** 0.5)
        elif key.endswith(".weight"):  # BN scale / PReLU slope
            t.copy_(1.0 + torch.randn(t.shape, generator=g) * 0.1)
        else:
            t.copy_(torch.randn(t.shape, generator=g) * 0.1)
    module.load_state_dict(sd)
    module.eval()
    return module


# ---------------------------------------------------------------------------
# OpenAI-CLIP-layout visual tower
# ---------------------------------------------------------------------------


class CLIPResblockMirror(nn.Module):
    """CLIP transformer resblock: pre-LN attention + QuickGELU MLP."""

    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.mlp.c_fc(self.ln_2(x))
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        return x + self.mlp.c_proj(y)


class CLIPVisualMirror(nn.Module):
    """OpenAI CLIP visual tower layout (keys under `visual.`), plus an
    optional fine-tuned classifier `head` on the projected embedding --
    the structure rs_face_detection_tpu.models.vit's clip_* configs mirror.
    """

    def __init__(self, patch=16, width=64, depth=2, heads=2, proj_dim=32,
                 input_res=224, num_classes=2):
        super().__init__()
        visual = nn.Module()
        visual.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        n = (input_res // patch) ** 2
        visual.class_embedding = nn.Parameter(torch.zeros(width))
        visual.positional_embedding = nn.Parameter(torch.zeros(n + 1, width))
        visual.ln_pre = nn.LayerNorm(width)
        transformer = nn.Module()
        transformer.resblocks = nn.ModuleList(
            [CLIPResblockMirror(width, heads) for _ in range(depth)]
        )
        visual.transformer = transformer
        visual.ln_post = nn.LayerNorm(width)
        visual.proj = nn.Parameter(torch.zeros(width, proj_dim))
        self.visual = visual
        self.head = nn.Linear(proj_dim, num_classes)

    def forward(self, x):
        v = self.visual
        x = v.conv1(x)  # (B, W, H/P, W/P)
        b, w = x.shape[0], x.shape[1]
        x = x.reshape(b, w, -1).permute(0, 2, 1)  # (B, N, W)
        cls = v.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding
        x = v.ln_pre(x)
        for blk in v.transformer.resblocks:
            x = blk(x)
        x = v.ln_post(x[:, 0])
        x = x @ v.proj
        return self.head(x)


# ---------------------------------------------------------------------------
# mmdet-layout SCRFD (insightface training fork conventions)
# ---------------------------------------------------------------------------


class MMBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, eps=1e-5)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(identity + y)


class MMConvModule(nn.Module):
    """mmdet ConvModule: conv (+bias iff no norm) + optional GN + ReLU."""

    def __init__(self, inp, oup, k=3, stride=1, gn_groups=None, relu=True):
        super().__init__()
        self.conv = nn.Conv2d(inp, oup, k, stride, k // 2, bias=gn_groups is None)
        self.gn = nn.GroupNorm(gn_groups, oup, eps=1e-5) if gn_groups else None
        self.act = nn.ReLU(inplace=True) if relu else None

    def forward(self, x):
        x = self.conv(x)
        if self.gn is not None:
            x = self.gn(x)
        return self.act(x) if self.act is not None else x


class MMScale(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(()))

    def forward(self, x):
        return x * self.scale


class SCRFDMirror(nn.Module):
    """mmdet-layout SCRFD: deep-stem ResNet + PAFPN + shared GN head.

    Key naming matches the insightface mmdet fork conventions documented in
    rs_face_detection_tpu/models/scrfd_import.py (backbone.stem.*,
    backbone.layer*.*, neck.{lateral,fpn,downsample,pafpn}_convs.*,
    bbox_head.{cls,reg}_convs.0.*, bbox_head.stride_{cls,reg,kps}.*,
    bbox_head.scales.*); widths are parameterized so the shape-derived
    importer is exercised on arbitrary configs.
    """

    def __init__(self, width=8, stage_blocks=(2, 2, 2, 2), neck_out=16,
                 stacked_convs=2, num_anchors=2, use_kps=True,
                 stride_key_style="plain"):
        super().__init__()
        w = width
        backbone = nn.Module()
        backbone.stem = nn.Sequential(
            nn.Conv2d(3, w // 2, 3, 2, 1, bias=False),
            nn.BatchNorm2d(w // 2, eps=1e-5), nn.ReLU(inplace=True),
            nn.Conv2d(w // 2, w // 2, 3, 1, 1, bias=False),
            nn.BatchNorm2d(w // 2, eps=1e-5), nn.ReLU(inplace=True),
            nn.Conv2d(w // 2, w, 3, 1, 1, bias=False),
            nn.BatchNorm2d(w, eps=1e-5), nn.ReLU(inplace=True),
        )
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        planes = [w, w * 2, w * 4, w * 8]
        inplanes = w
        for s, blocks in enumerate(stage_blocks):
            layers = []
            for b in range(blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                down = None
                if stride != 1 or inplanes != planes[s]:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes[s], 1, stride, bias=False),
                        nn.BatchNorm2d(planes[s], eps=1e-5),
                    )
                layers.append(MMBasicBlock(inplanes, planes[s], stride, down))
                inplanes = planes[s]
            setattr(backbone, f"layer{s + 1}", nn.Sequential(*layers))
        self.backbone = backbone
        self.stage_blocks = stage_blocks

        neck = nn.Module()
        ins = planes[1:]
        neck.lateral_convs = nn.ModuleList(
            [MMConvModule(c, neck_out, 1, relu=False) for c in ins]
        )
        neck.fpn_convs = nn.ModuleList(
            [MMConvModule(neck_out, neck_out, 3, relu=False) for _ in ins]
        )
        neck.downsample_convs = nn.ModuleList(
            [MMConvModule(neck_out, neck_out, 3, 2, relu=False) for _ in ins[1:]]
        )
        neck.pafpn_convs = nn.ModuleList(
            [MMConvModule(neck_out, neck_out, 3, relu=False) for _ in ins[1:]]
        )
        self.neck = neck

        head = nn.Module()
        gn = 16 if neck_out % 16 == 0 else 4  # mmdet SCRFD convention (16)
        head.cls_convs = nn.ModuleList([nn.ModuleList(
            [MMConvModule(neck_out, neck_out, 3, gn_groups=gn)
             for _ in range(stacked_convs)])])
        head.reg_convs = nn.ModuleList([nn.ModuleList(
            [MMConvModule(neck_out, neck_out, 3, gn_groups=gn)
             for _ in range(stacked_convs)])])
        strides = (8, 16, 32)
        keyfmt = (lambda s: str(s)) if stride_key_style == "plain" else (
            lambda s: f"({s}, {s})")
        head.stride_cls = nn.ModuleDict(
            {keyfmt(s): nn.Conv2d(neck_out, num_anchors, 3, 1, 1) for s in strides}
        )
        head.stride_reg = nn.ModuleDict(
            {keyfmt(s): nn.Conv2d(neck_out, num_anchors * 4, 3, 1, 1) for s in strides}
        )
        if use_kps:
            head.stride_kps = nn.ModuleDict(
                {keyfmt(s): nn.Conv2d(neck_out, num_anchors * 10, 3, 1, 1)
                 for s in strides}
            )
        head.scales = nn.ModuleList([MMScale() for _ in strides])
        self.bbox_head = head
        self.strides = strides
        self.use_kps = use_kps
        self.keyfmt = keyfmt

    def forward(self, x):
        x = self.maxpool(self.backbone.stem(x))
        feats = []
        for s in range(len(self.stage_blocks)):
            x = getattr(self.backbone, f"layer{s + 1}")(x)
            feats.append(x)
        inputs = feats[1:]

        laterals = [l(f) for l, f in zip(self.neck.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            up = F.interpolate(laterals[i], scale_factor=2, mode="nearest")
            laterals[i - 1] = laterals[i - 1] + up[
                ..., : laterals[i - 1].shape[2], : laterals[i - 1].shape[3]
            ]
        inter = [c(l) for c, l in zip(self.neck.fpn_convs, laterals)]
        for i in range(len(inter) - 1):
            inter[i + 1] = inter[i + 1] + self.neck.downsample_convs[i](inter[i])
        outs = [inter[0]] + [
            self.neck.pafpn_convs[i](inter[i + 1]) for i in range(len(inter) - 1)
        ]

        results = []
        for i, (stride, feat) in enumerate(zip(self.strides, outs)):
            c = feat
            for mod in self.bbox_head.cls_convs[0]:
                c = mod(c)
            r = feat
            for mod in self.bbox_head.reg_convs[0]:
                r = mod(r)
            key = self.keyfmt(stride)
            score = torch.sigmoid(self.bbox_head.stride_cls[key](c))
            bbox = self.bbox_head.scales[i](self.bbox_head.stride_reg[key](r))
            kps = self.bbox_head.stride_kps[key](r) if self.use_kps else None
            results.append((score, bbox, kps))
        return results

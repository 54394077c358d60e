"""A faithful torch.nn replica of torchvision's EfficientNetV2 topology.

This environment has torch but NO torchvision and no network egress, so the
weight-parity proof (VERDICT round 1, item 2) is built on a replica that
reproduces torchvision's ``EfficientNet`` module tree EXACTLY — same
submodule names, same Sequential indexing, same forward math — following
the public torchvision recipe (torchvision/models/efficientnet.py):

* ``features`` = Sequential: [0] Conv2dNormActivation stem,
  [1..n] per-stage Sequential of (Fused)MBConv blocks, [last] 1x1 head CNA;
* Conv2dNormActivation = Sequential(Conv2d(bias=False), BatchNorm2d, SiLU);
* MBConv.block = Sequential(expand CNA [if expand!=1], depthwise CNA,
  SqueezeExcitation(fc1/fc2 1x1 convs, SiLU, Sigmoid), project CNA(no act));
* FusedMBConv.block = Sequential(fused kxk CNA, 1x1 project CNA(no act))
  or a single kxk CNA when expand == 1;
* residual adds when stride 1 and in_ch == out_ch (stochastic depth is an
  eval no-op); BN eps 1e-3 for V2.

``replica_v2m().state_dict()`` therefore has the byte-identical key set of
``torchvision.models.efficientnet_v2_m().state_dict()``'s ``features.*``
namespace — a REAL key-layout oracle for models/convert.py (reference
network.py:167-170 selects efficientnet_v2_m(IMAGENET1K_V1)).
"""

from __future__ import annotations

import torch
from torch import nn

# (kind, expand, kernel, stride, in_ch, out_ch, layers) — torchvision
# efficientnet_v2_m config (public recipe; mirrors
# shoeprint_image_retrieval_tpu/models/efficientnet.py _V2_CONFIGS["M"])
V2M_ROWS = [
    ("fused", 1, 3, 1, 24, 24, 3),
    ("fused", 4, 3, 2, 24, 48, 5),
    ("fused", 4, 3, 2, 48, 80, 5),
    ("mb", 4, 3, 2, 80, 160, 7),
    ("mb", 6, 3, 1, 160, 176, 14),
    ("mb", 6, 3, 2, 176, 304, 18),
    ("mb", 6, 3, 1, 304, 512, 5),
]

# torchvision efficientnet_v2_s / _l configs (public recipe)
V2S_ROWS = [
    ("fused", 1, 3, 1, 24, 24, 2),
    ("fused", 4, 3, 2, 24, 48, 4),
    ("fused", 4, 3, 2, 48, 64, 4),
    ("mb", 4, 3, 2, 64, 128, 6),
    ("mb", 6, 3, 1, 128, 160, 9),
    ("mb", 6, 3, 2, 160, 256, 15),
]
V2L_ROWS = [
    ("fused", 1, 3, 1, 32, 32, 4),
    ("fused", 4, 3, 2, 32, 64, 7),
    ("fused", 4, 3, 2, 64, 96, 7),
    ("mb", 4, 3, 2, 96, 192, 10),
    ("mb", 6, 3, 1, 192, 224, 19),
    ("mb", 6, 3, 2, 224, 384, 25),
    ("mb", 6, 3, 1, 384, 640, 7),
]

# torchvision EfficientNet V1 scaling recipe: per-variant width/depth
# multipliers applied to the B0 base rows — channels rounded by
# _make_divisible(ch * width, 8), layer counts by ceil(n * depth), stem by
# the same channel rule, head = 4x the last stage's output. BN eps 1e-5.
V1_BASE_ROWS = [
    ("mb", 1, 3, 1, 32, 16, 1),
    ("mb", 6, 3, 2, 16, 24, 2),
    ("mb", 6, 5, 2, 24, 40, 2),
    ("mb", 6, 3, 2, 40, 80, 3),
    ("mb", 6, 5, 1, 80, 112, 3),
    ("mb", 6, 5, 2, 112, 192, 4),
    ("mb", 6, 3, 1, 192, 320, 1),
]
V1_MULTS = {
    "B0": (1.0, 1.0), "B1": (1.0, 1.1), "B2": (1.1, 1.2), "B3": (1.2, 1.4),
    "B4": (1.4, 1.8), "B5": (1.6, 2.2), "B6": (1.8, 2.6), "B7": (2.0, 3.1),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision.models._utils._make_divisible (public recipe)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def v1_rows(variant: str) -> list:
    import math

    width, depth = V1_MULTS[variant]
    return [
        (kind, e, k, s,
         _make_divisible(cin * width), _make_divisible(cout * width),
         int(math.ceil(n * depth)))
        for kind, e, k, s, cin, cout, n in V1_BASE_ROWS
    ]


B1_ROWS = v1_rows("B1")

BN_EPS = 1e-3  # EfficientNetV2; V1 uses 1e-5


def cna(cin: int, cout: int, k: int, s: int, groups: int = 1,
        act: bool = True, eps: float = BN_EPS) -> nn.Sequential:
    layers: list[nn.Module] = [
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout, eps=eps),
    ]
    if act:
        layers.append(nn.SiLU(inplace=True))
    return nn.Sequential(*layers)


class SqueezeExcitation(nn.Module):
    """torchvision ops.SqueezeExcitation: avgpool -> fc1 -> SiLU -> fc2 -> sigmoid."""

    def __init__(self, channels: int, squeeze: int):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, channels, 1)
        self.activation = nn.SiLU(inplace=True)
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s


class MBConv(nn.Module):
    def __init__(self, cin: int, cout: int, k: int, s: int, expand: int,
                 eps: float = BN_EPS):
        super().__init__()
        exp = cin * expand
        layers: list[nn.Module] = []
        if expand != 1:
            layers.append(cna(cin, exp, 1, 1, eps=eps))
        layers.append(cna(exp, exp, k, s, groups=exp, eps=eps))
        layers.append(SqueezeExcitation(exp, max(1, cin // 4)))
        layers.append(cna(exp, cout, 1, 1, act=False, eps=eps))
        self.block = nn.Sequential(*layers)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class FusedMBConv(nn.Module):
    def __init__(self, cin: int, cout: int, k: int, s: int, expand: int,
                 eps: float = BN_EPS):
        super().__init__()
        exp = cin * expand
        if expand != 1:
            self.block = nn.Sequential(
                cna(cin, exp, k, s, eps=eps),
                cna(exp, cout, 1, 1, act=False, eps=eps),
            )
        else:
            self.block = nn.Sequential(cna(cin, cout, k, s, eps=eps))
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class Replica(nn.Module):
    """Carries only ``features`` — the namespace the converter consumes."""

    def __init__(self, rows=V2M_ROWS, head_out: int = 1280, eps: float = BN_EPS):
        super().__init__()
        stages = []
        for kind, expand, k, s, cin, cout, n in rows:
            cls = MBConv if kind == "mb" else FusedMBConv
            blocks = [
                cls(cin if i == 0 else cout, cout, k,
                    s if i == 0 else 1, expand, eps=eps)
                for i in range(n)
            ]
            stages.append(nn.Sequential(*blocks))
        self.features = nn.Sequential(
            cna(3, rows[0][4], 3, 2, eps=eps),
            *stages,
            cna(rows[-1][5], head_out, 1, 1, eps=eps),
        )

    def forward(self, x):
        return self.features(x)


# ---------------------------------------------------------------------------
# VGG replica (torchvision vgg.features: flat Sequential, per-op children)
# ---------------------------------------------------------------------------

_VGG_CFGS = {
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGGReplica(nn.Module):
    def __init__(self, variant: str):
        super().__init__()
        cfg = _VGG_CFGS["VGG19" if variant == "VGG19_BN" else variant]
        bn = variant.endswith("_BN")
        layers: list[nn.Module] = []
        cin = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, 1, 1))
                if bn:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=True))
                cin = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


# ---------------------------------------------------------------------------
# DenseNet-201 replica (torchvision densenet.features: NAMED children)
# ---------------------------------------------------------------------------

class _DenseLayer(nn.Module):
    def __init__(self, cin: int, growth: int = 32, bn_size: int = 4):
        super().__init__()
        mid = bn_size * growth
        self.norm1 = nn.BatchNorm2d(cin)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(mid)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(mid, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(self.relu1(self.norm1(x)))
        y = self.conv2(self.relu2(self.norm2(y)))
        return torch.cat([x, y], 1)


class _Transition(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.norm = nn.BatchNorm2d(cin)
        self.relu = nn.ReLU(inplace=True)
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(self.relu(self.norm(x))))


class DenseNet201Replica(nn.Module):
    def __init__(self, growth: int = 32, blocks=(6, 12, 48, 32), init_ch: int = 64):
        super().__init__()
        from collections import OrderedDict

        feats = OrderedDict()
        feats["conv0"] = nn.Conv2d(3, init_ch, 7, 2, 3, bias=False)
        feats["norm0"] = nn.BatchNorm2d(init_ch)
        feats["relu0"] = nn.ReLU(inplace=True)
        feats["pool0"] = nn.MaxPool2d(3, 2, 1)
        ch = init_ch
        for bi, n in enumerate(blocks):
            block = nn.Sequential()
            for j in range(n):
                block.add_module(f"denselayer{j + 1}", _DenseLayer(ch + j * growth, growth))
            feats[f"denseblock{bi + 1}"] = block
            ch += n * growth
            if bi != len(blocks) - 1:
                feats[f"transition{bi + 1}"] = _Transition(ch, ch // 2)
                ch //= 2
        feats["norm5"] = nn.BatchNorm2d(ch)
        self.features = nn.Sequential(feats)

    def forward(self, x):
        return self.features(x)


def _randomize(model: nn.Module, seed: int) -> nn.Module:
    """Deterministic random weights AND running stats — nontrivial
    running_mean/var catch BN key mix-ups that default (0, 1) stats hide."""
    torch.manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            nn.init.normal_(m.weight, 0.0, 0.05)
            if m.bias is not None:
                nn.init.normal_(m.bias, 0.0, 0.1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.2)
    model.eval()
    return model


def replica_v2m(seed: int = 0) -> Replica:
    return _randomize(Replica(), seed)


def replica_b1(seed: int = 0) -> Replica:
    """torchvision efficientnet_b1 topology (V1 MBConv, BN eps 1e-5,
    head = 4x last stage = 1280)."""
    return _randomize(Replica(rows=B1_ROWS, head_out=1280, eps=1e-5), seed)


def replica_v1(variant: str, seed: int = 0) -> Replica:
    """Any torchvision EfficientNet B-series topology via the public
    width/depth scaling recipe (reference network.py:139-162 selects B1-B7)."""
    rows = v1_rows(variant)
    return _randomize(Replica(rows=rows, head_out=4 * rows[-1][5], eps=1e-5), seed)


def replica_v2(variant: str, seed: int = 0) -> Replica:
    """torchvision efficientnet_v2_{s,m,l} (reference network.py:163-175)."""
    rows = {"S": V2S_ROWS, "M": V2M_ROWS, "L": V2L_ROWS}[variant]
    return _randomize(Replica(rows=rows, head_out=1280, eps=BN_EPS), seed)


def replica_vgg(variant: str, seed: int = 0) -> VGGReplica:
    return _randomize(VGGReplica(variant), seed)


def replica_densenet201(seed: int = 0) -> DenseNet201Replica:
    return _randomize(DenseNet201Replica(), seed)

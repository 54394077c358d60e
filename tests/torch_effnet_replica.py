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

BN_EPS = 1e-3


def cna(cin: int, cout: int, k: int, s: int, groups: int = 1,
        act: bool = True) -> nn.Sequential:
    layers: list[nn.Module] = [
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout, eps=BN_EPS),
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
    def __init__(self, cin: int, cout: int, k: int, s: int, expand: int):
        super().__init__()
        exp = cin * expand
        layers: list[nn.Module] = []
        if expand != 1:
            layers.append(cna(cin, exp, 1, 1))
        layers.append(cna(exp, exp, k, s, groups=exp))
        layers.append(SqueezeExcitation(exp, max(1, cin // 4)))
        layers.append(cna(exp, cout, 1, 1, act=False))
        self.block = nn.Sequential(*layers)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class FusedMBConv(nn.Module):
    def __init__(self, cin: int, cout: int, k: int, s: int, expand: int):
        super().__init__()
        exp = cin * expand
        if expand != 1:
            self.block = nn.Sequential(
                cna(cin, exp, k, s),
                cna(exp, cout, 1, 1, act=False),
            )
        else:
            self.block = nn.Sequential(cna(cin, cout, k, s))
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class Replica(nn.Module):
    """Carries only ``features`` — the namespace the converter consumes."""

    def __init__(self, rows=V2M_ROWS, head_out: int = 1280):
        super().__init__()
        stages = []
        for kind, expand, k, s, cin, cout, n in rows:
            cls = MBConv if kind == "mb" else FusedMBConv
            blocks = [
                cls(cin if i == 0 else cout, cout, k,
                    s if i == 0 else 1, expand)
                for i in range(n)
            ]
            stages.append(nn.Sequential(*blocks))
        self.features = nn.Sequential(
            cna(3, rows[0][4], 3, 2),
            *stages,
            cna(rows[-1][5], head_out, 1, 1),
        )

    def forward(self, x):
        return self.features(x)


def replica_v2m(seed: int = 0) -> Replica:
    """Replica with randomized (but deterministic) weights AND running
    stats — nontrivial running_mean/var catch BN key mix-ups that default
    (0, 1) stats would hide."""
    torch.manual_seed(seed)
    model = Replica()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0.0, 0.2)
    model.eval()
    return model

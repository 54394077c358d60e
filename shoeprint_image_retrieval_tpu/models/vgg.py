"""VGG16 / VGG19 / VGG19-BN backbones in pure JAX (masked batching).

The reference's block indices for VGG slice the torchvision ``features``
children list, in which every conv, BN, ReLU and maxpool is its *own* child
(reference network.py:121-138, 185-186) — e.g. VGG19 has 37 children
(16 conv + 16 relu + 5 pool). The builders here reproduce that exact
per-op children granularity so truncation semantics match.
"""

from __future__ import annotations

from dataclasses import dataclass


from . import layers as L
from .efficientnet import Features

# torchvision cfgs: "D" = VGG16, "E" = VGG19 (number = conv out_ch, M = pool)
_CFGS = {
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


@dataclass
class Conv:
    in_ch: int
    out_ch: int

    def init(self, key):
        return L.init_conv(key, self.out_ch, self.in_ch, 3, bias=True)

    def apply(self, p, x, valid_hw):
        return L.conv2d(x, p["weight"], p["bias"], valid_hw, stride=1, padding=1)


@dataclass
class BatchNorm:
    ch: int
    eps: float = 1e-5

    def init(self, key):
        return L.init_bn(self.ch)

    def apply(self, p, x, valid_hw):
        return L.batchnorm(x, p, valid_hw, self.eps), valid_hw


@dataclass
class ReLU:
    def init(self, key):
        return {}

    def apply(self, p, x, valid_hw):
        return L.relu(x), valid_hw


@dataclass
class MaxPool:
    def init(self, key):
        return {}

    def apply(self, p, x, valid_hw):
        return L.max_pool(x, valid_hw, kernel=2, stride=2)


def vgg(variant: str, batch_norm: bool = False) -> Features:
    cfg = _CFGS["VGG19" if variant == "VGG19_BN" else variant]
    children, out_chs = [], []
    in_ch = 3
    for v in cfg:
        if v == "M":
            children.append(MaxPool())
            out_chs.append(in_ch)
        else:
            children.append(Conv(in_ch, v))
            out_chs.append(v)
            if batch_norm:
                children.append(BatchNorm(v))
                out_chs.append(v)
            children.append(ReLU())
            out_chs.append(v)
            in_ch = v
    return Features(children, out_chs)

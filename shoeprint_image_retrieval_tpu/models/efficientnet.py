"""EfficientNet (B-series) and EfficientNetV2 (S/M/L) backbones in pure JAX.

Frozen, inference-only re-implementations of the torchvision architectures
the reference selects from (reference network.py:139-175), exposed — like the
reference — as a ``features`` children list truncated at an integer block
index (reference network.py:185-186: ``Sequential(features.children()[:block])``).

All ops run through the masked primitives in :mod:`.layers`, so a bucketed,
zero-padded *batch* of differently-sized images produces features exactly
equal to per-image native-shape extraction (the reference's batch-1 loop,
network.py:246-269) — the TPU-first replacement for dynamic shapes.

Topology facts (stage configs, divisible-by-8 width scaling, SE squeeze
ratios, BN eps 1e-5 for V1 / 1e-3 for V2) follow the public torchvision
EfficientNet recipe so torchvision checkpoints can be imported by
:mod:`.convert`. Stochastic depth and dropout are inference no-ops and are
omitted.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax

from . import layers as L


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# ---------------------------------------------------------------------------
# Functional module tree
# ---------------------------------------------------------------------------

@dataclass
class ConvBNAct:
    """Conv2d + BatchNorm2d + optional activation (torchvision
    Conv2dNormActivation)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: str | None = "silu"
    bn_eps: float = 1e-5

    @property
    def padding(self) -> int:
        return (self.kernel - 1) // 2

    def init(self, key):
        return {
            "conv": L.init_conv(key, self.out_ch, self.in_ch, self.kernel,
                                bias=False, groups=self.groups),
            "bn": L.init_bn(self.out_ch),
        }

    def apply(self, p, x, valid_hw):
        x, valid_hw = L.conv2d(
            x, p["conv"]["weight"], None, valid_hw,
            stride=self.stride, padding=self.padding, groups=self.groups,
        )
        x = L.batchnorm(x, p["bn"], valid_hw, self.bn_eps)
        if self.act == "silu":
            x = L.silu(x)
        elif self.act == "relu":
            x = L.relu(x)
        return x, valid_hw


@dataclass
class MBConv:
    """Inverted residual block with SE (torchvision MBConv)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand_ratio: int
    bn_eps: float

    def __post_init__(self):
        self.exp_ch = self.in_ch * self.expand_ratio
        self.use_res = self.stride == 1 and self.in_ch == self.out_ch
        self.squeeze_ch = max(1, self.in_ch // 4)
        self.expand = (
            ConvBNAct(self.in_ch, self.exp_ch, 1, 1, 1, "silu", self.bn_eps)
            if self.expand_ratio != 1 else None
        )
        self.dw = ConvBNAct(self.exp_ch, self.exp_ch, self.kernel, self.stride,
                            self.exp_ch, "silu", self.bn_eps)
        self.project = ConvBNAct(self.exp_ch, self.out_ch, 1, 1, 1, None, self.bn_eps)

    def init(self, key):
        k = jax.random.split(key, 5)
        p = {}
        if self.expand is not None:
            p["expand"] = self.expand.init(k[0])
        p["dw"] = self.dw.init(k[1])
        p["se"] = {
            "fc1": L.init_conv(k[2], self.squeeze_ch, self.exp_ch, 1, bias=True),
            "fc2": L.init_conv(k[3], self.exp_ch, self.squeeze_ch, 1, bias=True),
        }
        p["project"] = self.project.init(k[4])
        return p

    def apply(self, p, x, valid_hw):
        inp, in_valid = x, valid_hw
        if self.expand is not None:
            x, valid_hw = self.expand.apply(p["expand"], x, valid_hw)
        x, valid_hw = self.dw.apply(p["dw"], x, valid_hw)
        x = L.squeeze_excitation(x, p["se"], valid_hw)
        x, valid_hw = self.project.apply(p["project"], x, valid_hw)
        if self.use_res:
            x = x + inp  # same valid region; zeros + zeros outside
        return x, valid_hw


@dataclass
class FusedMBConv:
    """Fused inverted residual (torchvision FusedMBConv, EfficientNetV2)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand_ratio: int
    bn_eps: float

    def __post_init__(self):
        self.exp_ch = self.in_ch * self.expand_ratio
        self.use_res = self.stride == 1 and self.in_ch == self.out_ch
        if self.expand_ratio != 1:
            self.expand = ConvBNAct(self.in_ch, self.exp_ch, self.kernel,
                                    self.stride, 1, "silu", self.bn_eps)
            self.project = ConvBNAct(self.exp_ch, self.out_ch, 1, 1, 1, None, self.bn_eps)
        else:
            self.expand = None
            self.project = ConvBNAct(self.in_ch, self.out_ch, self.kernel,
                                     self.stride, 1, "silu", self.bn_eps)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"project": self.project.init(k2)}
        if self.expand is not None:
            p["expand"] = self.expand.init(k1)
        return p

    def apply(self, p, x, valid_hw):
        inp = x
        if self.expand is not None:
            x, valid_hw = self.expand.apply(p["expand"], x, valid_hw)
        x, valid_hw = self.project.apply(p["project"], x, valid_hw)
        if self.use_res:
            x = x + inp
        return x, valid_hw


@dataclass
class Stage:
    """One stage: a sequence of blocks (a torchvision features child)."""

    blocks: Sequence

    def init(self, key):
        keys = jax.random.split(key, len(self.blocks))
        return {str(i): b.init(k) for i, (b, k) in enumerate(zip(self.blocks, keys))}

    def apply(self, p, x, valid_hw):
        for i, b in enumerate(self.blocks):
            x, valid_hw = b.apply(p[str(i)], x, valid_hw)
        return x, valid_hw


@dataclass
class Features:
    """The ``features`` children list; supports reference-style truncation."""

    children: Sequence
    out_channels: Sequence[int]  # per child, for planning/tests

    def truncate(self, block: int) -> "Features":
        """``features.children()[:block]`` (reference network.py:185-186)."""
        return Features(self.children[: block], self.out_channels[: block])

    def init(self, key):
        keys = jax.random.split(key, len(self.children))
        return {str(i): c.init(k) for i, (c, k) in enumerate(zip(self.children, keys))}

    def apply(self, p, x, valid_hw):
        for i, c in enumerate(self.children):
            x, valid_hw = c.apply(p[str(i)], x, valid_hw)
        return x, valid_hw


# ---------------------------------------------------------------------------
# Architecture configs
# ---------------------------------------------------------------------------

# (block_kind, expand, kernel, stride, in_ch, out_ch, layers) at 1.0 width/depth
_V1_BASE = [
    ("mb", 1, 3, 1, 32, 16, 1),
    ("mb", 6, 3, 2, 16, 24, 2),
    ("mb", 6, 5, 2, 24, 40, 2),
    ("mb", 6, 3, 2, 40, 80, 3),
    ("mb", 6, 5, 1, 80, 112, 3),
    ("mb", 6, 5, 2, 112, 192, 4),
    ("mb", 6, 3, 1, 192, 320, 1),
]

_V1_MULTS = {  # width_mult, depth_mult
    "B0": (1.0, 1.0), "B1": (1.0, 1.1), "B2": (1.1, 1.2), "B3": (1.2, 1.4),
    "B4": (1.4, 1.8), "B5": (1.6, 2.2), "B6": (1.8, 2.6), "B7": (2.0, 3.1),
}

_V2_CONFIGS = {
    "S": [
        ("fused", 1, 3, 1, 24, 24, 2),
        ("fused", 4, 3, 2, 24, 48, 4),
        ("fused", 4, 3, 2, 48, 64, 4),
        ("mb", 4, 3, 2, 64, 128, 6),
        ("mb", 6, 3, 1, 128, 160, 9),
        ("mb", 6, 3, 2, 160, 256, 15),
    ],
    "M": [
        ("fused", 1, 3, 1, 24, 24, 3),
        ("fused", 4, 3, 2, 24, 48, 5),
        ("fused", 4, 3, 2, 48, 80, 5),
        ("mb", 4, 3, 2, 80, 160, 7),
        ("mb", 6, 3, 1, 160, 176, 14),
        ("mb", 6, 3, 2, 176, 304, 18),
        ("mb", 6, 3, 1, 304, 512, 5),
    ],
    "L": [
        ("fused", 1, 3, 1, 32, 32, 4),
        ("fused", 4, 3, 2, 32, 64, 7),
        ("fused", 4, 3, 2, 64, 96, 7),
        ("mb", 4, 3, 2, 96, 192, 10),
        ("mb", 6, 3, 1, 192, 224, 19),
        ("mb", 6, 3, 2, 224, 384, 25),
        ("mb", 6, 3, 1, 384, 640, 7),
    ],
}


def _build_stages(rows, bn_eps: float) -> tuple[list, list[int]]:
    stages, out_chs = [], []
    for kind, expand, kernel, stride, in_ch, out_ch, n in rows:
        blocks = []
        for i in range(n):
            cls = MBConv if kind == "mb" else FusedMBConv
            blocks.append(
                cls(in_ch if i == 0 else out_ch, out_ch, kernel,
                    stride if i == 0 else 1, expand, bn_eps)
            )
        stages.append(Stage(blocks))
        out_chs.append(out_ch)
    return stages, out_chs


def efficientnet_v1(variant: str) -> Features:
    width, depth = _V1_MULTS[variant]
    bn_eps = 1e-5
    rows = []
    for kind, e, k, s, cin, cout, n in _V1_BASE:
        rows.append((
            kind, e, k, s,
            make_divisible(cin * width), make_divisible(cout * width),
            int(math.ceil(n * depth)),
        ))
    stages, out_chs = _build_stages(rows, bn_eps)
    stem_ch = rows[0][4]
    head_in = rows[-1][5]
    head_out = 4 * head_in
    children = (
        [ConvBNAct(3, stem_ch, 3, 2, 1, "silu", bn_eps)]
        + stages
        + [ConvBNAct(head_in, head_out, 1, 1, 1, "silu", bn_eps)]
    )
    return Features(children, [stem_ch] + out_chs + [head_out])


def efficientnet_v2(variant: str) -> Features:
    bn_eps = 1e-3
    rows = [(k, e, kk, s, cin, cout, n) for (k, e, kk, s, cin, cout, n) in _V2_CONFIGS[variant]]
    stages, out_chs = _build_stages(rows, bn_eps)
    stem_ch = rows[0][4]
    head_in = rows[-1][5]
    children = (
        [ConvBNAct(3, stem_ch, 3, 2, 1, "silu", bn_eps)]
        + stages
        + [ConvBNAct(head_in, 1280, 1, 1, 1, "silu", bn_eps)]
    )
    return Features(children, [stem_ch] + out_chs + [1280])

"""DenseNet-201 backbone in pure JAX (masked batching).

Reproduces the torchvision DenseNet ``features`` children granularity so the
reference's truncation indices line up (reference network.py:176-179,
185-186): children are ``[conv0, norm0, relu0, pool0, denseblock1,
transition1, denseblock2, transition2, denseblock3, transition3,
denseblock4, norm5]`` — 12 children.

Each dense layer computes BN-ReLU-Conv1x1(bottleneck) -> BN-ReLU-Conv3x3 and
concatenates its ``growth_rate`` new channels onto the running feature map;
transitions are BN-ReLU-Conv1x1(half) -> AvgPool2.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import layers as L
from .efficientnet import Features


@dataclass
class Conv0:
    out_ch: int = 64

    def init(self, key):
        return L.init_conv(key, self.out_ch, 3, 7, bias=False)

    def apply(self, p, x, valid_hw):
        return L.conv2d(x, p["weight"], None, valid_hw, stride=2, padding=3)


@dataclass
class Norm:
    ch: int

    def init(self, key):
        return L.init_bn(self.ch)

    def apply(self, p, x, valid_hw):
        return L.batchnorm(x, p, valid_hw, 1e-5), valid_hw


@dataclass
class ReLU0:
    def init(self, key):
        return {}

    def apply(self, p, x, valid_hw):
        return L.relu(x), valid_hw


@dataclass
class Pool0:
    """MaxPool2d(3, 2, padding=1). Follows a ReLU, so masked zeros are safe."""

    def init(self, key):
        return {}

    def apply(self, p, x, valid_hw):
        return L.max_pool(x, valid_hw, kernel=3, stride=2, padding=1)


@dataclass
class DenseLayer:
    in_ch: int
    growth: int = 32
    bn_size: int = 4

    def init(self, key):
        k1, k2 = jax.random.split(key)
        mid = self.bn_size * self.growth
        return {
            "norm1": L.init_bn(self.in_ch),
            "conv1": L.init_conv(k1, mid, self.in_ch, 1, bias=False),
            "norm2": L.init_bn(mid),
            "conv2": L.init_conv(k2, self.growth, mid, 3, bias=False),
        }

    def apply(self, p, x, valid_hw):
        y = L.relu(L.batchnorm(x, p["norm1"], valid_hw, 1e-5))
        y, _ = L.conv2d(y, p["conv1"]["weight"], None, valid_hw, stride=1, padding=0)
        y = L.relu(L.batchnorm(y, p["norm2"], valid_hw, 1e-5))
        y, _ = L.conv2d(y, p["conv2"]["weight"], None, valid_hw, stride=1, padding=1)
        return jnp.concatenate([x, y], axis=1), valid_hw


@dataclass
class DenseBlock:
    in_ch: int
    n_layers: int
    growth: int = 32

    def __post_init__(self):
        self.layers = [
            DenseLayer(self.in_ch + i * self.growth, self.growth)
            for i in range(self.n_layers)
        ]
        self.out_ch = self.in_ch + self.n_layers * self.growth

    def init(self, key):
        keys = jax.random.split(key, len(self.layers))
        return {str(i): l.init(k) for i, (l, k) in enumerate(zip(self.layers, keys))}

    def apply(self, p, x, valid_hw):
        for i, l in enumerate(self.layers):
            x, valid_hw = l.apply(p[str(i)], x, valid_hw)
        return x, valid_hw


@dataclass
class Transition:
    in_ch: int

    def __post_init__(self):
        self.out_ch = self.in_ch // 2

    def init(self, key):
        return {
            "norm": L.init_bn(self.in_ch),
            "conv": L.init_conv(key, self.out_ch, self.in_ch, 1, bias=False),
        }

    def apply(self, p, x, valid_hw):
        x = L.relu(L.batchnorm(x, p["norm"], valid_hw, 1e-5))
        x, valid_hw = L.conv2d(x, p["conv"]["weight"], None, valid_hw, stride=1, padding=0)
        return L.avg_pool(x, valid_hw, kernel=2, stride=2)


def densenet201() -> Features:
    block_cfg = (6, 12, 48, 32)
    growth, init_ch = 32, 64
    children: list = [Conv0(init_ch), Norm(init_ch), ReLU0(), Pool0()]
    out_chs = [init_ch] * 4
    ch = init_ch
    for i, n in enumerate(block_cfg):
        blk = DenseBlock(ch, n, growth)
        children.append(blk)
        ch = blk.out_ch
        out_chs.append(ch)
        if i != len(block_cfg) - 1:
            tr = Transition(ch)
            children.append(tr)
            ch = tr.out_ch
            out_chs.append(ch)
    children.append(Norm(ch))
    out_chs.append(ch)
    return Features(children, out_chs)

"""Offline torchvision checkpoint -> JAX param-tree converter.

The reference loads pretrained torchvision classifiers and truncates their
``features`` (reference network.py:121-191). This environment has no network
egress and no torchvision, so conversion is a two-step offline flow:

1. anywhere with torchvision: ``torch.save(model.state_dict(), f)`` or
   export to ``.npz`` via ``{k: v.numpy() for k, v in sd.items()}``;
2. here: :func:`load_state_dict` + :func:`convert` map the state-dict keys
   onto our functional module tree.

The mapping walks our module structure in lockstep with torchvision's
``features`` child indexing / naming (verified in tests via synthetically
named state dicts shaped like torchvision's). ``convert`` is strict: every
torch ``features.*`` tensor must be consumed and every leaf of our tree must
be filled, so a topology mismatch fails loudly instead of silently degrading
retrieval accuracy.

When no checkpoint is available the registry falls back to seeded random
init (weights.py) — rankings remain deterministic, accuracy is meaningless
until real weights are supplied.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .densenet import Conv0, DenseBlock, Norm, Pool0, ReLU0, Transition
from .efficientnet import ConvBNAct, Features, FusedMBConv, MBConv, Stage
from .vgg import BatchNorm, Conv, MaxPool, ReLU

_BN_KEYS = ("weight", "bias", "running_mean", "running_var")


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load a ``.npz`` (preferred) or torch ``.pth``/``.pt`` state dict."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # torch-cpu is available in this image

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


class _Taker:
    """Strict key consumer over the ``features.`` namespace."""

    def __init__(self, sd: dict[str, np.ndarray]):
        self.sd = {k: v for k, v in sd.items() if k.startswith("features.")}
        self.used: set[str] = set()

    def take(self, key: str) -> jnp.ndarray:
        if key not in self.sd:
            raise KeyError(f"checkpoint is missing {key!r}")
        self.used.add(key)
        return jnp.asarray(self.sd[key], jnp.float32)

    def bn(self, prefix: str) -> dict:
        return {k: self.take(f"{prefix}.{k}") for k in _BN_KEYS}

    def conv(self, key_prefix: str, bias: bool) -> dict:
        p = {"weight": self.take(f"{key_prefix}.weight")}
        if bias:
            p["bias"] = self.take(f"{key_prefix}.bias")
        return p

    def finish(self, truncated: bool) -> None:
        leftovers = set(self.sd) - self.used
        if leftovers and not truncated:
            raise ValueError(f"unconsumed checkpoint tensors: {sorted(leftovers)[:8]}...")


def _convert_cna(t: _Taker, prefix: str) -> dict:
    """Conv2dNormActivation: child 0 = conv, child 1 = bn."""
    return {"conv": t.conv(f"{prefix}.0", bias=False), "bn": t.bn(f"{prefix}.1")}


def _convert_mbconv(t: _Taker, prefix: str, m: MBConv) -> dict:
    i = 0
    p: dict = {}
    if m.expand is not None:
        p["expand"] = _convert_cna(t, f"{prefix}.block.{i}")
        i += 1
    p["dw"] = _convert_cna(t, f"{prefix}.block.{i}")
    i += 1
    p["se"] = {
        "fc1": t.conv(f"{prefix}.block.{i}.fc1", bias=True),
        "fc2": t.conv(f"{prefix}.block.{i}.fc2", bias=True),
    }
    i += 1
    p["project"] = _convert_cna(t, f"{prefix}.block.{i}")
    return p


def _convert_fused(t: _Taker, prefix: str, m: FusedMBConv) -> dict:
    if m.expand is not None:
        return {
            "expand": _convert_cna(t, f"{prefix}.block.0"),
            "project": _convert_cna(t, f"{prefix}.block.1"),
        }
    return {"project": _convert_cna(t, f"{prefix}.block.0")}


_DENSENET_CHILD_NAMES = [
    "conv0", "norm0", "relu0", "pool0",
    "denseblock1", "transition1", "denseblock2", "transition2",
    "denseblock3", "transition3", "denseblock4", "norm5",
]


def convert(features: Features, sd: dict[str, np.ndarray], truncated: bool = False) -> dict:
    """Map a torchvision ``features.*`` state dict onto ``features.init()``'s tree.

    Args:
        features: (possibly truncated) module tree from the registry builder.
        sd: torchvision state dict as numpy arrays.
        truncated: allow unconsumed tensors past the truncation point.
    """
    t = _Taker(sd)
    params: dict = {}
    dense_names = _DENSENET_CHILD_NAMES if _is_densenet(features) else None

    for i, child in enumerate(features.children):
        if dense_names is not None:
            prefix = f"features.{dense_names[i]}"
        else:
            prefix = f"features.{i}"

        if isinstance(child, ConvBNAct):
            params[str(i)] = _convert_cna(t, prefix)
        elif isinstance(child, Stage):
            params[str(i)] = {
                str(j): (
                    _convert_mbconv(t, f"{prefix}.{j}", b)
                    if isinstance(b, MBConv)
                    else _convert_fused(t, f"{prefix}.{j}", b)
                )
                for j, b in enumerate(child.blocks)
            }
        elif isinstance(child, Conv):  # VGG conv has bias
            params[str(i)] = t.conv(prefix, bias=True)
        elif isinstance(child, (BatchNorm, Norm)):
            params[str(i)] = t.bn(prefix)
        elif isinstance(child, (ReLU, MaxPool, ReLU0, Pool0)):
            params[str(i)] = {}
        elif isinstance(child, Conv0):
            params[str(i)] = {"weight": t.take(f"{prefix}.weight")}
        elif isinstance(child, DenseBlock):
            params[str(i)] = {
                str(j): {
                    "norm1": t.bn(f"{prefix}.denselayer{j + 1}.norm1"),
                    "conv1": {"weight": t.take(f"{prefix}.denselayer{j + 1}.conv1.weight")},
                    "norm2": t.bn(f"{prefix}.denselayer{j + 1}.norm2"),
                    "conv2": {"weight": t.take(f"{prefix}.denselayer{j + 1}.conv2.weight")},
                }
                for j in range(len(child.layers))
            }
        elif isinstance(child, Transition):
            params[str(i)] = {
                "norm": t.bn(f"{prefix}.norm"),
                "conv": {"weight": t.take(f"{prefix}.conv.weight")},
            }
        else:
            raise TypeError(f"no converter for {type(child).__name__}")

    t.finish(truncated)
    return params


def _is_densenet(features: Features) -> bool:
    return any(isinstance(c, (DenseBlock, Conv0)) for c in features.children)

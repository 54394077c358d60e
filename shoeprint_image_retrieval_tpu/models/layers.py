"""Masked CNN primitives: batched padded extraction == native extraction.

The reference extracts features one image at a time because every image has
its own size (reference network.py:210-269: batch of 1, variable H×W, one
CUDA round-trip per image). On TPU that design is poison: dynamic shapes mean
one XLA compile per image and batch-1 convs starve the MXU.

This module makes *bucketed batching exact*: all images of a size cluster are
zero-padded onto one canvas and pushed through the backbone as a single NCHW
batch, threading per-sample valid sizes ``(Hv, Wv)`` through every layer.
The invariant maintained after every op:

    ``out[:, :, :Hv', :Wv']`` equals the op applied to the native-shape input,
    and ``out`` is exactly zero outside the valid region.

Why this is exact (not approximate):

* conv: a valid output position's window only reads inputs that are either
  valid or zero — identical to the implicit zero padding of the native conv.
  Positions beyond the native output extent are re-zeroed (they would
  otherwise leak into deeper layers' boundary windows).
* batchnorm (inference): affine shift breaks zeros -> re-zero after.
* silu/relu/sigmoid-mul: zero-preserving, no remask needed.
* max/avg pool: valid output windows lie fully inside the valid region except
  boundary windows, where torch ignores padding (maxpool) or, for the
  networks used here, pooling always follows a ReLU so our zero padding
  cannot win a max. Outputs beyond the native extent are re-zeroed.
* squeeze-excitation: global average pooling uses the *masked* sum divided by
  the per-sample valid pixel count — exactly the native mean.

All convs use ``jax.lax.conv_general_dilated`` with torch-style symmetric
padding so XLA lowers them onto the MXU; f32 accumulation via
``precision='highest'`` keeps the downstream NCC rankings stable.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


def conv_out_size(size, kernel: int, stride: int, padding: int):
    """torch Conv2d/Pool2d size rule: floor((n + 2p - k) / s) + 1."""
    return (size + 2 * padding - kernel) // stride + 1


# Conv MXU precision, selected by tpu.precision:
# "float32" -> HIGHEST (reference-grade, torch-parity <=1e-4);
# "bfloat16" -> DEFAULT (single-pass bf16 multiplies, ~2e-3 relative
# feature deviation, measured ~1.6x faster extraction convs on v5e —
# ranking-stable in practice but outside the strict parity contract).
#
# Held in a ContextVar, not a module global: ``conv2d`` reads it at
# jit-TRACE time, so the engine enters :func:`conv_precision` INSIDE the
# jitted step body — every trace (including shape-driven retraces long
# after construction) then binds the precision of ITS OWN pipeline, and
# two Pipelines with different tpu.precision can coexist in one process.
_CONV_PRECISION: contextvars.ContextVar[jax.lax.Precision] = contextvars.ContextVar(
    "conv_precision", default=jax.lax.Precision.HIGHEST
)


@contextmanager
def conv_precision(name: str):
    """Bind the conv MXU precision for ops traced within the context."""
    prec = (
        jax.lax.Precision.DEFAULT if name == "bfloat16" else jax.lax.Precision.HIGHEST
    )
    token = _CONV_PRECISION.set(prec)
    try:
        yield
    finally:
        _CONV_PRECISION.reset(token)


def valid_mask(x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, H, W) float mask from per-sample valid sizes (B, 2)."""
    h, w = x.shape[-2], x.shape[-1]
    rows = jnp.arange(h)[None, :, None] < valid_hw[:, 0][:, None, None]
    cols = jnp.arange(w)[None, None, :] < valid_hw[:, 1][:, None, None]
    return (rows & cols)[:, None].astype(x.dtype)


def remask(x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    return x * valid_mask(x, valid_hw)


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    valid_hw: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch-semantics Conv2d on a masked batch. Returns (y, new_valid_hw)."""
    y = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=_CONV_PRECISION.get(),
    )
    if bias is not None:
        y = y + bias[None, :, None, None]
    k = weight.shape[-1]
    new_valid = conv_out_size(valid_hw, k, stride, padding)
    return remask(y, new_valid), new_valid


def batchnorm(x: jnp.ndarray, p: dict, valid_hw: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Inference-mode BatchNorm2d (running stats), re-zeroed outside valid."""
    scale = p["weight"] / jnp.sqrt(p["running_var"] + eps)
    shift = p["bias"] - p["running_mean"] * scale
    y = x * scale[None, :, None, None] + shift[None, :, None, None]
    return remask(y, valid_hw)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)  # silu(0) == 0: mask-preserving


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def max_pool(
    x: jnp.ndarray, valid_hw: jnp.ndarray, *, kernel: int, stride: int, padding: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch MaxPool2d (padding is ignored by max — emulated with -inf)."""
    y = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, kernel, kernel),
        window_strides=(1, 1, stride, stride),
        padding=[(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )
    new_valid = conv_out_size(valid_hw, kernel, stride, padding)
    # Note: boundary windows may read our zero padding, while native maxpool
    # ignores out-of-image cells. Every maxpool in the supported backbones
    # follows a ReLU, so the padded zeros can never exceed the window max
    # except when the true max is 0 — in which case both give 0.
    return remask(y, new_valid), new_valid


def avg_pool(
    x: jnp.ndarray, valid_hw: jnp.ndarray, *, kernel: int, stride: int, padding: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch AvgPool2d with count_include_pad=True (the torchvision default)."""
    y = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, kernel, kernel),
        window_strides=(1, 1, stride, stride),
        padding=[(0, 0), (0, 0), (padding, padding), (padding, padding)],
    ) / (kernel * kernel)
    new_valid = conv_out_size(valid_hw, kernel, stride, padding)
    return remask(y, new_valid), new_valid


def masked_global_mean(x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """(B, C, 1, 1) mean over each sample's valid region — exact SE pooling."""
    total = jnp.sum(x, axis=(-2, -1), keepdims=True)  # padded region is zero
    count = (valid_hw[:, 0] * valid_hw[:, 1]).astype(x.dtype)
    return total / count[:, None, None, None]


def squeeze_excitation(
    x: jnp.ndarray, p: dict, valid_hw: jnp.ndarray
) -> jnp.ndarray:
    """torchvision SqueezeExcitation: pool -> 1x1 -> SiLU -> 1x1 -> sigmoid-scale."""
    s = masked_global_mean(x, valid_hw)
    s = jax.lax.conv_general_dilated(
        s, p["fc1"]["weight"], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["fc1"]["bias"][None, :, None, None]
    s = silu(s)
    s = jax.lax.conv_general_dilated(
        s, p["fc2"]["weight"], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["fc2"]["bias"][None, :, None, None]
    return x * jax.nn.sigmoid(s)  # x is zero outside valid -> stays zero


# ---------------------------------------------------------------------------
# Parameter initializers (used when no converted torchvision weights exist)
# ---------------------------------------------------------------------------

def init_conv(key, out_ch: int, in_ch: int, kernel: int, *, bias: bool, groups: int = 1):
    k1, k2 = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel * kernel
    bound = float(1.0 / np.sqrt(fan_in))
    p = {
        "weight": jax.random.uniform(
            k1, (out_ch, in_ch // groups, kernel, kernel), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), jnp.float32, -bound, bound)
    return p


def init_bn(out_ch: int):
    return {
        "weight": jnp.ones((out_ch,), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
        "running_mean": jnp.zeros((out_ch,), jnp.float32),
        "running_var": jnp.ones((out_ch,), jnp.float32),
    }

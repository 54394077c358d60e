"""Model-input normalization (the reference's torchvision transform stack).

Replicates reference network.py:51-87 and 210-228: ``ToTensor`` scaling to
[0, 1], grayscale channel tripling, and mean/std normalization with the
backbone-specific stats from the registry — as one batched jitted op.

The normalized padded region is re-zeroed: the masked-extraction invariant
(models/layers.py) requires the padding to look exactly like the conv's own
implicit zero padding.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_batch(
    imgs_u8: jnp.ndarray,
    valid_hw: jnp.ndarray,
    mean: tuple[float, float, float],
    std: tuple[float, float, float],
) -> jnp.ndarray:
    """(B, Hc, Wc) u8 grayscale or (B, Hc, Wc, 3) u8 RGB -> (B, 3, Hc, Wc) f32."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    if x.ndim == 3:
        x = jnp.repeat(x[:, None], 3, axis=1)  # gray -> 3ch (network.py:67)
    else:
        x = jnp.moveaxis(x, -1, 1)
    m = jnp.asarray(mean, jnp.float32)[None, :, None, None]
    s = jnp.asarray(std, jnp.float32)[None, :, None, None]
    x = (x - m) / s
    rows = jnp.arange(x.shape[-2])[None, None, :, None] < valid_hw[:, 0][:, None, None, None]
    cols = jnp.arange(x.shape[-1])[None, None, None, :] < valid_hw[:, 1][:, None, None, None]
    return x * (rows & cols)

"""Integral-image sliding-window ("box") sums with *dynamic* window sizes.

The reference computes the local image energy of normalized cross-correlation
with two FFT convolutions against an all-ones kernel of the template's shape
(reference similarity.py:57-62: ``conv(image^2, ones)`` and
``conv(image, ones)`` in ``"same"`` mode). On TPU we replace both with exact
integral-image box sums: one 2-D cumulative sum per gallery print is computed
once and then serves *every* template window size — including sizes that are
traced values — via four gathers per output position. This is both exact
(no FFT roundoff in the energy term) and reusable across the whole
rotation/scale variant sweep.

Geometry: for ``"same"``-mode convolution of an ``(H, W)`` image with an
``(h, w)`` kernel, output position ``y`` sums image rows
``[y - h//2, y + (h-1)//2]`` (clipped to the canvas), and likewise columns.
"""

from __future__ import annotations

import jax.numpy as jnp


def integral_image(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 2-D integral image over the last two axes.

    ``I[..., r, c] = sum(x[..., :r, :c])`` with shape ``(..., H+1, W+1)``.
    Computed in float32; inputs this framework feeds it are zero outside each
    sample's valid region, so window sums never need per-sample clipping.
    """
    c = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    return c


def box_sum_same(
    integral: jnp.ndarray,
    window_h: jnp.ndarray,
    window_w: jnp.ndarray,
) -> jnp.ndarray:
    """Sliding-window sums at ``"same"``-convolution positions.

    Args:
        integral: ``(..., H+1, W+1)`` from :func:`integral_image`.
        window_h, window_w: scalar (possibly traced) window sizes ``h, w``.

    Returns:
        ``(..., H, W)`` where entry ``[y, x]`` is the sum of the source over
        rows ``[y - h//2, y + (h-1)//2]`` and cols ``[x - w//2, x + (w-1)//2]``
        clipped to the canvas — exactly ``convolve(src, ones((h, w)), "same")``
        for sources that vanish outside the canvas.
    """
    H = integral.shape[-2] - 1
    W = integral.shape[-1] - 1
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    lo_y = jnp.clip(ys - window_h // 2, 0, H)
    hi_y = jnp.clip(ys + (window_h - 1) // 2 + 1, 0, H)
    lo_x = jnp.clip(xs - window_w // 2, 0, W)
    hi_x = jnp.clip(xs + (window_w - 1) // 2 + 1, 0, W)

    row_diff = jnp.take(integral, hi_y, axis=-2) - jnp.take(integral, lo_y, axis=-2)
    return jnp.take(row_diff, hi_x, axis=-1) - jnp.take(row_diff, lo_x, axis=-1)

"""Batched, mask-aware normalized cross-correlation (NCC) scoring on TPU.

This is the framework's hot kernel — the TPU-native redesign of the
reference's per-pair, per-channel ``normxcorr`` (reference
similarity.py:26-108), which computes, for every (query, gallery) pair:

    per channel c:   ncc_c = conv(p0_c, flip(t0_c), "same")
                             / sqrt((conv(p0_c^2, 1) - conv(p0_c, 1)^2 / N) * sum(t0_c^2))
    score = max_y,x sum_c ncc_c[y, x] / C

with ``t0``/``p0`` globally demeaned template/image channels, negative local
energies clamped to 0 and non-finite ratios set to 0
(reference similarity.py:48-71), after cropping all feature maps by 2 px per
edge (reference similarity.py:92-93).

TPU-first design (vs. the reference's scipy-FFT-per-pair host loop):

* **Static canvases, dynamic extents.** All gallery prints of a cluster are
  zero-padded onto one ``(Hc, Wc)`` canvas and all query transform variants
  onto one ``(hc, wc)`` canvas; the *valid* sizes are traced scalars. One XLA
  compilation therefore serves every query/variant shape in a cluster — no
  shape-driven recompiles, no host loop.
* **Gallery FFT cache.** ``rfft2`` of each demeaned print and integral images
  of ``p0`` / ``p0^2`` are computed once per cluster and reused by every
  query, rotation and scale variant (the reference recomputes 3 FFTs per
  pair per channel per variant).
* **Exact energy via integral images** (see :mod:`.boxsum`) instead of two
  more FFT convolutions.
* **Channel-block streaming.** The inverse FFTs — the only irreducible
  per-pair work — run under a ``lax.scan`` over channel blocks, keeping the
  live correlation buffer small while the channel-summed score map
  accumulates in f32.

Numerically this reproduces the reference math in float32; rankings (the
quantity the pipeline consumes) are validated against a NumPy/scipy oracle in
``tests/test_ncc.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxsum import box_sum_same, integral_image
from .fft import correlation_fft_shape

EDGE_CROP = 2  # pixels cropped per edge before NCC (reference similarity.py:92-93)


class GalleryCache(NamedTuple):
    """Per-cluster HBM-resident gallery scoring cache (channel-major).

    Attributes:
        phat: ``(C, G, Fh, Fw//2+1)`` complex64 — rfft2 of each demeaned,
            masked, edge-cropped print channel on the correlation canvas.
        int1: ``(C, G, Hc+1, Wc+1)`` float32 — integral images of ``p0``.
        int2: ``(C, G, Hc+1, Wc+1)`` float32 — integral images of ``p0^2``.
        valid_hw: ``(G, 2)`` int32 — per-print valid (H, W) *after* edge crop.
    """

    phat: jnp.ndarray
    int1: jnp.ndarray
    int2: jnp.ndarray
    valid_hw: jnp.ndarray


def _dynamic_mask(canvas_h: int, canvas_w: int, h, w) -> jnp.ndarray:
    rows = jnp.arange(canvas_h)[:, None] < h
    cols = jnp.arange(canvas_w)[None, :] < w
    return (rows & cols).astype(jnp.float32)


def _masked_demean(x: jnp.ndarray, h, w) -> jnp.ndarray:
    """Subtract the per-channel mean over the dynamic valid region; zero outside.

    ``x``: (..., C, Hc, Wc) already zero outside the valid region.
    Matches the reference's global ``np.mean`` demean (similarity.py:48-49)
    for the native-shape array.
    """
    mask = _dynamic_mask(x.shape[-2], x.shape[-1], h, w)
    x = x * mask
    n = (h * w).astype(jnp.float32) if hasattr(h, "astype") else jnp.float32(h * w)
    mean = jnp.sum(x, axis=(-2, -1), keepdims=True) / n
    return (x - mean) * mask


def _flip_valid(t0: jnp.ndarray, h, w) -> jnp.ndarray:
    """Reverse a (..., hc, wc) stack within its dynamic (h, w) valid region.

    Turns correlation into convolution so the frequency-domain product gives
    ``conv(p0, flip(t0))`` exactly as the reference computes it
    (similarity.py:50-55).
    """
    hc, wc = t0.shape[-2], t0.shape[-1]
    ridx = jnp.clip(h - 1 - jnp.arange(hc), 0, hc - 1)
    cidx = jnp.clip(w - 1 - jnp.arange(wc), 0, wc - 1)
    out = jnp.take(jnp.take(t0, ridx, axis=-2), cidx, axis=-1)
    return out * _dynamic_mask(hc, wc, h, w)


def build_gallery_cache(
    prints: jnp.ndarray,
    valid_hw: jnp.ndarray,
    template_canvas_hw: tuple[int, int],
    channel_block: int = 16,
) -> tuple[GalleryCache, tuple[int, int]]:
    """Precompute the reusable gallery half of the NCC math.

    Args:
        prints: ``(G, C, Hraw, Wraw)`` float32 feature maps, zero-padded
            beyond each print's valid extent.
        valid_hw: ``(G, 2)`` int32 valid (H, W) per print (pre-crop).
        template_canvas_hw: post-crop template canvas — bounds the
            correlation FFT size.
        channel_block: channel padding granularity for the scoring scan.

    Returns:
        (cache, fft_shape).
    """
    g, c, hraw, wraw = prints.shape
    hc, wc = hraw - 2 * EDGE_CROP, wraw - 2 * EDGE_CROP
    fft_shape = correlation_fft_shape((hc, wc), template_canvas_hw)

    p = prints[:, :, EDGE_CROP : EDGE_CROP + hc, EDGE_CROP : EDGE_CROP + wc]
    v = valid_hw - 2 * EDGE_CROP  # crop removes EDGE_CROP px from both ends of each axis

    def per_print(pm, vhw):
        p0 = _masked_demean(pm, vhw[0], vhw[1])
        phat = jnp.fft.rfft2(p0, fft_shape)
        return p0, phat

    p0, phat = jax.vmap(per_print)(p, v)  # (G, C, ...)

    c_pad = -(-c // channel_block) * channel_block
    if c_pad != c:
        p0 = jnp.pad(p0, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
        phat = jnp.pad(phat, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))

    cache = GalleryCache(
        phat=jnp.transpose(phat, (1, 0, 2, 3)),
        int1=jnp.transpose(integral_image(p0), (1, 0, 2, 3)),
        int2=jnp.transpose(integral_image(p0 * p0), (1, 0, 2, 3)),
        valid_hw=v.astype(jnp.int32),
    )
    return cache, fft_shape


def score_one_template(
    cache: GalleryCache,
    template: jnp.ndarray,
    template_valid_hw: jnp.ndarray,
    *,
    true_channels: int,
    channel_block: int = 16,
) -> jnp.ndarray:
    """Score one query transform variant against every cached gallery print.

    Args:
        cache: gallery cache from :func:`build_gallery_cache`.
        template: ``(C, hraw, wraw)`` float32 variant feature maps,
            zero-padded beyond the valid extent (channels may be zero-padded
            to the cache's padded channel count).
        template_valid_hw: ``(2,)`` int32 valid (h, w) (pre-crop, traced ok).
        true_channels: real channel count C (score divides by it — reference
            similarity.py:108).
        channel_block: must match the cache's.

    Returns:
        ``(G,)`` float32 scores: ``max over valid same-window of the
        channel-summed NCC map / C``.
    """
    c_pad, g = cache.phat.shape[0], cache.phat.shape[1]
    fh, fwr = cache.phat.shape[2], cache.phat.shape[3]
    fw = 2 * (fwr - 1)
    hcg, wcg = cache.int1.shape[-2] - 1, cache.int1.shape[-1] - 1  # gallery canvas

    hct, wct = template.shape[-2] - 2 * EDGE_CROP, template.shape[-1] - 2 * EDGE_CROP
    t = template[:, EDGE_CROP : EDGE_CROP + hct, EDGE_CROP : EDGE_CROP + wct]
    h = template_valid_hw[0] - 2 * EDGE_CROP
    w = template_valid_hw[1] - 2 * EDGE_CROP

    t0 = _masked_demean(t, h, w)
    tsq = jnp.sum(t0 * t0, axis=(-2, -1))  # (C,)
    that = jnp.fft.rfft2(_flip_valid(t0, h, w), (fh, fw))  # (C, fh, fwr)

    n_win = (h * w).astype(jnp.float32)
    sh = (h - 1) // 2
    sw = (w - 1) // 2

    nblk = c_pad // channel_block
    phat_b = cache.phat.reshape(nblk, channel_block, g, fh, fwr)
    int1_b = cache.int1.reshape(nblk, channel_block, g, hcg + 1, wcg + 1)
    int2_b = cache.int2.reshape(nblk, channel_block, g, hcg + 1, wcg + 1)
    that_b = that.reshape(nblk, channel_block, 1, fh, fwr)
    tsq_b = tsq.reshape(nblk, channel_block, 1)

    def block(acc, xs):
        phat_k, int1_k, int2_k, that_k, tsq_k = xs
        conv = jnp.fft.irfft2(phat_k * that_k, (fh, fw))  # (cb, G, fh, fw)
        num = jax.lax.dynamic_slice(
            conv, (0, 0, sh, sw), (channel_block, g, hcg, wcg)
        )
        b1 = box_sum_same(int1_k, h, w)
        b2 = box_sum_same(int2_k, h, w)
        energy = jnp.maximum(b2 - b1 * b1 / n_win, 0.0)
        den = jnp.sqrt(energy * tsq_k[..., None, None])
        r = num / den
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        return acc + jnp.sum(r, axis=0), None

    # Derive the zero init from cache data so its varying-manual-axes type
    # matches the scan carry under shard_map (gallery-sharded scoring).
    acc0 = jnp.zeros((g, hcg, wcg), jnp.float32) + (
        jnp.sum(cache.valid_hw) * 0
    ).astype(jnp.float32)
    summed, _ = jax.lax.scan(block, acc0, (phat_b, int1_b, int2_b, that_b, tsq_b))

    # Max over each print's valid "same" window only (positions past the
    # native extent exist on the shared canvas but not in the reference's
    # per-pair output).
    rows = jnp.arange(hcg)[None, :, None] < cache.valid_hw[:, 0][:, None, None]
    cols = jnp.arange(wcg)[None, None, :] < cache.valid_hw[:, 1][:, None, None]
    masked = jnp.where(rows & cols, summed, -jnp.inf)
    return jnp.max(masked, axis=(-2, -1)) / true_channels


def score_templates(
    cache: GalleryCache,
    templates: jnp.ndarray,
    template_valid_hw: jnp.ndarray,
    *,
    true_channels: int,
    channel_block: int = 16,
) -> jnp.ndarray:
    """:func:`score_one_template` over a stack of variants via ``lax.map``.

    ``lax.map`` (not ``vmap``): each variant is already a large batched FFT
    workload over (channels x gallery), so vectorizing the variant axis adds
    no parallelism worth having — but it multiplies the scan+FFT graph and
    sends TPU compile time from ~2s to minutes. Sequential mapping compiles
    the body once and keeps peak memory at one variant's working set.

    Args:
        templates: ``(V, C, hraw, wraw)``; template_valid_hw: ``(V, 2)``.

    Returns:
        ``(V, G)`` float32 score matrix.
    """
    fn = functools.partial(
        score_one_template,
        cache,
        true_channels=true_channels,
        channel_block=channel_block,
    )
    return jax.lax.map(lambda args: fn(*args), (templates, template_valid_hw))


def normxcorr_same(template: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Single-pair, static-shape NCC map — unit-test surface for the core math.

    Equivalent to the reference's ``normxcorr(template, image, "same")``
    (similarity.py:26-72), built from the same primitives the batched path
    uses.
    """
    th, tw = template.shape
    ih, iw = image.shape
    fshape = correlation_fft_shape((ih, iw), (th, tw))
    t0 = template - jnp.mean(template)
    p0 = image - jnp.mean(image)
    that = jnp.fft.rfft2(jnp.flip(t0), fshape)
    phat = jnp.fft.rfft2(p0, fshape)
    conv = jnp.fft.irfft2(phat * that, fshape)
    num = jax.lax.dynamic_slice(conv, ((th - 1) // 2, (tw - 1) // 2), (ih, iw))
    i1 = integral_image(p0)
    b1 = box_sum_same(i1, jnp.int32(th), jnp.int32(tw))
    b2 = box_sum_same(integral_image(p0 * p0), jnp.int32(th), jnp.int32(tw))
    energy = jnp.maximum(b2 - b1 * b1 / (th * tw), 0.0)
    r = num / jnp.sqrt(energy * jnp.sum(t0 * t0))
    return jnp.where(jnp.isfinite(r), r, 0.0)

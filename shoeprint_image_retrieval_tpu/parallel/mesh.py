"""Device mesh construction and gallery-axis padding.

The reference's only parallelism is single-host fork-join multiprocessing
(reference similarity.py:146-197, dataloader.py:135-172). The TPU build
replaces it with SPMD over a ``jax.sharding.Mesh`` (SURVEY.md section 2.4):
the **gallery axis** is sharded — each chip scores every query variant
against its gallery shard and score rows are all-gathered over ICI — the
context-parallel analog of the reference's replicated-gallery shared memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


GALLERY_AXIS = "gallery"


def build_mesh(n_devices: int = 0) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (0 = all)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (GALLERY_AXIS,))


def pad_gallery_cache(cache, n_shards: int):
    """Zero-pad a gallery cache's gallery axis to a multiple of the mesh size.

    Works for both cache layouts (FFT :class:`~..ops.ncc.GalleryCache` and
    direct :class:`~..ops.ncc_direct.DirectGalleryCache`): all channel-major
    array fields carry the gallery on axis 1, ``valid_hw`` on axis 0.

    Padding prints carry zero content and a small positive valid size, so
    their NCC scores are exactly 0 (zero local energy -> non-finite -> 0,
    the reference's own convention, similarity.py:65-71) and never outrank a
    real print. Returns (padded cache, original gallery size).
    """
    g = cache.valid_hw.shape[0]
    g_pad = -(-g // n_shards) * n_shards
    if g_pad == g:
        return cache, g
    extra = g_pad - g

    def pad_field(name, a):
        if name == "valid_hw":
            return jnp.concatenate([a, jnp.full((extra, 2), 8, a.dtype)])
        return jnp.pad(a, [(0, extra) if i == 1 else (0, 0) for i in range(a.ndim)])

    fields = {k: pad_field(k, v) for k, v in cache._asdict().items()}
    return type(cache)(**fields), g

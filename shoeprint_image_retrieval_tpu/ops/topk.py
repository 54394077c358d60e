"""On-device rank extraction and top-k (the north star's final reduction).

The reference computes each query's true-match rank on the host with a full
descending argsort (reference similarity.py:378-386); the host path here
(:func:`~..metrics.ranks_from_scores`) mirrors that exactly. For large
galleries that means pulling the whole (Q, G) score matrix off the device —
at the 10k-print blocked config that is 40x more bytes over the (slow) host
link than the ranks themselves.

This module keeps the reduction on device:

* :func:`ranks_on_device` — exact 1-based true-match ranks from a
  device-resident score matrix via counting, not sorting: the rank of the
  true match is ``1 + #{scores strictly above it} + #{exact ties ordered
  before it}``. Tie convention: numpy's ``np.flip(np.argsort(row))`` places
  equal keys in descending index order when the underlying sort is stable,
  so ties count as ``g > true_index``. This matches
  ``metrics.ranks_from_scores`` exactly whenever the true match's score is
  untied (every realistic gallery: distinct prints gap at >= 1e-3,
  BASELINE.md rank-stability section) and whenever numpy's introsort
  happens to be stable (always at small G); under exact true-match ties at
  large G numpy's tie order is unspecified and this deterministic
  convention is the documented behavior.
* :func:`topk_on_device` — ``lax.top_k`` score rows for O(Q*k) pulls when
  the top of the ranking itself is wanted (logging, CMC curves), not just
  the true-match ranks.

Both are jit-compatible and shard_map-friendly (pure elementwise + reduce /
``lax.top_k``), so they fuse behind the scoring kernel's output instead of
forcing a host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def ranks_on_device(scores: jnp.ndarray, matching_pairs: jnp.ndarray) -> jnp.ndarray:
    """Exact 1-based true-match ranks, computed on device by counting.

    Args:
        scores: ``(Q, G)`` similarity matrix (higher = better), device array.
        matching_pairs: ``(Q,)`` int32 gallery index of each query's true
            match (reference dataloader.py:97-107).

    Returns:
        ``(Q,)`` int32 ranks — ``metrics.ranks_from_scores`` semantics
        (reference similarity.py:381-386), with the stable descending-index
        tie convention documented in the module docstring.
    """
    pairs = matching_pairs.astype(jnp.int32)
    s_true = jnp.take_along_axis(scores, pairs[:, None], axis=1)  # (Q, 1)
    above = jnp.sum(scores > s_true, axis=1)
    g_idx = jnp.arange(scores.shape[1], dtype=jnp.int32)[None, :]
    tied_before = jnp.sum(
        (scores == s_true) & (g_idx > pairs[:, None]), axis=1
    )
    return (1 + above + tied_before).astype(jnp.int32)


def topk_on_device(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k score rows on device: ``(values (Q, k), gallery indices (Q, k))``.

    ``lax.top_k`` orders ties by ascending index, which matches the
    descending-index-stable rank convention only for untied scores; use
    :func:`ranks_on_device` for exact ranks and this for O(Q*k) score pulls
    (reference similarity.py:381 pulls everything instead).
    """
    vals, idx = lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)

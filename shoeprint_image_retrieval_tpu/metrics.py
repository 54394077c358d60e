"""Ranking + cumulative-match (S-score) metrics.

Semantics mirror the reference exactly:

* rank of the true match = 1-based position of ``matching_pairs[query]`` in
  the descending argsort of that query's similarity row (reference
  similarity.py:378-386),
* ``S_p`` = fraction of queries whose rank <= ``p * total_shoeprints / 100``
  (reference parse_results.py:4-24; note the threshold is *not* rounded, so
  e.g. p=1 with a 50-print gallery gives threshold 0.5 and no query can hit),
* ``cmp_all`` prints one ``S1 .. S20`` line scaled x100 at 2 decimal places
  (reference parse_results.py:27-35).

Rank computation here is vectorized and device-friendly (``jnp`` descending
argsort on the score matrix); the reference loops queries on the host.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def ranks_from_scores(
    scores: np.ndarray,
    matching_pairs: Sequence[int],
) -> np.ndarray:
    """Compute the true-match rank for every query from a score matrix.

    Args:
        scores: ``(n_queries, n_gallery)`` similarity matrix (higher = better).
        matching_pairs: for each query index, the gallery index of its true
            match (reference dataloader.py:97-107).

    Returns:
        ``(n_queries,)`` int32 array of 1-based ranks, identical to the
        reference's ``np.flip(np.argsort(sims))`` position lookup
        (reference similarity.py:381-386).
    """
    scores = np.asarray(scores)
    order = np.flip(np.argsort(scores, axis=1), axis=1)  # descending
    pairs = np.asarray(matching_pairs)
    hit = order == pairs[:, None]
    return (np.argmax(hit, axis=1) + 1).astype(np.int32)


def cmp(
    rankings: Sequence[int],
    p: int,
    total_shoeprints: int,
    total_shoemarks: int,
) -> float:
    """S-score: fraction of queries ranked within the top p% of the gallery.

    Reference parse_results.py:4-24 — the denominator is ``total_shoemarks``
    (which, when called per-cluster by the reference driver, is the *global*
    query count: reference run.py:30-34).
    """
    z = (p * total_shoeprints) / 100
    return sum(1 for rank in rankings if rank <= z) / total_shoemarks


def cmp_all(
    rankings: Sequence[int],
    total_shoeprints: int,
    total_shoemarks: int,
) -> dict[int, float]:
    """Print the S1/S5/S10/S15/S20 line and return the scores.

    Output format matches reference parse_results.py:27-35 character-for-
    character; additionally returns ``{p: score_percent}`` for programmatic use
    (the reference returns ``None``).
    """
    out = {p: cmp(rankings, p, total_shoeprints, total_shoemarks) * 100 for p in (1, 5, 10, 15, 20)}
    print(
        f"S1:{out[1]:.2f} S5:{out[5]:.2f} S10:{out[10]:.2f} "
        f"S15:{out[15]:.2f} S20:{out[20]:.2f}"
    )
    return out

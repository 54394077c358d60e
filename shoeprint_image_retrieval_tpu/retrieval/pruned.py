"""Exact-preserving two-pass pruned scoring (rank-only mode).

CMC consumes only each query's TRUE-MATCH rank (reference
parse_results.py:4-24 counts ranks; similarity.py:378-386 derives the rank
from the score row), so scoring every (query, print) pair at full channel
depth is wasted work for pairs that provably rank below the true match.
``pruned_ranks`` computes exact reference-convention ranks in three passes:

* **pass 0** — exact full-depth true-match scores ``t_q``, batch-diagonal:
  each block of queries is scored only against its own matched prints
  (cost ``Q * batch0`` pairs instead of ``Q * G``);
* **pass 1** — a channel-prefix pass over all pairs: scores on the ``k``
  most energetic channels yield the upper bound
  ``(k * s_k + (C - k)) / C`` on the full score, because at any shift the
  remaining ``C - k`` channels each contribute at most ~1 to the channel
  sum (per-channel NCC is Cauchy-Schwarz-bounded by 1 at full-overlap
  shifts; see *Soundness* below for the border caveat the margin covers);
* **pass 2** — pairs whose bound clears ``t_q - margin`` for at least one
  query survive; survivors are re-scored EXACTLY at full depth and the rank
  counts ``#{exact score > t_q}`` plus the reference's descending-index tie
  convention among survivors. Pruned pairs satisfy
  ``score <= bound < t_q - margin`` and therefore rank strictly below the
  true match — dropping them cannot change its rank.

Soundness
    The per-channel cap of 1 is exact for full-overlap shifts (template
    globally demeaned => windowed numerator is Cauchy-Schwarz-bounded by
    the same local-energy denominator). At partial-overlap border shifts of
    the reference's ``mode="same"`` correlation (reference
    similarity.py:30, 53-59) the cap can be exceeded when a border window
    is near-constant (the local-energy denominator shrinks faster than the
    numerator); ``margin`` absorbs both that and cross-backend float error
    (BASELINE.md rank-stability: <= ~6e-4 absolute between MXU backends).
    Rank identity against the unpruned path is asserted in
    tests/test_pruned.py on random AND planted-match galleries.

Effectiveness (measured honestly — see BASELINE.md round-5)
    The bound prunes pair (q, g) only when ``t_q > (k*s_k + C - k) / C``,
    i.e. the query's true-match score must exceed ``(C - k)/C`` (~0.875 at
    the default k = C/8) minus the prefix's contribution. Real NCC scores
    in this pipeline sit far below that (channel maxima are ~1 but channel
    peaks are misaligned across shifts, so the channel-mean score is
    typically 0.05-0.4), so on realistic data the prune rate is ~0 and the
    mode costs MORE than it saves — it is a prototype shipped for the
    record, default off, with its operating envelope documented where it
    does win (strongly separated galleries: planted matches with
    ``t_q -> 1`` prune the field; see tests + benchmarks/bench_pruned.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from ..metrics import ranks_from_scores

ScoreFn = Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray], np.ndarray]


def channel_order(g_maps: np.ndarray, sample: int = 64) -> np.ndarray:
    """Channels sorted by descending gallery variance (informative-first).

    Any fixed permutation leaves full-depth scores (and therefore ranks)
    unchanged — the channel sum is permutation-invariant — but the prefix
    pass is tighter when the high-energy channels come first. Variance is
    estimated on a gallery sample; zero-padded margins bias all channels
    equally, which is fine for an ordering-only heuristic.
    """
    est = np.asarray(g_maps[: min(sample, len(g_maps))], np.float32)
    return np.argsort(-est.var(axis=(0, 2, 3)), kind="stable").astype(np.int32)


def pruned_ranks(
    score_fn: ScoreFn,
    q_maps: np.ndarray,
    q_valid: np.ndarray,
    g_maps: np.ndarray,
    g_valid: np.ndarray,
    matching_pairs: Sequence[int],
    *,
    k: int = 0,
    margin: float = 5e-3,
    batch0: int = 32,
) -> tuple[np.ndarray, dict]:
    """Exact true-match ranks via bound-pruned scoring.

    Args:
        score_fn: ``(q_maps, q_valid, g_maps, g_valid) -> (Q', G') host
            score matrix`` — the engine's full scoring path (max over the
            configured variant sweep, any backend). Called on channel- and
            gallery-sliced views; per-pair scores must not depend on which
            other pairs share the call (true of every backend here: each
            pair's correlation accumulates independently).
        matching_pairs: gallery index of each query's true match
            (reference dataloader.py:97-107).
        k: channel-prefix depth for pass 1 (0 = auto, ``C // 8``).
        margin: safety slack subtracted from the prune threshold; pairs
            within ``margin`` of the bound are kept, never dropped.
        batch0: pass-0 query block size (diagonal scoring granularity).

    Returns:
        ``(ranks, stats)`` — int32 1-based ranks identical to
        :func:`~..metrics.ranks_from_scores` on the full matrix (tie
        convention of :func:`~..ops.topk.ranks_on_device`), and a stats
        dict: ``prune_rate`` (fraction of (q, g) pairs whose exact pass-2
        scoring was skipped), ``survivors`` (gallery prints scored in pass
        2), ``pair_frac`` (total pairs scored across all passes as a
        fraction of the unpruned ``Q * G`` full-depth equivalent, weighting
        pass 1 by ``k / C``), ``k``.
    """
    q_maps = np.asarray(q_maps)
    pairs = np.asarray(matching_pairs, np.int64)
    Q, C = q_maps.shape[:2]
    G = len(g_maps)
    k = min(int(k) or max(1, C // 8), C)
    if Q == 0:
        return np.zeros(0, np.int32), {
            "prune_rate": 0.0, "survivors": G, "pair_frac": 0.0, "k": k,
        }
    if k >= C:
        # degenerate prefix: pass 1 IS the exact matrix — rank directly
        scores = score_fn(q_maps, q_valid, g_maps, g_valid)
        return ranks_from_scores(scores, pairs), {
            "prune_rate": 0.0, "survivors": G, "pair_frac": 1.0, "k": k,
        }

    perm = channel_order(g_maps)

    # ---- pass 0: exact true-match scores, batch-diagonal ----------------
    # query blocks and their matched-print subsets both pad to batch0 by
    # repeating the last row, so every pass-0 call compiles ONE shape
    # (scores of pad rows/columns are computed and dropped)
    batch0 = min(batch0, Q)
    t = np.empty(Q, np.float32)
    pairs0 = 0
    q_valid = np.asarray(q_valid)
    g_valid_np = np.asarray(g_valid)
    for lo in range(0, Q, batch0):
        hi = min(lo + batch0, Q)
        uniq, inv = np.unique(pairs[lo:hi], return_inverse=True)
        qsel = np.minimum(np.arange(lo, lo + batch0), Q - 1)
        gsel = uniq[np.minimum(np.arange(batch0), len(uniq) - 1)]
        s0 = score_fn(
            q_maps[qsel], q_valid[qsel], g_maps[gsel], g_valid_np[gsel]
        )
        t[lo:hi] = np.asarray(s0)[np.arange(hi - lo), inv]
        pairs0 += (hi - lo) * len(uniq)

    # ---- pass 1: channel-prefix bound over all pairs ---------------------
    ck = perm[:k]
    s_k = np.asarray(
        score_fn(
            np.ascontiguousarray(q_maps[:, ck]), q_valid,
            np.ascontiguousarray(np.asarray(g_maps)[:, ck]), g_valid,
        ),
        np.float32,
    )
    bound = (k * s_k + (C - k)) / C
    keep = bound + np.float32(margin) >= t[:, None]
    surv = np.nonzero(keep.any(axis=0))[0]

    # ---- pass 2: exact scoring of survivors, rank by counting ------------
    if len(surv):
        s2 = np.asarray(
            score_fn(q_maps, q_valid, g_maps[surv], g_valid[surv]),
            np.float32,
        )
        not_self = surv[None, :] != pairs[:, None]
        above = ((s2 > t[:, None]) & not_self).sum(axis=1)
        # reference tie convention (ops/topk.ranks_on_device): equal keys
        # ordered by descending gallery index, so ties at g > true count
        tied = (
            (s2 == t[:, None]) & not_self & (surv[None, :] > pairs[:, None])
        ).sum(axis=1)
        ranks = (1 + above + tied).astype(np.int32)
    else:  # everything pruned: every true match ranks first
        ranks = np.ones(Q, np.int32)

    pair_frac = (
        pairs0 + Q * G * (k / C) + Q * len(surv)
    ) / max(1, Q * G)
    return ranks, {
        "prune_rate": float(1.0 - keep.mean()),
        "survivors": int(len(surv)),
        "pair_frac": float(pair_frac),
        "k": k,
    }

"""Exact-preserving pruned scoring (retrieval/pruned.py).

The contract under test: ``pruned_ranks`` returns ranks IDENTICAL to the
full-matrix reference convention (metrics.ranks_from_scores /
ops/topk.ranks_on_device tie rule) while skipping exact scoring of pairs the
channel-prefix bound proves rank below the true match. Covers:

* counting + tie semantics against a hand-controlled score function,
* rank identity on real NCC scoring (CPU oracle) for random (low
  separation: the bound prunes ~nothing — the honest envelope) and planted
  (high separation: the bound must actually prune) galleries,
* the degenerate k >= C prefix.
"""

import numpy as np
import pytest

from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
from shoeprint_image_retrieval_tpu.retrieval import oracle
from shoeprint_image_retrieval_tpu.retrieval.pruned import (
    channel_order,
    pruned_ranks,
)


def _tagged_maps(n, C, tag_axis_len=4):
    """(n, C, 4, 4) maps whose [i, 0, 0, 0] element encodes index i.

    The fake score function below recovers each row's identity from the
    tag, so tests can drive ``pruned_ranks`` with hand-written score
    matrices while exercising its real slicing (channels never drop
    channel 0 here because the fake channel_order is monkeypatched to
    identity).
    """
    maps = np.zeros((n, C, tag_axis_len, tag_axis_len), np.float32)
    maps[:, 0, 0, 0] = np.arange(n, dtype=np.float32)
    return maps


def _fake_score_fn(full, prefix, C):
    """score_fn returning rows/cols of ``full`` (C channels) or ``prefix``."""

    def fn(qm, qv, gm, gv):
        qi = qm[:, 0, 0, 0].astype(int)
        gi = gm[:, 0, 0, 0].astype(int)
        mat = full if qm.shape[1] == C else prefix
        return mat[np.ix_(qi, gi)]

    return fn


@pytest.fixture()
def identity_order(monkeypatch):
    import shoeprint_image_retrieval_tpu.retrieval.pruned as mod

    monkeypatch.setattr(
        mod, "channel_order",
        lambda g_maps, sample=64: np.arange(g_maps.shape[1], dtype=np.int32),
    )


def test_counting_matches_argsort_on_untied_scores(identity_order):
    C, k = 8, 2
    rng = np.random.default_rng(7)
    full = rng.permutation(np.linspace(0.1, 0.9, 2 * 5)).reshape(2, 5).astype(np.float32)
    pairs = [0, 2]
    # prefix scores high enough that NOTHING prunes: bound >= 1 everywhere
    prefix = np.ones_like(full)
    ranks, stats = pruned_ranks(
        _fake_score_fn(full, prefix, C),
        _tagged_maps(2, C), np.full((2, 2), 4, np.int32),
        _tagged_maps(5, C), np.full((5, 2), 4, np.int32),
        pairs, k=k, margin=1e-3,
    )
    want = ranks_from_scores(full, pairs)
    assert ranks.tolist() == want.tolist()
    assert stats["survivors"] == 5 and stats["prune_rate"] == 0.0


def test_tie_convention_matches_ranks_on_device(identity_order):
    """Exact ties follow the documented descending-index convention of
    ops/topk.ranks_on_device (numpy's introsort tie order is unspecified —
    see the ops/topk module docstring), NOT whatever np.argsort happens to
    produce."""
    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.topk import ranks_on_device

    C, k = 8, 2
    full = np.array(
        [
            [0.90, 0.50, 0.90, 0.90, 0.10],  # pair 0: ties at g=2,3 (> 0)
            [0.20, 0.60, 0.60, 0.95, 0.60],  # pair 2: tie g=1 (<), g=4 (>)
        ],
        np.float32,
    )
    pairs = [0, 2]
    prefix = np.ones_like(full)
    ranks, _ = pruned_ranks(
        _fake_score_fn(full, prefix, C),
        _tagged_maps(2, C), np.full((2, 2), 4, np.int32),
        _tagged_maps(5, C), np.full((5, 2), 4, np.int32),
        pairs, k=k, margin=1e-3,
    )
    want = np.asarray(
        jax.jit(ranks_on_device)(jnp.asarray(full), jnp.asarray(pairs))
    )
    assert ranks.tolist() == want.tolist() == [3, 3]


def test_bound_prunes_and_ranks_stay_exact(identity_order):
    C, k = 8, 4
    rng = np.random.default_rng(3)
    Q, G = 6, 40
    full = rng.uniform(0.0, 0.3, size=(Q, G)).astype(np.float32)
    pairs = list(range(Q))
    full[np.arange(Q), pairs] = 0.95  # strongly separated true matches
    # a consistent prefix: prefix >= full is what real NCC guarantees via
    # the cap-1 bound only after the (k*s_k + C-k)/C map — fabricate s_k so
    # bound ~= full + 0.1 (tight: most of the field prunes)
    prefix = ((full + 0.1) * C - (C - k)) / k
    ranks, stats = pruned_ranks(
        _fake_score_fn(full, prefix.astype(np.float32), C),
        _tagged_maps(Q, C), np.full((Q, 2), 4, np.int32),
        _tagged_maps(G, C), np.full((G, 2), 4, np.int32),
        pairs, k=k, margin=1e-3,
    )
    assert ranks.tolist() == ranks_from_scores(full, pairs).tolist()
    assert stats["prune_rate"] > 0.5
    assert stats["survivors"] < G


def test_everything_pruned_means_rank_one(identity_order):
    C, k = 4, 1
    full = np.full((2, 6), 0.1, np.float32)
    pairs = [1, 4]
    full[[0, 1], pairs] = 0.99
    # prefix so low the bound clears nothing: bound = (k*s + C-k)/C
    prefix = np.full((2, 6), -3.0 * C, np.float32)
    ranks, stats = pruned_ranks(
        _fake_score_fn(full, prefix, C),
        _tagged_maps(2, C), np.full((2, 2), 4, np.int32),
        _tagged_maps(6, C), np.full((6, 2), 4, np.int32),
        pairs, k=k, margin=1e-4,
    )
    assert ranks.tolist() == [1, 1]
    assert stats["survivors"] == 0


def _oracle_score_fn(qm, qv, gm, gv):
    marks = [qm[i] for i in range(len(qm))]
    prints = [gm[i] for i in range(len(gm))]
    return oracle.score_matrix(marks, prints, None, None, "reference")


def _random_maps(rng, n, C, h, w):
    return rng.normal(size=(n, C, h, w)).astype(np.float32)


def test_oracle_random_gallery_rank_identity():
    """Low-separation NCC: prune rate ~0 (the documented honest envelope),
    ranks still exactly the full-matrix reference ranks."""
    rng = np.random.default_rng(0)
    C, h, w = 8, 10, 10
    g = _random_maps(rng, 12, C, h, w)
    q = _random_maps(rng, 4, C, 8, 8)
    pairs = [3, 7, 0, 11]
    valid_q = np.full((4, 2), 8, np.int32)
    valid_g = np.full((12, 2), h, np.int32)
    ranks, stats = pruned_ranks(
        _oracle_score_fn, q, valid_q, g, valid_g, pairs, k=2, margin=5e-3
    )
    want = ranks_from_scores(
        _oracle_score_fn(q, valid_q, g, valid_g), pairs
    )
    assert ranks.tolist() == want.tolist()


def test_oracle_planted_gallery_prunes_and_matches():
    """High separation (queries are copies of their match: per-channel NCC
    hits 1.0 at the aligned shift, t ~= 1): the bound must prune most of
    the field AND the ranks must equal the unpruned reference ranks."""
    rng = np.random.default_rng(1)
    C, h, w = 8, 12, 12
    g = _random_maps(rng, 16, C, h, w)
    pairs = [2, 9, 13]
    q = np.stack([g[p] for p in pairs])
    valid_q = np.full((3, 2), h, np.int32)
    valid_g = np.full((16, 2), h, np.int32)
    ranks, stats = pruned_ranks(
        _oracle_score_fn, q, valid_q, g, valid_g, pairs, k=4, margin=5e-3
    )
    want = ranks_from_scores(
        _oracle_score_fn(q, valid_q, g, valid_g), pairs
    )
    assert ranks.tolist() == want.tolist() == [1, 1, 1]
    assert stats["prune_rate"] > 0.3, stats


def test_degenerate_prefix_scores_fully():
    rng = np.random.default_rng(2)
    C = 4
    g = _random_maps(rng, 6, C, 9, 9)
    q = _random_maps(rng, 2, C, 7, 7)
    pairs = [5, 1]
    ranks, stats = pruned_ranks(
        _oracle_score_fn, q, np.full((2, 2), 7, np.int32),
        g, np.full((6, 2), 9, np.int32), pairs, k=99,
    )
    want = ranks_from_scores(
        _oracle_score_fn(q, None, g, None), pairs
    )
    assert ranks.tolist() == want.tolist()
    assert stats["pair_frac"] == 1.0


def test_channel_order_is_variance_descending():
    rng = np.random.default_rng(4)
    g = rng.normal(size=(5, 6, 8, 8)).astype(np.float32)
    g[:, 2] *= 10.0  # channel 2 dominates
    g[:, 5] *= 5.0
    order = channel_order(g)
    assert order[0] == 2 and order[1] == 5
    assert sorted(order.tolist()) == list(range(6))

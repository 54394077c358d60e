"""On-device rank extraction == host metrics (VERDICT r3 item 4).

``ops.topk.ranks_on_device`` must reproduce ``metrics.ranks_from_scores``
(reference similarity.py:378-386) exactly — including under the exact-tie
structures the zeros-init score floor produces (tied 0.0 rows) — while
pulling only O(Q) bytes instead of the full (Q, G) matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np

from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
from shoeprint_image_retrieval_tpu.ops.topk import ranks_on_device, topk_on_device


def _host_want(scores, pairs):
    return ranks_from_scores(scores, pairs)


def test_ranks_match_host_on_random_matrices():
    rng = np.random.default_rng(0)
    for q, g in [(1, 5), (7, 33), (16, 300), (5, 1024)]:
        scores = rng.normal(size=(q, g)).astype(np.float32)
        pairs = rng.integers(0, g, q).astype(np.int32)
        got = np.asarray(ranks_on_device(jnp.asarray(scores), jnp.asarray(pairs)))
        np.testing.assert_array_equal(got, _host_want(scores, pairs))


def test_ranks_match_host_with_floored_zero_ties():
    """The production regime after the zeros-init floor: many exact-0.0
    entries per row. Ties below the true match cannot move its rank."""
    rng = np.random.default_rng(1)
    scores = np.maximum(rng.normal(size=(6, 40)), 0.0).astype(np.float32)
    # make sure every row has several exact zeros and a strictly-positive max
    assert (scores == 0.0).sum() > 40
    pairs = np.argmax(scores, axis=1).astype(np.int32)
    got = np.asarray(ranks_on_device(jnp.asarray(scores), jnp.asarray(pairs)))
    np.testing.assert_array_equal(got, _host_want(scores, pairs))


def test_ranks_match_host_with_true_match_tied():
    """Exact duplicate of the true match's score (duplicate gallery prints).
    At small G numpy's argsort is stable, so metrics.ranks_from_scores
    realizes the same descending-index tie convention ranks_on_device
    defines; assert identity there."""
    scores = np.asarray(
        [[0.5, 0.9, 0.9, 0.1],
         [0.9, 0.5, 0.9, 0.9]], np.float32
    )
    for pairs in ([1, 0], [2, 2], [0, 3]):
        pairs = np.asarray(pairs, np.int32)
        got = np.asarray(ranks_on_device(jnp.asarray(scores), jnp.asarray(pairs)))
        np.testing.assert_array_equal(got, _host_want(scores, pairs))


def test_blocked_accumulation_then_device_ranks():
    """The 10k-path shape: per-block score columns accumulated into a
    device-resident (Q, G) buffer, ranks computed on device, only Q int32s
    pulled — identical to ranking the host-assembled matrix."""
    rng = np.random.default_rng(2)
    q, g, blk = 4, 64, 16
    scores = rng.normal(size=(q, g)).astype(np.float32)
    pairs = rng.integers(0, g, q).astype(np.int32)

    @jax.jit
    def acc_block(buf, cols, lo):
        return jax.lax.dynamic_update_slice(buf, cols, (0, lo))

    buf = jnp.zeros((q, g), jnp.float32)
    for lo in range(0, g, blk):
        buf = acc_block(buf, jnp.asarray(scores[:, lo : lo + blk]), lo)
    got = np.asarray(jax.jit(ranks_on_device)(buf, jnp.asarray(pairs)))
    np.testing.assert_array_equal(got, _host_want(scores, pairs))
    assert got.nbytes == q * 4  # the only pull the blocked path needs


def test_topk_on_device_values_and_indices():
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(3, 50)).astype(np.float32)
    vals, idx = topk_on_device(jnp.asarray(scores), 5)
    vals, idx = np.asarray(vals), np.asarray(idx)
    order = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_array_equal(vals, np.take_along_axis(scores, order, axis=1))

"""NCC kernel tests vs. the reference-exact NumPy/scipy oracle.

The contract (BASELINE.md): *rankings* must be identical; scores must agree
to float32 tolerance. Tests use small random feature maps with varied,
non-square, odd/even shapes to exercise the same-crop and dynamic-extent
geometry.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import convolve

from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
from shoeprint_image_retrieval_tpu.ops.boxsum import box_sum_same, integral_image
from shoeprint_image_retrieval_tpu.ops.fft import next_fast_fft_size
from shoeprint_image_retrieval_tpu.ops.ncc import (
    build_gallery_cache,
    normxcorr_same,
    score_one_template,
    score_templates,
)
from shoeprint_image_retrieval_tpu.retrieval import oracle


def test_next_fast_fft_size():
    for n in range(1, 600):
        s = next_fast_fft_size(n)
        assert s >= max(n, 4)
        assert s <= 2 * max(n, 2)  # never worse than next pow2
        r = s
        for f in (2, 3, 5):
            while r % f == 0:
                r //= f
        assert r == 1, f"{s} has a large prime factor"
    assert next_fast_fft_size(96) == 96
    assert next_fast_fft_size(128) == 128


@pytest.mark.parametrize("hw", [(5, 5), (4, 6), (7, 3), (1, 8)])
def test_box_sum_matches_ones_convolution(hw):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(13, 17)).astype(np.float32)
    want = convolve(img, np.ones(hw), mode="same")
    got = box_sum_same(integral_image(jnp.asarray(img)), jnp.int32(hw[0]), jnp.int32(hw[1]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "tshape,ishape",
    [((6, 6), (12, 12)), ((5, 7), (11, 14)), ((9, 4), (13, 19)), ((8, 8), (8, 8))],
)
def test_normxcorr_matches_scipy_oracle(tshape, ishape):
    rng = np.random.default_rng(2)
    t = rng.normal(size=tshape).astype(np.float32)
    p = rng.normal(size=ishape).astype(np.float32)
    want = oracle.normxcorr(t, p, "same")
    got = np.asarray(normxcorr_same(jnp.asarray(t), jnp.asarray(p)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def _random_maps(rng, n, c, hw_range):
    out = []
    for _ in range(n):
        h = int(rng.integers(*hw_range))
        w = int(rng.integers(*hw_range))
        out.append(rng.normal(size=(c, h, w)).astype(np.float32))
    return out


def _pad_stack(maps, canvas_hw, c_pad=None):
    c = maps[0].shape[0]
    c_out = c_pad or c
    arr = np.zeros((len(maps), c_out, *canvas_hw), np.float32)
    valid = np.zeros((len(maps), 2), np.int32)
    for i, m in enumerate(maps):
        arr[i, :c, : m.shape[1], : m.shape[2]] = m
        valid[i] = (m.shape[1], m.shape[2])
    return jnp.asarray(arr), jnp.asarray(valid)


def test_batched_scoring_matches_oracle_pairwise():
    """Padded-canvas batched scoring == native per-pair oracle scores."""
    rng = np.random.default_rng(3)
    c = 5
    prints = _random_maps(rng, 7, c, (14, 24))
    marks = _random_maps(rng, 3, c, (10, 18))

    gal, gal_valid = _pad_stack(prints, (26, 26))
    cache, _ = build_gallery_cache(gal, gal_valid, (20 - 4, 20 - 4), channel_block=4)
    tmpl, tmpl_valid = _pad_stack(marks, (20, 20), c_pad=cache.phat.shape[0])

    got = np.asarray(
        score_templates(cache, tmpl, tmpl_valid, true_channels=c, channel_block=4)
    )
    want = np.array(
        [[oracle.pair_similarity(m, p) for p in prints] for m in marks],
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_batched_scoring_rankings_identical_to_oracle():
    rng = np.random.default_rng(4)
    c = 4
    prints = _random_maps(rng, 20, c, (12, 20))
    # queries correlated with a true match so rankings are meaningful
    marks = []
    pairs = []
    for qi in range(6):
        gi = int(rng.integers(0, len(prints)))
        pairs.append(gi)
        src = prints[gi]
        crop = src[:, 1 : 1 + 9, 1 : 1 + 9].copy()
        crop += 0.25 * rng.normal(size=crop.shape).astype(np.float32)
        marks.append(crop)

    gal, gal_valid = _pad_stack(prints, (20, 20))
    cache, _ = build_gallery_cache(gal, gal_valid, (9 - 4, 9 - 4), channel_block=4)
    tmpl, tmpl_valid = _pad_stack(marks, (9, 9), c_pad=cache.phat.shape[0])
    got_scores = np.asarray(
        score_templates(cache, tmpl, tmpl_valid, true_channels=c, channel_block=4)
    )

    want_scores = oracle.score_matrix(marks, prints)
    assert (
        ranks_from_scores(got_scores, pairs).tolist()
        == oracle.rank_queries(want_scores, pairs).tolist()
    )
    # and the true match should mostly rank first given the construction
    assert (ranks_from_scores(got_scores, pairs) == 1).mean() >= 0.8


def test_zero_energy_regions_give_zero_not_nan():
    """Flat image/template regions: division by zero -> 0 (reference
    similarity.py:65-71)."""
    c = 2
    t = np.zeros((c, 8, 8), np.float32)  # flat template: T == 0 everywhere
    p = np.random.default_rng(5).normal(size=(c, 14, 14)).astype(np.float32)
    gal, gv = _pad_stack([p], (14, 14))
    cache, _ = build_gallery_cache(gal, gv, (4, 4), channel_block=2)
    tm, tv = _pad_stack([t], (8, 8), c_pad=cache.phat.shape[0])
    s = np.asarray(score_one_template(cache, tm[0], tv[0], true_channels=c, channel_block=2))
    assert np.isfinite(s).all()
    assert s[0] == 0.0

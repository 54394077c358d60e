"""Direct (MXU conv) NCC scoring vs the reference-exact scipy oracle.

Same contract as tests/test_ncc.py: rankings identical, scores to f32
tolerance — the direct path computes the identical quantity as the FFT path
without FFTs (ops/ncc_direct.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
    VariantGroup,
    build_direct_cache,
    fold_template,
    score_direct,
)
from shoeprint_image_retrieval_tpu.retrieval import oracle


def _random_maps(rng, n, c, hw_range):
    return [
        rng.normal(
            size=(c, int(rng.integers(*hw_range)), int(rng.integers(*hw_range)))
        ).astype(np.float32)
        for _ in range(n)
    ]


def _pad_stack(maps, canvas_hw):
    c = maps[0].shape[0]
    arr = np.zeros((len(maps), c, *canvas_hw), np.float32)
    valid = np.zeros((len(maps), 2), np.int32)
    for i, m in enumerate(maps):
        arr[i, :, : m.shape[1], : m.shape[2]] = m
        valid[i] = m.shape[1:]
    return jnp.asarray(arr), jnp.asarray(valid)


def _groups_from(marks, canvas_hw, kernel_hw):
    """One group per template (sizes differ) — the general case."""
    tmpl, tvalid = _pad_stack(marks, canvas_hw)
    groups = []
    for i in range(len(marks)):
        k = fold_template(tmpl[i], tvalid[i], kernel_hw)
        groups.append(VariantGroup(k[None], tvalid[i] - 4))
    return groups


def test_direct_scores_match_oracle_pairwise():
    rng = np.random.default_rng(3)
    c = 5
    prints = _random_maps(rng, 7, c, (14, 24))
    marks = _random_maps(rng, 3, c, (10, 18))

    gal, gal_valid = _pad_stack(prints, (26, 26))
    cache = build_direct_cache(gal, gal_valid, channel_block=4)
    groups = _groups_from(marks, (20, 20), (16, 16))

    got = np.asarray(score_direct(cache, groups, true_channels=c))
    want = np.array(
        [[oracle.pair_similarity(m, p) for p in prints] for m in marks], np.float32
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_direct_matches_fft_path():
    """Direct and FFT paths agree to f32 tolerance on identical inputs."""
    from shoeprint_image_retrieval_tpu.ops.ncc import build_gallery_cache, score_templates

    rng = np.random.default_rng(5)
    c = 4
    prints = _random_maps(rng, 9, c, (13, 21))
    marks = _random_maps(rng, 4, c, (9, 13))

    gal, gal_valid = _pad_stack(prints, (22, 22))
    fft_cache, _ = build_gallery_cache(gal, gal_valid, (13 - 4, 13 - 4), channel_block=4)
    tmpl, tvalid = _pad_stack(marks, (13, 13))
    tmpl_padded = jnp.pad(tmpl, ((0, 0), (0, fft_cache.phat.shape[0] - c), (0, 0), (0, 0)))
    want = np.asarray(
        score_templates(fft_cache, tmpl_padded, tvalid, true_channels=c, channel_block=4)
    )

    cache = build_direct_cache(gal, gal_valid, channel_block=4)
    groups = _groups_from(marks, (13, 13), (9, 9))
    got = np.asarray(score_direct(cache, groups, true_channels=c))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_direct_group_sharing_matches_per_template():
    """Variants sharing a window size in ONE group == separate groups."""
    rng = np.random.default_rng(6)
    c = 3
    prints = _random_maps(rng, 5, c, (15, 20))
    # three same-sized templates (e.g. rotations of one query)
    marks = [rng.normal(size=(c, 12, 14)).astype(np.float32) for _ in range(3)]

    gal, gal_valid = _pad_stack(prints, (20, 20))
    cache = build_direct_cache(gal, gal_valid, channel_block=4)

    tmpl, tvalid = _pad_stack(marks, (14, 14))
    kernels = jnp.stack(
        [fold_template(tmpl[i], tvalid[i], (10, 10)) for i in range(3)]
    )
    one_group = [VariantGroup(kernels, tvalid[0] - 4)]
    got = np.asarray(score_direct(cache, one_group, true_channels=c))

    per_template = _groups_from(marks, (14, 14), (10, 10))
    want = np.asarray(score_direct(cache, per_template, true_channels=c))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_direct_rankings_identical_to_oracle():
    rng = np.random.default_rng(7)
    c = 4
    prints = _random_maps(rng, 18, c, (12, 20))
    marks, pairs = [], []
    for _ in range(6):
        gi = int(rng.integers(0, len(prints)))
        pairs.append(gi)
        crop = prints[gi][:, 1:10, 1:10].copy()
        crop += 0.25 * rng.normal(size=crop.shape).astype(np.float32)
        marks.append(crop)

    gal, gal_valid = _pad_stack(prints, (20, 20))
    cache = build_direct_cache(gal, gal_valid, channel_block=4)
    groups = _groups_from(marks, (9, 9), (5, 5))
    got = np.asarray(score_direct(cache, groups, true_channels=c))

    want_scores = oracle.score_matrix(marks, prints)
    assert (
        ranks_from_scores(got, pairs).tolist()
        == oracle.rank_queries(want_scores, pairs).tolist()
    )


def test_direct_zero_template_gives_zero():
    c = 2
    p = np.random.default_rng(8).normal(size=(c, 14, 14)).astype(np.float32)
    gal, gv = _pad_stack([p], (14, 14))
    cache = build_direct_cache(gal, gv, channel_block=2)
    zero = jnp.zeros((c, 8, 8), jnp.float32)
    k = fold_template(zero, jnp.asarray([8, 8], jnp.int32), (4, 4))
    s = np.asarray(
        score_direct(cache, [VariantGroup(k[None], jnp.asarray([4, 4]))], true_channels=c)
    )
    assert np.isfinite(s).all() and s[0, 0] == 0.0


def test_fold_centering_dot_equals_roll():
    """The one-hot-matmul centering is BIT-identical to jnp.roll on CPU.

    (On the MXU's bf16x3 f32 path the dot carries <= 1 ulp; all scoring
    backends share fold_template, so mutual bit-identity is unaffected —
    BASELINE.md variant-build notes.)
    """
    rng = np.random.default_rng(11)
    for hw in [(9, 13), (12, 12), (16, 10)]:
        t = np.zeros((3, 18, 18), np.float32)
        t[:, : hw[0], : hw[1]] = rng.normal(size=(3, *hw)).astype(np.float32)
        tv = jnp.asarray(hw, jnp.int32)
        a = np.asarray(fold_template(jnp.asarray(t), tv, (14, 14), centering="roll"))
        b = np.asarray(fold_template(jnp.asarray(t), tv, (14, 14), centering="dot"))
        np.testing.assert_array_equal(a, b)
    with pytest.raises(LookupError):
        fold_template(jnp.asarray(t), tv, (14, 14), centering="spin")

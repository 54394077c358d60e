"""Sharded-vs-unsharded equivalence on the virtual 8-device CPU mesh.

SURVEY.md section 4 item 3: a gallery sharded k ways must reproduce the
unsharded score matrix. Each (variant, print) score is computed on one
device by the same kernel; XLA's per-shape scheduling introduces <=1 ULP
float drift between the differently-shaped compilations, so scores are
checked to tight tolerance and *rankings* to equality.
"""

import numpy as np
import jax
import jax.numpy as jnp

from shoeprint_image_retrieval_tpu.ops.ncc import build_gallery_cache, score_templates
from shoeprint_image_retrieval_tpu.parallel.mesh import build_mesh
from shoeprint_image_retrieval_tpu.parallel.sharded import make_sharded_scorer, shard_cache


def _pad_stack(maps, canvas_hw, c_pad=None):
    c = maps[0].shape[0]
    arr = np.zeros((len(maps), c_pad or c, *canvas_hw), np.float32)
    valid = np.zeros((len(maps), 2), np.int32)
    for i, m in enumerate(maps):
        arr[i, :c, : m.shape[1], : m.shape[2]] = m
        valid[i] = m.shape[1:]
    return jnp.asarray(arr), jnp.asarray(valid)


def test_sharded_equals_unsharded():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    c = 4
    # 19 prints: not a multiple of 8 -> exercises gallery padding
    prints = [
        rng.normal(size=(c, int(rng.integers(12, 20)), int(rng.integers(12, 20)))).astype(np.float32)
        for _ in range(19)
    ]
    marks = [
        rng.normal(size=(c, int(rng.integers(9, 12)), int(rng.integers(9, 12)))).astype(np.float32)
        for _ in range(5)
    ]
    gal, gv = _pad_stack(prints, (20, 20))
    cache, _ = build_gallery_cache(gal, gv, (12 - 4, 12 - 4), channel_block=4)
    tm, tv = _pad_stack(marks, (12, 12), c_pad=cache.phat.shape[0])

    want = np.asarray(score_templates(cache, tm, tv, true_channels=c, channel_block=4))

    mesh = build_mesh(8)
    sharded, g_true = shard_cache(cache, mesh)
    assert g_true == 19
    scorer = make_sharded_scorer(
        mesh, sharded, true_channels=c, channel_block=4, g_true=g_true
    )
    got = np.asarray(scorer(tm, tv))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    # rankings (what the pipeline consumes) must agree exactly
    assert (np.argsort(-got, axis=1) == np.argsort(-want, axis=1)).all()


def test_sharded_scorer_on_smaller_mesh():
    """Mesh smaller than device count (e.g. 2 of 8) also works."""
    rng = np.random.default_rng(1)
    c = 2
    prints = [rng.normal(size=(c, 14, 14)).astype(np.float32) for _ in range(6)]
    marks = [rng.normal(size=(c, 10, 10)).astype(np.float32) for _ in range(2)]
    gal, gv = _pad_stack(prints, (14, 14))
    cache, _ = build_gallery_cache(gal, gv, (6, 6), channel_block=2)
    tm, tv = _pad_stack(marks, (10, 10), c_pad=cache.phat.shape[0])
    want = np.asarray(score_templates(cache, tm, tv, true_channels=c, channel_block=2))

    mesh = build_mesh(2)
    sharded, g_true = shard_cache(cache, mesh)
    scorer = make_sharded_scorer(mesh, sharded, true_channels=c, channel_block=2, g_true=g_true)
    np.testing.assert_allclose(np.asarray(scorer(tm, tv)), want, rtol=1e-5, atol=1e-7)


def test_sharded_direct_equals_unsharded():
    """Direct-conv path sharded over the mesh == single-device scores."""
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        VariantGroup, build_direct_cache, fold_template, score_direct,
    )
    from shoeprint_image_retrieval_tpu.parallel.sharded import (
        make_sharded_direct_scorer,
    )

    rng = np.random.default_rng(2)
    c = 3
    prints = [
        rng.normal(size=(c, int(rng.integers(12, 18)), int(rng.integers(12, 18)))).astype(np.float32)
        for _ in range(13)
    ]
    gal, gv = _pad_stack(prints, (18, 18))
    cache = build_direct_cache(gal, gv, channel_block=3)
    marks = [rng.normal(size=(c, 10, 10)).astype(np.float32) for _ in range(3)]
    tm, tv = _pad_stack(marks, (10, 10))
    groups = [
        VariantGroup(fold_template(tm[i], tv[i], (6, 6))[None], tv[i] - 4)
        for i in range(3)
    ]
    want = np.asarray(score_direct(cache, groups, true_channels=c))

    mesh = build_mesh(8)
    sharded, g_true = shard_cache(cache, mesh)
    assert g_true == 13
    scorer = make_sharded_direct_scorer(mesh, sharded, true_channels=c, g_true=g_true)
    got = np.asarray(scorer(groups))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert (np.argsort(-got, axis=1) == np.argsort(-want, axis=1)).all()

"""Fused Pallas NCC kernel vs the XLA direct path (interpret mode on CPU).

The Pallas kernel must compute the identical quantity as
ops/ncc_direct.score_direct — same groups, same masking, same zero-energy
conventions — to f32 tolerance.
"""

import numpy as np
import jax.numpy as jnp

from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
    VariantGroup,
    build_direct_cache,
    fold_template,
    score_direct,
)
from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import score_direct_pallas


def _pad_stack(maps, canvas_hw):
    c = maps[0].shape[0]
    arr = np.zeros((len(maps), c, *canvas_hw), np.float32)
    valid = np.zeros((len(maps), 2), np.int32)
    for i, m in enumerate(maps):
        arr[i, :, : m.shape[1], : m.shape[2]] = m
        valid[i] = m.shape[1:]
    return jnp.asarray(arr), jnp.asarray(valid)


def test_pallas_matches_direct_multi_group():
    rng = np.random.default_rng(0)
    c = 6
    prints = [
        rng.normal(size=(c, int(rng.integers(14, 22)), int(rng.integers(14, 22)))).astype(np.float32)
        for _ in range(5)
    ]
    gal, gv = _pad_stack(prints, (22, 22))
    cache = build_direct_cache(gal, gv, channel_block=3)

    # groups with different sizes and counts (orig + two "rotations" + scaled)
    marks_a = [rng.normal(size=(c, 12, 14)).astype(np.float32) for _ in range(3)]
    marks_b = [rng.normal(size=(c, 10, 11)).astype(np.float32) for _ in range(2)]
    tm_a, tv_a = _pad_stack(marks_a, (14, 14))
    tm_b, tv_b = _pad_stack(marks_b, (14, 14))
    kernel_hw = (10, 10)
    groups = [
        VariantGroup(
            jnp.stack([fold_template(tm_a[i], tv_a[i], kernel_hw) for i in range(3)]),
            tv_a[0] - 4,
        ),
        VariantGroup(
            jnp.stack([fold_template(tm_b[i], tv_b[i], kernel_hw) for i in range(2)]),
            tv_b[0] - 4,
        ),
    ]

    want = np.asarray(score_direct(cache, groups, true_channels=c))
    got = np.asarray(
        score_direct_pallas(cache, groups, true_channels=c, interpret=True)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_zero_template_and_flat_print():
    rng = np.random.default_rng(1)
    c = 2
    prints = [
        rng.normal(size=(c, 16, 16)).astype(np.float32),
        np.zeros((c, 16, 16), np.float32),  # flat print: zero energy everywhere
    ]
    gal, gv = _pad_stack(prints, (16, 16))
    cache = build_direct_cache(gal, gv, channel_block=2)
    zero = jnp.zeros((c, 9, 9), jnp.float32)
    k = fold_template(zero, jnp.asarray([9, 9], jnp.int32), (5, 5))
    groups = [VariantGroup(k[None], jnp.asarray([5, 5], jnp.int32))]
    got = np.asarray(
        score_direct_pallas(cache, groups, true_channels=c, interpret=True)
    )
    assert np.isfinite(got).all()
    assert (got == 0).all()


def test_pallas_lane_packing_invariance():
    """Scores must not depend on prints_per_step (lane packing is layout)."""
    rng = np.random.default_rng(2)
    c = 4
    prints = [
        rng.normal(size=(c, int(rng.integers(13, 19)), int(rng.integers(13, 19)))).astype(np.float32)
        for _ in range(7)  # odd count: exercises gallery padding per gt
    ]
    gal, gv = _pad_stack(prints, (19, 19))
    cache = build_direct_cache(gal, gv, channel_block=4)
    marks = [rng.normal(size=(c, 11, 12)).astype(np.float32) for _ in range(2)]
    tm, tv = _pad_stack(marks, (12, 12))
    groups = [
        VariantGroup(fold_template(tm[i], tv[i], (8, 8))[None], tv[i] - 4)
        for i in range(2)
    ]
    want = np.asarray(score_direct(cache, groups, true_channels=c))
    for gt in (1, 2, 3):
        got = np.asarray(
            score_direct_pallas(
                cache, groups, true_channels=c, prints_per_step=gt, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=f"gt={gt}")


def test_packed_class_major_matches_list_api():
    """PackedVariants (class-major, pb probes) == per-group list scoring."""
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
    )

    rng = np.random.default_rng(3)
    c = 4
    pb = 3
    class_counts = (1, 2, 2)  # base + two "scale" classes
    prints = [
        rng.normal(size=(c, int(rng.integers(14, 20)), int(rng.integers(14, 20)))).astype(np.float32)
        for _ in range(5)
    ]
    gal, gv = _pad_stack(prints, (20, 20))
    cache = build_direct_cache(gal, gv, channel_block=4)
    kernel_hw = (11, 11)

    # per (class, probe): one window size, class_counts[ci] kernels
    kerns, wins, groups = [], [], []
    for ci, cnt in enumerate(class_counts):
        for p in range(pb):
            h, w = int(rng.integers(8, 12)), int(rng.integers(8, 12))
            ms = [rng.normal(size=(c, h + 4, w + 4)).astype(np.float32) for _ in range(cnt)]
            tm, tv = _pad_stack(ms, (15, 15))
            k = jnp.stack([fold_template(tm[i], tv[i], kernel_hw) for i in range(cnt)])
            kerns.append(k)
            wins.append([h, w])
            groups.append(VariantGroup(k, jnp.asarray([h, w], jnp.int32)))

    packed = PackedVariants(
        jnp.concatenate(kerns), jnp.asarray(wins, jnp.int32)
    )
    layout = VariantLayout(class_counts, pb)

    want = np.asarray(score_direct(cache, groups, true_channels=c))
    got_direct = np.asarray(
        score_direct(cache, packed, true_channels=c, layout=layout)
    )
    np.testing.assert_allclose(got_direct, want, rtol=1e-5, atol=1e-6)

    got_pallas = np.asarray(
        score_direct_pallas(
            cache, packed, true_channels=c, layout=layout, interpret=True
        )
    )
    np.testing.assert_allclose(got_pallas, want, rtol=1e-5, atol=1e-6)


def test_per_class_tap_canvases_match_full_canvas():
    """class_canvas_hw restricts each class's dots to a centered tap
    sub-rectangle; since fold_template zero-fills outside every window the
    restricted contraction drops only exact zeros — scores must equal the
    full-canvas kernel bit-for-bit in interpret mode. (Measured a net LOSS
    on v5e at WVU shapes — engine keeps it disabled — but the capability
    must stay correct for shapes/parts where the trade inverts.)"""
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
    )

    rng = np.random.default_rng(4)
    c, pb = 5, 3
    class_counts = (1, 2)
    layout = VariantLayout(class_counts, pb)
    kernel_hw = (12, 12)
    prints = [
        rng.normal(size=(c, int(rng.integers(14, 21)), int(rng.integers(14, 21)))).astype(np.float32)
        for _ in range(7)
    ]
    gal, gv = _pad_stack(prints, (21, 21))
    cache = build_direct_cache(gal, gv, channel_block=5)

    # class 0 windows <= 8, class 1 windows <= 12 (the full canvas)
    wins = np.zeros((layout.n_groups, 2), np.int32)
    wins[:pb] = rng.integers(6, 9, (pb, 2))
    wins[pb:] = rng.integers(9, 13, (pb, 2))
    kerns = []
    for ci, cnt in enumerate(class_counts):
        for p in range(pb):
            h, w = wins[ci * pb + p]
            ms = [rng.normal(size=(c, h + 4, w + 4)).astype(np.float32) for _ in range(cnt)]
            tm, tv = _pad_stack(ms, (16, 16))
            kerns.append(
                jnp.stack([fold_template(tm[i], tv[i], kernel_hw) for i in range(cnt)])
            )
    packed = PackedVariants(jnp.concatenate(kerns), jnp.asarray(wins))
    uniq, inv = np.unique(wins, axis=0, return_inverse=True)
    slot_hw = jnp.asarray(uniq.astype(np.int32))
    slot_map = jnp.asarray(inv.astype(np.int32))

    full = np.asarray(
        score_direct_pallas(
            cache, packed, true_channels=c, layout=layout,
            slot_hw=slot_hw, slot_map=slot_map, interpret=True,
        )
    )
    for canvases in (((8, 8), (12, 12)), ((9, 11), (12, 12))):
        got = np.asarray(
            score_direct_pallas(
                cache, packed, true_channels=c, layout=layout,
                slot_hw=slot_hw, slot_map=slot_map, interpret=True,
                class_canvas_hw=canvases,
            )
        )
        np.testing.assert_array_equal(got, full, err_msg=f"canvases={canvases}")
    # all-full canvases collapse back onto the single-dot path
    got = np.asarray(
        score_direct_pallas(
            cache, packed, true_channels=c, layout=layout,
            slot_hw=slot_hw, slot_map=slot_map, interpret=True,
            class_canvas_hw=((12, 12), (12, 12)),
        )
    )
    np.testing.assert_array_equal(got, full)


def test_pallas_extreme_window_sizes():
    """Band-dot geometry at the edges: a window as large as the kernel
    canvas (maximal hi_w — exercises the lidx no-wrap bound
    lidx + hi_w < gt*we) and a much smaller window in the same batch,
    against prints both larger and smaller than the windows."""
    rng = np.random.default_rng(3)
    c = 3
    prints = [
        rng.normal(size=(c, 20, 20)).astype(np.float32),
        rng.normal(size=(c, 9, 9)).astype(np.float32),  # smaller than big window
        rng.normal(size=(c, 15, 18)).astype(np.float32),
    ]
    gal, gv = _pad_stack(prints, (20, 20))
    cache = build_direct_cache(gal, gv, channel_block=3)
    kernel_hw = (12, 12)
    big = rng.normal(size=(c, 16, 16)).astype(np.float32)  # window = canvas
    small = rng.normal(size=(c, 7, 8)).astype(np.float32)  # window (3, 4)
    tm, tv = _pad_stack([big, small], (16, 16))
    groups = [
        VariantGroup(fold_template(tm[0], tv[0], kernel_hw)[None], tv[0] - 4),
        VariantGroup(fold_template(tm[1], tv[1], kernel_hw)[None], tv[1] - 4),
    ]
    assert tuple(np.asarray(tv[0] - 4)) == kernel_hw  # maximal hi_w case
    want = np.asarray(score_direct(cache, groups, true_channels=c))
    for gt in (1, 2):
        got = np.asarray(
            score_direct_pallas(
                cache, groups, true_channels=c, prints_per_step=gt, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=f"gt={gt}")


def test_hoisted_operands_match_one_shot():
    """pack_gallery_operands + pack_kernel_operands + score_packed_operands
    (the engine's hoisted block x batch loop) == score_direct_pallas
    bit-for-bit, including reuse of one packed-gallery side across two
    different probe batches and one packed-kernel side across two caches."""
    import jax

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        pack_gallery_operands,
        pack_kernel_operands,
        score_packed_operands,
    )

    rng = np.random.default_rng(11)
    c, pb = 4, 2
    class_counts = (1, 3)
    layout = VariantLayout(class_counts, pb)
    kernel_hw = (11, 11)

    caches = []
    for seed in (0, 1):
        r = np.random.default_rng(seed)
        prints = [
            r.normal(size=(c, int(r.integers(14, 20)), int(r.integers(14, 20)))).astype(np.float32)
            for _ in range(5)
        ]
        gal, gv = _pad_stack(prints, (20, 20))
        caches.append(build_direct_cache(gal, gv, channel_block=4))

    batches = []
    for seed in (7, 8):
        r = np.random.default_rng(seed)
        kerns, wins = [], []
        for ci, cnt in enumerate(class_counts):
            for p in range(pb):
                h, w = int(r.integers(8, 12)), int(r.integers(8, 12))
                ms = [r.normal(size=(c, h + 4, w + 4)).astype(np.float32) for _ in range(cnt)]
                tm, tv = _pad_stack(ms, (15, 15))
                kerns.append(jnp.stack(
                    [fold_template(tm[i], tv[i], kernel_hw) for i in range(cnt)]
                ))
                wins.append([h, w])
        batches.append(PackedVariants(
            jnp.concatenate(kerns), jnp.asarray(wins, jnp.int32)
        ))

    gops = [
        pack_gallery_operands(cc, hk=kernel_hw[0], wk=kernel_hw[1])
        for cc in caches
    ]
    kis = [
        pack_kernel_operands(b.kernels, layout=layout, c_pad=caches[0].p0.shape[0])
        for b in batches
    ]
    for bi, packed in enumerate(batches):
        slot_map = jnp.arange(layout.n_groups, dtype=jnp.int32)
        for gi, cc in enumerate(caches):
            want = np.asarray(score_direct_pallas(
                cc, packed, true_channels=c, layout=layout, interpret=True
            ))
            got = np.asarray(score_packed_operands(
                gops[gi], kis[bi], packed.window_hw, slot_map,
                layout=layout, true_channels=c,
                hk=kernel_hw[0], wk=kernel_hw[1], interpret=True,
            ))[:, : want.shape[1]]
            assert np.array_equal(got, want), (bi, gi)

    # geometry guard: operands packed for a different kernel canvas refuse
    wrong = pack_gallery_operands(caches[0], hk=15, wk=15)
    try:
        score_packed_operands(
            wrong, kis[0], batches[0].window_hw,
            jnp.arange(layout.n_groups, dtype=jnp.int32),
            layout=layout, true_channels=c, hk=kernel_hw[0], wk=kernel_hw[1],
            interpret=True,
        )
        raise AssertionError("mismatched canvas geometry was not rejected")
    except ValueError:
        pass


def test_packed_geometry_helper_matches_packing_and_guards():
    """packed_gallery_geometry (the single source of truth the HBM/VMEM
    sizing models rely on) must agree with pack_gallery_operands' ACTUAL
    output shapes across canvas/print-size combinations, and
    score_packed_operands must reject a kern_inputs/gallery channel-pad
    mismatch (Pallas clamps out-of-range block indices, so an unguarded
    mismatch silently reuses the last kern block)."""
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        pack_gallery_gt,
        pack_gallery_operands,
        pack_kernel_operands,
        packed_gallery_geometry,
        score_packed_operands,
    )

    rng = np.random.default_rng(23)
    for canvas, khw in [((18, 15), (9, 9)), ((22, 22), (13, 11)), ((16, 20), (8, 12))]:
        c = 4
        prints = [
            rng.normal(size=(c, int(rng.integers(12, canvas[0] + 1)),
                             int(rng.integers(12, canvas[1] + 1)))).astype(np.float32)
            for _ in range(3)
        ]
        gal, gv = _pad_stack(prints, canvas)
        cache = build_direct_cache(gal, gv, channel_block=4)
        gops = pack_gallery_operands(cache, hk=khw[0], wk=khw[1])
        hb, wb = cache.p0.shape[-2:]
        gt = pack_gallery_gt(wb)
        ws, _top, _bot, he, _we, wi, _hbp = packed_gallery_geometry(
            hb, wb, khw[0], khw[1], gt
        )
        assert gops.p0p.shape[-2:] == (hb, gt * ws), (canvas, khw)
        assert gops.int12p.shape[-2:] == (2 * he, wi), (canvas, khw)

    # channel-pad mismatch guard
    layout = VariantLayout((1,), 2)
    kernel_hw = (9, 9)
    tm, tv = _pad_stack(
        [rng.normal(size=(4, 12, 12)).astype(np.float32) for _ in range(2)], (13, 13)
    )
    packed = PackedVariants(
        jnp.stack([fold_template(tm[i], tv[i], kernel_hw) for i in range(2)]),
        (tv - 4).astype(jnp.int32),
    )
    gops = pack_gallery_operands(cache, hk=kernel_hw[0], wk=kernel_hw[1])
    ki = pack_kernel_operands(packed.kernels, layout=layout, c_pad=8)  # wrong pad
    try:
        score_packed_operands(
            gops, ki, packed.window_hw,
            jnp.arange(1, dtype=jnp.int32), layout=layout, true_channels=4,
            hk=kernel_hw[0], wk=kernel_hw[1], interpret=True,
        )
        raise AssertionError("channel-pad mismatch was not rejected")
    except ValueError as e:
        assert "channel" in str(e)


def test_pallas_fuzz_random_geometries():
    """Seeded fuzz over the kernel's geometry space: random print/canvas/
    kernel-canvas sizes, class layouts, gallery counts (including G not a
    multiple of gt and G < gt), and prints_per_step — pallas interpret must
    match the XLA direct path at every draw. Catches packing-boundary bugs
    (128-lane wi cliffs, 8-row pads, odd kernel canvases) that hand-picked
    shapes miss."""
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
    )

    rng = np.random.default_rng(1234)
    for trial in range(8):
        c = int(rng.integers(2, 5))
        g = int(rng.integers(1, 7))
        canvas = (int(rng.integers(10, 24)), int(rng.integers(10, 24)))
        prints = [
            rng.normal(size=(
                c,
                int(rng.integers(8, canvas[0] + 1)),
                int(rng.integers(8, canvas[1] + 1)),
            )).astype(np.float32)
            for _ in range(g)
        ]
        gal, gv = _pad_stack(prints, canvas)
        cache = build_direct_cache(gal, gv, channel_block=c)

        kh = int(rng.integers(6, 14))
        kw = int(rng.integers(6, 14))
        kernel_hw = (kh, kw)
        pb = int(rng.integers(1, 3))
        n_classes = int(rng.integers(1, 3))
        class_counts = tuple(int(rng.integers(1, 3)) for _ in range(n_classes))
        layout = VariantLayout(class_counts, pb)

        kerns, wins = [], []
        tc = (kh + 4, kw + 4)
        for cnt in class_counts:
            for _ in range(pb):
                h = int(rng.integers(2, kh + 1))
                w = int(rng.integers(2, kw + 1))
                ms = [
                    rng.normal(size=(c, h + 4, w + 4)).astype(np.float32)
                    for _ in range(cnt)
                ]
                tm, tv = _pad_stack(ms, tc)
                kerns.append(jnp.stack(
                    [fold_template(tm[i], tv[i], kernel_hw) for i in range(cnt)]
                ))
                wins.append([h, w])
        packed = PackedVariants(
            jnp.concatenate(kerns), jnp.asarray(wins, jnp.int32)
        )

        want = np.asarray(score_direct(
            cache, packed, true_channels=c, layout=layout
        ))
        gt = int(rng.integers(1, 5))
        got = np.asarray(score_direct_pallas(
            cache, packed, true_channels=c, layout=layout,
            prints_per_step=gt, interpret=True,
        ))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5,
            err_msg=f"trial={trial} c={c} g={g} canvas={canvas} "
                    f"kernel={kernel_hw} counts={class_counts} pb={pb} gt={gt}",
        )

        # cross-product ("grid") energy epilogue must match the per-slot
        # path exactly on every geometry draw (same band columns, same
        # two-term dot — build_epilogue_grid only refactors the loop)
        from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
            build_epilogue_grid,
        )

        wins_np = np.asarray(wins, np.int32)
        uniq, inv = np.unique(wins_np, axis=0, return_inverse=True)
        # pad the slot table + the grid the way the engine does (fixed
        # compiled shapes across batches; fillers replay / route to trash)
        n_slots_pad = len(uniq) + int(rng.integers(0, 3))
        slot_hw = np.full((n_slots_pad, 2), 12, np.int32)
        slot_hw[: len(uniq)] = uniq
        epi = build_epilogue_grid(
            slot_hw,
            n_h_pad=len(np.unique(uniq[:, 0])) + int(rng.integers(0, 3)),
            n_w_pad=len(np.unique(uniq[:, 1])) + int(rng.integers(0, 3)),
            n_live=len(uniq),
        )
        got_grid = np.asarray(score_direct_pallas(
            cache, packed, true_channels=c, layout=layout,
            prints_per_step=gt, interpret=True,
            slot_hw=jnp.asarray(slot_hw),
            slot_map=jnp.asarray(inv.astype(np.int32)),
            epi=epi,
        ))
        np.testing.assert_array_equal(
            got_grid, got,
            err_msg=f"grid-epi trial={trial} slots={len(uniq)} "
                    f"grid={len(epi[0])}x{len(epi[1])}",
        )

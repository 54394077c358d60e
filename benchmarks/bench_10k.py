#!/usr/bin/env python3
"""10k-print gallery scaling bench (BASELINE.json config 5; VERDICT item 5).

A 10k-print direct cache (p0 + int1 + int2, f32) would need ~40 GB of HBM —
far over a v5e's 16 GB. This bench streams the gallery through the fused
Pallas kernel in ``--block``-print blocks: per block, the direct cache is
built on device from host-resident feature maps, every probe batch is
scored against it, and score columns accumulate into a DEVICE-resident
(Q, G) buffer; the true-match ranks are computed on device
(ops/topk.ranks_on_device) so the only result pull is Q int32s — not the
O(Q*G) score bytes of a host argsort (the reference instead replicates the
whole gallery into host shm per worker and argsorts on host —
similarity.py:164-176, 381).

Host memory is bounded too: gallery blocks are GENERATED on demand from a
per-block seeded RNG, so neither host nor device ever holds the full 10k
gallery. Rank identity is checked against the reference-semantics CPU
oracle on a probe/print subsample.

    python benchmarks/bench_10k.py [--g 10240] [--block 512] [--quick]
    python benchmarks/bench_10k.py --sweep   # full 25-variant reference
        # transform sweep per probe (reference run.toml:24-25) — the honest
        # production-shaped 10k number (VERDICT r2 item 4). Variant stacks
        # are built ONCE per probe batch and reused across all gallery
        # blocks (the engine does the same via its prebuild path).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def block_sizes(bi: int, nb: int, lo: int, hi: int) -> np.ndarray:
    rng = np.random.default_rng(1000 + bi)
    sizes = np.stack(
        [rng.integers(lo, hi + 1, nb), rng.integers(lo, hi + 1, nb)], 1
    ).astype(np.int32)
    # height-sorted (as the engine does) for the kernel's dynamic y bound
    return sizes[np.argsort(-sizes[:, 0], kind="stable")]


def make_block_generator(nb: int, c: int, hi: int):
    """Deterministic ON-DEVICE gallery generation (host-side numpy at this
    scale is minutes per block on this machine's single CPU core)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(seed, sizes):
        maps = jax.random.normal(jax.random.PRNGKey(seed), (nb, c, hi, hi), jnp.float32)
        rows = jnp.arange(hi)[None, None, :, None] < sizes[:, 0][:, None, None, None]
        cols = jnp.arange(hi)[None, None, None, :] < sizes[:, 1][:, None, None, None]
        return jnp.where(rows & cols, maps, 0.0)

    return gen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10240)
    ap.add_argument("--block", type=int, default=0)  # 0 = auto from HBM
    ap.add_argument("--pb", type=int, default=128)  # n_pad=128: full MXU M tiles
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
        build_direct_cache,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        build_epilogue_grid,
        pack_gallery_operands,
        pack_kernel_operands,
        score_packed_operands,
    )
    from shoeprint_image_retrieval_tpu.retrieval import oracle

    if args.quick:
        G, BLK, C, PB = 64, 16, 8, 2
        g_lo, g_hi, q_lo, q_hi = 18, 24, 14, 18
    else:
        G, BLK, C, PB = args.g, args.block, 176, args.pb
        g_lo, g_hi, q_lo, q_hi = 38, 46, 28, 36

    # full reference transform sweep (reference run.toml:24-25): 7 rotations
    # x 3 scales in the reference's variant composition = 25 variants/probe,
    # scored QB probes per kernel call (QB*25 MXU rows)
    rotations = [-15, -9, -3, 3, 9, 15, 180] if args.sweep else []
    scales = [1.02, 1.04, 1.08] if args.sweep else []
    QB = 64 if args.sweep else PB  # probes per scoring call
    if args.sweep and args.quick:
        QB = 2

    log(f"devices: {jax.devices()}")
    n_var_log = 1 + (1 + len(rotations)) * len(scales)

    rng = np.random.default_rng(7)
    hc = wc = q_hi
    smax = max([1.0] + scales)
    tc = (max(hc, int(hc * smax)), max(wc, int(wc * smax)))
    kernel_hw = (tc[0] - 4, tc[1] - 4)

    if not BLK:
        # auto: largest block whose scoring-graph HBM peak fits, given the
        # prebuilt variant stacks stay resident (hand-picked 512 OOMed the
        # part in sweep mode: the bigger sweep canvas crosses a 128-lane
        # packing cliff in the kernel operand). Snapped to a divisor of G
        # so every block has one compiled shape.
        from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
            auto_gallery_block,
        )

        n_rows = -(-QB * n_var_log // 8) * 8
        stack_b = n_rows * C * kernel_hw[0] * kernel_hw[1] * 4
        n_stacks = -(-PB // QB)
        blk = auto_gallery_block(
            g_hi - 4, g_hi - 4, kernel_hw[0], kernel_hw[1],
            c_pad=-(-C // 8) * 8, resident_bytes=n_stacks * stack_b,
        )
        BLK = max(d for d in range(1, min(blk, G) + 1) if G % d == 0)
        if BLK < min(PB, G):
            # probes are planted in block 0, so block 0 must hold them all;
            # keep the divisor property (phantom prints in a padded tail
            # block would otherwise enter the scores matrix and the top-1
            # assertion) by taking the SMALLEST divisor of G that fits them
            BLK = min(d for d in range(min(PB, G), G + 1) if G % d == 0)

    log(f"G={G} in blocks of {BLK}; C={C}; PB={PB} probes "
        f"({n_var_log} variant(s) each, {QB}/call)")

    # probes are noisy crops of block-0 prints: each has a PLANTED true
    # match so the oracle rank check is meaningful (random-vs-random scores
    # are near-tied and any 1e-5 perturbation reorders them)
    gen0 = make_block_generator(BLK, C, g_hi)
    bs0_host = block_sizes(0, BLK, g_lo, g_hi)
    import jax.numpy as _jnp
    block0 = np.asarray(gen0(0, _jnp.asarray(bs0_host))[:PB])
    q_sizes = np.zeros((PB, 2), np.int32)
    q_native = []
    for i in range(PB):
        sh, sw = int(bs0_host[i, 0]), int(bs0_host[i, 1])
        ch = min(max(q_lo, sh - 6), q_hi, sh)
        cw = min(max(q_lo, sw - 6), q_hi, sw)
        crop = block0[i, :, :ch, :cw] + 0.05 * rng.normal(
            size=(C, ch, cw)
        ).astype(np.float32)
        q_native.append(crop.astype(np.float32))
        q_sizes[i] = (ch, cw)
    qmaps = np.zeros((PB, C, hc, wc), np.float32)
    for i, m in enumerate(q_native):
        qmaps[i, :, : m.shape[1], : m.shape[2]] = m

    build_cache = jax.jit(build_direct_cache)
    fold = jax.vmap(fold_template, in_axes=(0, None, None))

    if not args.sweep:
        layout = VariantLayout((1,), PB)
        windows = (q_sizes - 4).astype(np.int32)
        uniq, inv = np.unique(windows, axis=0, return_inverse=True)

        @jax.jit
        def build_packed(maps, valid):
            def one(m, v):
                return fold(m[None], v, kernel_hw)[0]
            return PackedVariants(jax.vmap(one)(maps, valid), jnp.asarray(windows))

        packed = build_packed(jnp.asarray(qmaps), jnp.asarray(q_sizes))
        # one batch covering all PB probes, identity regroup
        batches = [(packed, jnp.asarray(uniq), jnp.asarray(inv.astype(np.int32)))]
        batch_rows = [list(range(PB))]
    else:
        # class-major 25-variant stacks, QB probes per batch, built ONCE and
        # reused across every gallery block (engine prebuild path analog)
        from shoeprint_image_retrieval_tpu.ops.warp import (
            pil_resize_size, resample_weights, rotate_index_map,
        )

        n_rot, n_scl = len(rotations), len(scales)
        class_counts = tuple([1] + [1 + n_rot] * n_scl)
        layout = VariantLayout(class_counts, QB)
        fold_rs = jax.vmap(fold, in_axes=(0, 0, None))

        rot_idx = np.zeros((PB, 1 + n_rot, hc * wc), np.int32)
        rot_ok = np.zeros((PB, 1 + n_rot, hc, wc), bool)
        wv = np.zeros((PB, n_scl, tc[0], hc), np.float32)
        wh = np.zeros((PB, n_scl, tc[1], wc), np.float32)
        shw = np.zeros((PB, n_scl, 2), np.int32)
        for qi in range(PB):
            h, w = int(q_sizes[qi, 0]), int(q_sizes[qi, 1])
            for ri, deg in enumerate([0.0] + rotations):
                idx, ok = rotate_index_map((h, w), deg, canvas_hw=(hc, wc))
                rot_idx[qi, ri] = idx.reshape(-1)
                rot_ok[qi, ri] = ok
            for si, s in enumerate(scales):
                oh, ow = pil_resize_size((h, w), s)
                wv[qi, si] = resample_weights(h, oh, "bicubic", canvas_in=hc, canvas_out=tc[0])
                wh[qi, si] = resample_weights(w, ow, "bicubic", canvas_in=wc, canvas_out=tc[1])
                shw[qi, si] = (oh, ow)

        @jax.jit
        def build_packed_sweep(maps, valid, ridx, rok, wvq, whq, shw_b, windows):
            def one(maps_p, valid_p, ridx_p, rok_p, wv_p, wh_p, shw_p):
                flat = maps_p.reshape(C, hc * wc)
                rot = jnp.take(flat, ridx_p, axis=1)
                rot = jnp.moveaxis(rot, 0, 1).reshape(-1, C, hc, wc)
                rot = jnp.where(rok_p[:, None], rot, 0.0)
                base_k = fold(rot[:1], valid_p, kernel_hw)
                scaled = jnp.einsum(
                    "soh,rchw,spw->srcop", wv_p, rot, wh_p, precision="highest"
                )
                return base_k, fold_rs(scaled, shw_p, kernel_hw)

            base_k, scaled_k = jax.vmap(one)(maps, valid, ridx, rok, wvq, whq, shw_b)
            ck = base_k.shape[-3:]
            kerns = [base_k.reshape(QB, *ck)]
            for si in range(n_scl):
                kerns.append(scaled_k[:, si].reshape(QB * (1 + n_rot), *ck))
            return PackedVariants(jnp.concatenate(kerns), windows)

        batches, batch_rows = [], []
        for lo in range(0, PB, QB):
            take = list(range(lo, min(lo + QB, PB)))
            take += [take[-1]] * (QB - len(take))
            wins = [np.stack([q_sizes[i] - 4 for i in take])]
            for si in range(n_scl):
                wins.append(np.stack([shw[i, si] - 4 for i in take]))
            wins = np.concatenate(wins).astype(np.int32)
            uniq, inv = np.unique(wins, axis=0, return_inverse=True)
            pk = build_packed_sweep(
                jnp.asarray(qmaps[take]), jnp.asarray(q_sizes[take]),
                jnp.asarray(rot_idx[take]), jnp.asarray(rot_ok[take]),
                jnp.asarray(wv[take]), jnp.asarray(wh[take]),
                jnp.asarray(shw[take]), jnp.asarray(wins),
            )
            batches.append(
                (jax.block_until_ready(pk),
                 jnp.asarray(uniq.astype(np.int32)),
                 jnp.asarray(inv.astype(np.int32)))
            )
            batch_rows.append(take)
        log(f"{len(batches)} variant stacks prebuilt "
            f"({sum(b[0].kernels.nbytes for b in batches)/1e9:.2f} GB HBM), "
            f"reused across all blocks")

    # hoisted operand packing: each batch's kernel transpose runs ONCE (not
    # once per gallery block — 2.6 GB of HBM traffic per call at sweep
    # shapes), and each block's gallery packing runs once (not once per
    # probe batch); score_block is then the bare fused kernel + regroup
    c_pad8 = -(-C // 8) * 8
    pack_gal = jax.jit(
        lambda cache_arg: pack_gallery_operands(
            cache_arg, hk=kernel_hw[0], wk=kernel_hw[1]
        )
    )
    pack_kerns = jax.jit(
        lambda kernels: pack_kernel_operands(
            kernels, layout=layout, c_pad=c_pad8
        )
    )
    batches = [
        (jax.block_until_ready(pack_kerns(pk.kernels)), sh, sm)
        for (pk, sh, sm) in batches
    ]

    # cross-product grid energy epilogue (B10K_EPI=slot for A/B); pads are
    # shared across batches so equal slot counts reuse one compiled kernel
    if os.environ.get("B10K_EPI", "grid") == "grid":
        uniqs = [np.asarray(sh) for (_, sh, _) in batches]
        n_h_pad = max(len(np.unique(u[:, 0])) for u in uniqs)
        n_w_pad = max(len(np.unique(u[:, 1])) for u in uniqs)
        log(f"epilogue: grid {n_h_pad}x{n_w_pad}")
        epis = [
            tuple(jnp.asarray(a) for a in build_epilogue_grid(
                u, n_h_pad=n_h_pad, n_w_pad=n_w_pad
            ))
            for u in uniqs
        ]
    else:
        log("epilogue: per-slot")
        epis = [None] * len(batches)
    batches = [(*b, epi) for b, epi in zip(batches, epis)]

    @jax.jit
    def score_block(gops, kern_inputs, slot_hw, slot_map, epi=None):
        s = score_packed_operands(
            gops, kern_inputs, slot_hw, slot_map, layout=layout,
            true_channels=C, hk=kernel_hw[0], wk=kernel_hw[1], epi=epi,
        )[:, :BLK]
        if not args.sweep:
            return s
        parts, off = [], 0
        for cnt in layout.class_counts:
            parts.append(s[off : off + QB * cnt].reshape(QB, cnt, -1))
            off += QB * cnt
        # zeros-init score floor (reference similarity.py:355-367), as in
        # the engine's regroup_max
        return jnp.maximum(
            jnp.max(jnp.concatenate(parts, axis=1), axis=1), 0.0
        )  # (QB, BLK)

    n_blocks = -(-G // BLK)
    gen = make_block_generator(BLK, C, g_hi)

    # warm all compiles on block 0
    t0 = time.perf_counter()
    bs0 = jnp.asarray(block_sizes(0, BLK, g_lo, g_hi))
    cache0 = build_cache(gen(0, bs0), bs0)
    gops0 = pack_gal(cache0)
    np.asarray(score_block(gops0, *batches[0]))
    log(f"compile+warmup: {time.perf_counter() - t0:.2f}s")
    hbm = sum(a.nbytes for a in cache0) / 1e9
    gops_hbm = sum(a.nbytes for a in gops0) / 1e9
    del cache0, gops0
    log(f"per-block cache HBM: {hbm:.2f} GB + {gops_hbm:.2f} GB packed "
        f"operands (x{n_blocks} blocks streamed)")

    # The block loop is PIPELINED and the score matrix never leaves the
    # device: per-(block x batch) score rows accumulate into a device-
    # resident (Q, G) buffer (5 MB at PB=128 x G=10240) and the final ranks
    # are computed ON DEVICE (ops/topk.ranks_on_device, the north star's
    # "fused kernel with on-device top-k") — the only result pull is PB
    # int32 ranks, not the O(Q*G) score bytes the host path needs over the
    # axon tunnel (reference similarity.py:381 argsorts everything on host).
    # A 4-byte scalar pull two submissions behind the enqueue front paces
    # the dispatch queue so block i+1's cache build overlaps block i's
    # scoring (the same 2-deep drain the engine uses).
    from shoeprint_image_retrieval_tpu.ops.topk import ranks_on_device

    buf_rows = max(PB, len(batches) * QB)
    acc = jax.jit(
        lambda b, r, lo_q, lo_g: jax.lax.dynamic_update_slice(b, r, (lo_q, lo_g)),
        donate_argnums=0,
    )
    buf = jnp.zeros((buf_rows, n_blocks * BLK), jnp.float32)

    t0 = time.perf_counter()
    pending: list = []
    for bi in range(n_blocks):
        bs = jnp.asarray(block_sizes(bi, BLK, g_lo, g_hi))
        cache = build_cache(gen(bi, bs), bs)
        gops = pack_gal(cache)
        del cache  # the kernel reads only the packed operands
        for k, (ki, sh, sm, epi) in enumerate(batches):
            rows = score_block(gops, ki, sh, sm, epi)
            buf = acc(buf, rows, batch_rows[k][0], bi * BLK)
            pending.append(rows)
            if len(pending) > 2:
                # pace only: 4 bytes, synchronizes on that call's kernel
                np.asarray(pending.pop(0)[:1, :1])
        del gops  # allow the allocator to retire the block's operands
    pending.clear()
    ranks = np.asarray(
        jax.jit(ranks_on_device)(
            buf[:PB, :G], jnp.arange(PB, dtype=jnp.int32)
        )
    )  # planted true match of probe i is global print i
    dt = time.perf_counter() - t0
    pps = PB / dt
    rank_pull_bytes = ranks.nbytes
    full_matrix_bytes = PB * G * 4
    n_var_eff = sum(layout.class_counts)
    log(f"{PB} probes x {n_var_eff} variants x {G} prints (streamed) in "
        f"{dt:.2f}s -> {pps:.3f} probes/s vs 10k gallery")

    # device ranks == host metrics (the contract ops/topk.ranks_on_device
    # pins): full-matrix pull happens OUTSIDE the timed loop, in quick mode
    # always and at full scale behind B10K_CHECK=1 (it is the very pull the
    # device-rank path exists to avoid)
    if args.quick or os.environ.get("B10K_CHECK"):
        from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores

        full = np.asarray(buf[:PB, :G])
        host_ranks = ranks_from_scores(full, list(range(PB)))
        assert (ranks == host_ranks).all(), (ranks, host_ranks)
        log("device ranks == host metrics.ranks_from_scores: ok")

    # oracle check on a subsample: per-pair scores match AND each probe's
    # planted true match ranks 1st in the full 10k gallery
    sub_q = min(3, PB)
    sub_g = min(40, BLK)
    bs_h = np.asarray(block_sizes(0, BLK, g_lo, g_hi))
    bm = np.asarray(gen(0, jnp.asarray(bs_h))[:sub_g])
    want = np.zeros((sub_q, sub_g), np.float32)
    for qi in range(sub_q):
        for gi in range(sub_g):
            p_native = bm[gi, :, : bs_h[gi, 0], : bs_h[gi, 1]]
            want[qi, gi] = oracle.pair_similarity(q_native[qi], p_native)
    got = np.asarray(buf[:sub_q, :sub_g])
    top1_ok = (ranks == 1).all()
    if args.sweep:
        # max-over-variants >= the oracle's unrotated-variant score (class 0
        # of the sweep IS the unrotated original); exact per-variant rank
        # identity is covered by the test suite (test_backends)
        shortfall = (want - got).max()
        log(f"oracle subsample: sweep score >= unrotated oracle score "
            f"(max shortfall {shortfall:.2e}); "
            f"planted matches rank 1st across 10k: {top1_ok}")
        # 5e-4: kernel f32 accumulation vs the CPU oracle's summation order
        # (the strict 1e-4 per-pair check is the non-sweep branch; per-variant
        # rank identity lives in test_backends)
        assert shortfall < 5e-4 and top1_ok
    else:
        err = np.abs(got - want).max()
        log(f"oracle subsample: max |delta|={err:.2e}; "
            f"planted matches rank 1st across 10k: {top1_ok}")
        # 5e-4: the fused-mac kernel accumulates the scaled dot terms in a
        # different f32 order than the CPU oracle (measured ~2e-4 here);
        # ranks are the contract and are asserted exactly
        assert err < 5e-4 and top1_ok

    import json
    print(json.dumps({
        "metric": (
            "probes_per_sec_10k_gallery_full_sweep" if args.sweep
            else "probes_per_sec_10k_gallery_streamed"
        ),
        "value": round(pps, 3),
        "unit": "probes/s",
        "gallery": G,
        "block": BLK,
        "variants": sum(layout.class_counts),
        "per_block_cache_gb": round(hbm, 3),
        "rank_pull_bytes": rank_pull_bytes,
        "host_path_pull_bytes": full_matrix_bytes,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""10k-print gallery scaling bench (BASELINE.json config 5; VERDICT item 5).

A 10k-print direct cache (p0 + int1 + int2, f32) would need ~40 GB of HBM —
far over a v5e's 16 GB. This bench streams the gallery through the fused
Pallas kernel in ``--block``-print blocks: per block, the direct cache is
built on device from host-resident feature maps, every probe batch is
scored against it, and score columns assemble on host (the reference
instead replicates the whole gallery into host shm per worker —
similarity.py:164-176).

Host memory is bounded too: gallery blocks are GENERATED on demand from a
per-block seeded RNG, so neither host nor device ever holds the full 10k
gallery. Rank identity is checked against the reference-semantics CPU
oracle on a probe/print subsample.

    python benchmarks/bench_10k.py [--g 10240] [--block 512] [--quick]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--pb", type=int, default=128)  # n_pad=128: full MXU M tiles
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
        build_direct_cache,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import score_direct_pallas
    from shoeprint_image_retrieval_tpu.retrieval import oracle

    if args.quick:
        G, BLK, C, PB = 64, 16, 8, 2
        g_lo, g_hi, q_lo, q_hi = 18, 24, 14, 18
    else:
        G, BLK, C, PB = args.g, args.block, 176, args.pb
        g_lo, g_hi, q_lo, q_hi = 38, 46, 28, 36

    log(f"devices: {jax.devices()}")
    log(f"G={G} in blocks of {BLK}; C={C}; PB={PB} probes (1 variant each)")

    rng = np.random.default_rng(7)
    hc = wc = q_hi
    kernel_hw = (hc - 4, wc - 4)

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

    layout = VariantLayout((1,), PB)
    windows = (q_sizes - 4).astype(np.int32)
    uniq, inv = np.unique(windows, axis=0, return_inverse=True)

    fold = jax.vmap(fold_template, in_axes=(0, None, None))

    @jax.jit
    def build_packed(maps, valid):
        def one(m, v):
            return fold(m[None], v, kernel_hw)[0]
        return PackedVariants(jax.vmap(one)(maps, valid), jnp.asarray(windows))

    @jax.jit
    def score_block(cache_arg, packed, slot_hw, slot_map):
        return score_direct_pallas(
            cache_arg, packed, true_channels=C, layout=layout,
            slot_hw=slot_hw, slot_map=slot_map,
        )

    build_cache = jax.jit(build_direct_cache)
    packed = build_packed(jnp.asarray(qmaps), jnp.asarray(q_sizes))
    slot_hw, slot_map = jnp.asarray(uniq), jnp.asarray(inv.astype(np.int32))

    n_blocks = -(-G // BLK)
    scores = np.zeros((PB, n_blocks * BLK), np.float32)
    gen = make_block_generator(BLK, C, g_hi)

    # warm all compiles on block 0
    t0 = time.perf_counter()
    bs0 = jnp.asarray(block_sizes(0, BLK, g_lo, g_hi))
    cache0 = build_cache(gen(0, bs0), bs0)
    np.asarray(score_block(cache0, packed, slot_hw, slot_map))
    log(f"compile+warmup: {time.perf_counter() - t0:.2f}s")
    hbm = sum(a.nbytes for a in cache0) / 1e9
    log(f"per-block cache HBM: {hbm:.2f} GB (x{n_blocks} blocks streamed)")

    # The block loop is PIPELINED: scores stay on device and are pulled two
    # blocks behind the enqueue front, so the tunnel's host round-trip and
    # block i+1's cache build overlap block i's scoring instead of
    # serializing with it.
    t0 = time.perf_counter()
    pending: list[tuple[int, object]] = []
    for bi in range(n_blocks):
        bs = jnp.asarray(block_sizes(bi, BLK, g_lo, g_hi))
        cache = build_cache(gen(bi, bs), bs)
        pending.append((bi, score_block(cache, packed, slot_hw, slot_map)))
        del cache  # allow the allocator to retire the 2 GB block cache
        if len(pending) > 2:
            j, s = pending.pop(0)
            scores[:, j * BLK : (j + 1) * BLK] = np.asarray(s)
    for j, s in pending:
        scores[:, j * BLK : (j + 1) * BLK] = np.asarray(s)
    dt = time.perf_counter() - t0
    pps = PB / dt
    log(f"{PB} probes x {G} prints (streamed) in {dt:.2f}s "
        f"-> {pps:.3f} probes/s vs 10k gallery")

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
    got = scores[:sub_q, :sub_g]
    err = np.abs(got - want).max()
    top1 = np.argmax(scores[:, : n_blocks * BLK], axis=1)
    top1_ok = (top1 == np.arange(PB)).all()
    log(f"oracle subsample: max |delta|={err:.2e}; "
        f"planted matches rank 1st across 10k: {top1_ok}")
    assert err < 1e-4 and top1_ok

    import json
    print(json.dumps({
        "metric": "probes_per_sec_10k_gallery_streamed",
        "value": round(pps, 3),
        "unit": "probes/s",
        "gallery": G,
        "block": BLK,
        "per_block_cache_gb": round(hbm, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Sharded-scorer rigor: overhead at mesh=1 on real hardware + virtual-mesh
scaling curve + quantified all-gather volume (VERDICT r2 item 1).

The >=100 probes/s north star rests on gallery sharding being ~free: each
chip scores every variant against its gallery shard with the SAME fused
Pallas kernel and score rows ride ICI through one tiled all_gather
(parallel/sharded.py). Multi-chip hardware is unavailable here, so this
bench nails down every measurable piece of that projection:

  --mesh1   (real TPU) score the bench workload twice — direct
            score_direct_pallas vs THROUGH make_sharded_packed_scorer on a
            1-device mesh — the shard_map/all-gather wrapper's overhead is
            the probes/s difference.
  --scaling (CPU, 8 virtual devices) fixed gallery, shards 1/2/4/8:
            asserts sharded == unsharded scores bit-identically, prints
            per-shard gallery size, per-device all-gather bytes, and wall
            clock (CPU wall does NOT transfer to TPU; the work split and
            byte counts do).

All-gather volume math (printed): a ring all-gather of the (N, G/n) f32
score rows sends N * G/n * 4 * (n-1) bytes per device per probe batch.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SCALING = "--scaling" in sys.argv
if SCALING:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import numpy as np


def build_workload(G, C, g_lo, g_hi, q_lo, q_hi, pb, rotations, scales, seed=0):
    """Reference-shaped synthetic workload; returns cache inputs + one
    packed probe batch (class-major, host-deduped slots) like the engine."""
    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.ops.warp import (
        pil_resize_size,
        resample_weights,
        rotate_index_map,
    )

    rng = np.random.default_rng(seed)
    g_sizes = np.stack(
        [rng.integers(g_lo, g_hi + 1, G), rng.integers(g_lo, g_hi + 1, G)], 1
    ).astype(np.int32)
    g_sizes = g_sizes[np.argsort(-g_sizes[:, 0], kind="stable")]
    gal = np.zeros((G, C, g_hi, g_hi), np.float32)
    for i, (h, w) in enumerate(g_sizes):
        gal[i, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)

    n_rot, n_scl = len(rotations), len(scales)
    hc = wc = q_hi
    smax = max([1.0] + list(scales))
    tc = (max(hc, int(hc * smax)), max(wc, int(wc * smax)))
    kernel_hw = (tc[0] - 4, tc[1] - 4)
    class_counts = tuple([1] + [1 + n_rot] * n_scl)
    n_var = sum(class_counts)
    layout = VariantLayout(class_counts, pb)

    fold = jax.vmap(fold_template, in_axes=(0, None, None))
    fold_rs = jax.vmap(fold, in_axes=(0, 0, None))

    q_sizes = np.stack(
        [rng.integers(q_lo, q_hi + 1, pb), rng.integers(q_lo, q_hi + 1, pb)], 1
    ).astype(np.int32)
    base_k, scaled_k, wins = [], [], [q_sizes - 4]
    for qi in range(pb):
        h, w = int(q_sizes[qi, 0]), int(q_sizes[qi, 1])
        maps = np.zeros((C, hc, wc), np.float32)
        maps[:, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)
        rot = [maps]
        for deg in rotations:
            idx, ok = rotate_index_map((h, w), deg, canvas_hw=(hc, wc))
            r = maps.reshape(C, -1)[:, idx.reshape(-1)].reshape(C, hc, wc)
            rot.append(np.where(ok[None], r, 0.0).astype(np.float32))
        rot = np.stack(rot)  # (1+R, C, hc, wc)
        base_k.append(np.asarray(fold(jnp.asarray(rot[:1]), jnp.asarray((h, w)), kernel_hw)))
        sc_k, shw = [], []
        for s in scales:
            oh, ow = pil_resize_size((h, w), s)
            wv = resample_weights(h, oh, "bicubic", canvas_in=hc, canvas_out=tc[0])
            wh = resample_weights(w, ow, "bicubic", canvas_in=wc, canvas_out=tc[1])
            scaled = np.einsum("oh,rchw,pw->rcop", wv, rot, wh).astype(np.float32)
            sc_k.append(np.asarray(
                fold(jnp.asarray(scaled), jnp.asarray((oh, ow)), kernel_hw)))
            shw.append((oh, ow))
        scaled_k.append(np.stack(sc_k))  # (S, 1+R, C, hk, wk)
    for si in range(n_scl):
        wins.append(np.asarray(
            [pil_resize_size((int(h), int(w)), scales[si]) for h, w in q_sizes],
            np.int32) - 4)

    kerns = [np.concatenate(base_k)]  # class-major rows
    for si in range(n_scl):
        kerns.append(np.concatenate([scaled_k[q][si] for q in range(pb)]))
    kernels = jnp.asarray(np.concatenate(kerns))
    wins = np.concatenate(wins).astype(np.int32)
    uniq, inv = np.unique(wins, axis=0, return_inverse=True)
    packed = PackedVariants(kernels, jnp.asarray(wins))
    return (
        gal, g_sizes, packed, layout, n_var,
        jnp.asarray(uniq.astype(np.int32)), jnp.asarray(inv.astype(np.int32)),
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    if SCALING:
        jax.config.update("jax_platforms", "cpu")

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        build_direct_cache, score_direct,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        build_epilogue_grid,
        pack_gallery_operands,
        pack_kernel_operands,
        score_packed_operands,
    )
    from shoeprint_image_retrieval_tpu.parallel.mesh import build_mesh
    from shoeprint_image_retrieval_tpu.parallel.sharded import (
        make_sharded_packed_scorer, shard_cache,
    )

    if SCALING:
        G, C, pb = 64, 8, 4
        g_lo, g_hi, q_lo, q_hi = 14, 18, 10, 14
        rotations, scales = [-9.0, 9.0], [1.04]
    else:
        G, C = 300, 176
        g_lo, g_hi, q_lo, q_hi = 38, 46, 28, 36
        pb = int(os.environ.get("PB", "40"))
        rotations = [-15, -9, -3, 3, 9, 15, 180]
        scales = [1.02, 1.04, 1.08]

    gal, g_sizes, packed, layout, n_var, slot_hw, slot_map = build_workload(
        G, C, g_lo, g_hi, q_lo, q_hi, pb, rotations, scales
    )
    N = layout.n_variants
    print(f"workload: G={G} C={C} PB={pb} n_var={n_var} N={N}", flush=True)

    cache = jax.jit(build_direct_cache)(jnp.asarray(gal), jnp.asarray(g_sizes))
    jax.block_until_ready(cache.p0)

    use_pallas = not SCALING
    # production grid epilogue on the pallas paths (EPI=slot for A/B)
    use_epi = use_pallas and os.environ.get("EPI", "grid") == "grid"
    epi = (
        tuple(jnp.asarray(a) for a in build_epilogue_grid(np.asarray(slot_hw)))
        if use_epi else None
    )

    # both sides run the HOISTED operand path (pack once, time the bare
    # kernel + wrapper) — the engine's production structure on each
    kernel_hw = tuple(int(v) for v in packed.kernels.shape[-2:])

    def run_direct():
        if use_pallas:
            gops = jax.block_until_ready(jax.jit(
                lambda c: pack_gallery_operands(
                    c, hk=kernel_hw[0], wk=kernel_hw[1])
            )(cache))
            ki = jax.block_until_ready(jax.jit(
                lambda k: pack_kernel_operands(
                    k, layout=layout, c_pad=cache.p0.shape[0])
            )(packed.kernels))
            f = jax.jit(lambda g, k, sh, sm, e=None: score_packed_operands(
                g, k, sh, sm, true_channels=C, layout=layout,
                hk=kernel_hw[0], wk=kernel_hw[1], epi=e)[:, :G])
            return f, (gops, ki, slot_hw, slot_map, epi)
        f = jax.jit(lambda c, p: score_direct(
            c, p, true_channels=C, layout=layout))
        return f, (cache, packed)

    f_direct, args_direct = run_direct()
    t0 = time.perf_counter()
    base = np.asarray(f_direct(*args_direct))
    print(f"unsharded compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f_direct(*args_direct)
    np.asarray(r)
    dt_base = (time.perf_counter() - t0) / reps
    print(f"unsharded: {dt_base*1e3:.1f} ms/batch -> {pb/dt_base:.2f} probes/s",
          flush=True)
    # free the unsharded side's hoisted operands (~7.6 GB at PB=56/G=300)
    # before the sharded scorer packs its own copy — both resident at once
    # OOM the part's 15.75 GB HBM; the measurements are sequential anyway
    del f_direct, args_direct, r

    shard_counts = [1, 2, 4, 8] if SCALING else [1]
    for n in shard_counts:
        if n > len(jax.devices()):
            break
        mesh = build_mesh(n)
        sc, g_true = shard_cache(cache, mesh)
        scorer = make_sharded_packed_scorer(
            mesh, sc, true_channels=C, layout=layout, g_true=g_true,
            use_pallas=use_pallas, use_epi=use_epi,
            kernel_hw=kernel_hw if use_pallas else None,
        )
        t0 = time.perf_counter()
        rows = np.asarray(scorer(packed, slot_hw, slot_map, epi))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            r = scorer(packed, slot_hw, slot_map, epi)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        g_pad = -(-G // n) * n
        ag_bytes = N * (g_pad // n) * 4 * (n - 1)  # ring all-gather, per device
        same = np.array_equal(rows, base)
        print(
            f"sharded n={n}: {dt*1e3:.1f} ms/batch -> {pb/dt:.2f} probes/s "
            f"(overhead vs unsharded {100*(dt-dt_base)/dt_base:+.1f}%), "
            f"G/shard={g_pad//n}, all-gather {ag_bytes/1e6:.2f} MB/device/batch, "
            f"compile {compile_s:.1f}s, scores identical={same}",
            flush=True,
        )
        if not same:
            diff = np.abs(rows - base).max()
            print(f"  max |delta| = {diff:.3e} (rank order check next)")
            order_same = np.array_equal(
                np.argsort(-rows, axis=1), np.argsort(-base, axis=1)
            )
            print(f"  rank order identical: {order_same}")


if __name__ == "__main__":
    main()

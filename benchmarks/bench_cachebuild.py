#!/usr/bin/env python3
"""Split the engine's per-cluster one-off scoring prep cost on the real chip.

The kernel-level headline bench (bench.py) stages `build_direct_cache`
OUTSIDE its timed loop, while the production engine pays it inside every
`_score_cluster` call (once per gallery block) — measured round 4 as most of
the engine-vs-kernel gap (16.00 vs 18.73 probes/s, BASELINE.md round-4
engine table). This bench answers: where does that ~1.5-1.8 s go, and does
an MXU (triangular-matmul) integral-image formulation beat the cumsum one?

Stages timed separately (bench.py shapes, G=300 C=176 by default):
  demean     masked per-print demean + channel pad + transpose
  int-cumsum the two integral images via jnp.cumsum (shipped ops.boxsum)
  int-matmul the same integrals as L_H @ p0 @ L_W^T prefix-sum matmuls
  full       build_direct_cache as shipped
  pack       pack_gallery_operands on the built cache

Timing discipline per the axon gotchas: real-byte pulls as barriers, one
warmup round per jit before the timed reps, nothing else on the host.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sync(tree) -> None:
    """Barrier that works over the axon tunnel: pull one real byte."""
    import jax

    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])  # no reshape copy


def timeit(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    sync(out)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        # free the previous rep's result BEFORE the next call: big outputs
        # (packed operands ~5 GB at G=300) would otherwise double-buffer in
        # HBM across reps. The per-rep sync barrier costs a tunnel roundtrip
        # (~ms) against ~1 s stage times.
        del out
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.boxsum import integral_image
    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        EDGE_CROP,
        _masked_demean,
        build_direct_cache,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        pack_gallery_operands,
    )

    G = int(os.environ.get("CB_G", "300"))
    C = int(os.environ.get("CB_C", "176"))
    g_lo, g_hi = 38, 46
    kernel_hw = (
        max(36, int(36 * 1.08)) - 2 * EDGE_CROP,
        max(36, int(36 * 1.08)) - 2 * EDGE_CROP,
    )

    log(f"devices: {jax.devices()}  G={G} C={C} canvas={g_hi} kernel={kernel_hw}")
    rng = np.random.default_rng(0)
    g_sizes = np.stack(
        [rng.integers(g_lo, g_hi + 1, G), rng.integers(g_lo, g_hi + 1, G)], 1
    ).astype(np.int32)
    g_sizes = g_sizes[np.argsort(-g_sizes[:, 0], kind="stable")]
    gal = np.zeros((G, C, g_hi, g_hi), np.float32)
    for i, (h, w) in enumerate(g_sizes):
        gal[i, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)

    gal_d = jnp.asarray(gal)
    sizes_d = jnp.asarray(g_sizes)
    sync(gal_d)

    hb, wb = g_hi - 2 * EDGE_CROP, g_hi - 2 * EDGE_CROP

    @jax.jit
    def demean_t(prints, valid_hw):
        p = prints[:, :, EDGE_CROP : EDGE_CROP + hb, EDGE_CROP : EDGE_CROP + wb]
        v = valid_hw - 2 * EDGE_CROP
        p0 = jax.vmap(lambda pm, vhw: _masked_demean(pm, vhw[0], vhw[1]))(p, v)
        c_pad = -(-C // 8) * 8
        if c_pad != C:
            p0 = jnp.pad(p0, ((0, 0), (0, c_pad - C), (0, 0), (0, 0)))
        return jnp.transpose(p0, (1, 0, 2, 3))

    p0 = demean_t(gal_d, sizes_d)
    sync(p0)

    @jax.jit
    def ints_cumsum(p0):
        return integral_image(p0), integral_image(p0 * p0)

    # prefix-sum as triangular matmuls: I = pad(L_H @ x @ L_W^T) where
    # L[i, j] = 1 for j <= i. K = H/W (~42) is far under the 128 MXU tile so
    # utilization is poor, but total work is ~31 GFLOP — milliseconds even
    # at 10% MXU efficiency, vs cumsum's multi-pass HBM traffic.
    lh = np.tril(np.ones((hb, hb), np.float32))
    lw = np.tril(np.ones((wb, wb), np.float32))

    @jax.jit
    def ints_matmul(p0):
        def one(x):  # x: (C, G, H, W)
            row = jnp.einsum("cghw,wv->cghv", x, jnp.asarray(lw.T))
            return jnp.einsum("uh,cghv->cguv", jnp.asarray(lh), row)

        i1 = jnp.pad(one(p0), ((0, 0), (0, 0), (1, 0), (1, 0)))
        i2 = jnp.pad(one(p0 * p0), ((0, 0), (0, 0), (1, 0), (1, 0)))
        return i1, i2

    build_j = jax.jit(build_direct_cache)
    pack_j = jax.jit(
        lambda c: pack_gallery_operands(c, hk=kernel_hw[0], wk=kernel_hw[1])
    )

    # per-dispatch roundtrip over this host<->device link: the engine issues
    # many small eager jit calls per cluster (sort, 8 pad_batch gathers per
    # probe batch, slot staging) — on a tunneled device each costs a
    # dispatch roundtrip that a local host does not pay
    tiny = jnp.zeros((8,), jnp.float32)
    inc = jax.jit(lambda x: x + 1.0)
    t_dispatch = timeit(inc, tiny, reps=20)

    # the engine's device-side gallery height-sort (_sort_take analog)
    order_d = jnp.asarray(np.argsort(-g_sizes[:, 0], kind="stable"))
    sort_j = jax.jit(lambda g, o: jnp.take(g, o, axis=0))
    t_sort = timeit(sort_j, gal_d, order_d)

    t_demean = timeit(demean_t, gal_d, sizes_d)
    t_cumsum = timeit(ints_cumsum, p0)
    t_matmul = timeit(ints_matmul, p0)

    @jax.jit
    def int_err(p0):  # compare on device; never materialize both pairs on host
        a1, a2 = ints_cumsum(p0)
        b1, b2 = ints_matmul(p0)
        return jnp.maximum(
            jnp.max(jnp.abs(a1 - b1)) / jnp.maximum(1.0, jnp.max(jnp.abs(a1))),
            jnp.max(jnp.abs(a2 - b2)) / jnp.maximum(1.0, jnp.max(jnp.abs(a2))),
        )

    err = float(int_err(p0))
    del p0
    t_full = timeit(build_j, gal_d, sizes_d)
    cache = build_j(gal_d, sizes_d)
    sync(cache.p0)
    del gal_d  # raw gallery no longer needed; make room for packed operands
    t_pack = timeit(pack_j, cache)

    log(f"jit dispatch roundtrip (8-elt) : {t_dispatch * 1e3:8.1f} ms")
    log(f"gallery sort (device take)     : {t_sort * 1e3:8.1f} ms")
    log(f"demean+transpose : {t_demean * 1e3:8.1f} ms")
    log(f"integrals cumsum : {t_cumsum * 1e3:8.1f} ms")
    log(f"integrals matmul : {t_matmul * 1e3:8.1f} ms  (rel err vs cumsum {err:.2e})")
    log(f"build_direct_cache (shipped): {t_full * 1e3:8.1f} ms")
    log(f"pack_gallery_operands       : {t_pack * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()

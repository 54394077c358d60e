#!/usr/bin/env python3
"""Isolate the per-batch variant-build + kernel-packing cost on TPU.

bench.py's end-to-end 18.2 probes/s vs kernel-only 19.1 leaves ~150 ms of
per-batch non-kernel device work (the variant build's rotation gather +
scale matmuls + fold + the packed-operand transpose). This probe times the
BUILD alone at bench shapes (PB=56, C=176, hc=wc=36, 25 variants), for
several formulations of the rotation step (reference similarity.py:230-266
is the host-PIL analog being replaced):

  take   — the shipped ``jnp.take(flat, ridx, axis=1)`` minor-dim gather
  rows   — gather whole (hc*wc, C) rows: ``flatT[ridx]`` (major-dim take,
           the TPU-friendly direction), transpose back after masking
  onehot — rotation as an MXU matmul against an iota-built one-hot matrix
           (exact in highest precision: one 1.0 term per output element)

Each is run through the production 8-probe lax.map chunking and the full
downstream build (scale einsum + fold + pack_kernel_operands), so numbers
are directly comparable to bench.py's per-batch gap.

Usage: python benchmarks/bench_build.py   (on the real TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        VariantLayout,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        pack_kernel_operands,
    )
    from shoeprint_image_retrieval_tpu.ops.warp import (
        pil_resize_size,
        resample_weights,
        rotate_index_map,
    )

    C, PB = 176, int(os.environ.get("BENCH_PB", "56"))
    q_lo, q_hi = 28, 36
    rotations = [-15, -9, -3, 3, 9, 15, 180]
    scales = [1.02, 1.04, 1.08]
    n_rot, n_scl = len(rotations), len(scales)
    hc = wc = q_hi
    smax = max(scales)
    tc = (max(hc, int(hc * smax)), max(wc, int(wc * smax)))
    kernel_hw = (tc[0] - 4, tc[1] - 4)
    class_counts = tuple([1] + [1 + n_rot] * n_scl)
    layout = VariantLayout(class_counts, PB)
    b0 = 1
    c_pad8 = -(-C // 8) * 8

    log(f"devices: {jax.devices()}  PB={PB} C={C} hc={hc} tc={tc}")
    rng = np.random.default_rng(0)

    q_sizes = np.stack(
        [rng.integers(q_lo, q_hi + 1, PB), rng.integers(q_lo, q_hi + 1, PB)], 1
    ).astype(np.int32)
    maps = np.zeros((PB, C, hc, wc), np.float32)
    ridx = np.zeros((PB, 1 + n_rot, hc * wc), np.int32)
    rok = np.zeros((PB, 1 + n_rot, hc, wc), bool)
    wv = np.zeros((PB, n_scl, tc[0], hc), np.float32)
    wh = np.zeros((PB, n_scl, tc[1], wc), np.float32)
    shw = np.zeros((PB, n_scl, 2), np.int32)
    for qi, (h, w) in enumerate(q_sizes):
        h, w = int(h), int(w)
        maps[qi, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)
        for ri, deg in enumerate([0.0] + rotations):
            idx, ok = rotate_index_map((h, w), deg, canvas_hw=(hc, wc))
            ridx[qi, ri] = idx.reshape(-1)
            rok[qi, ri] = ok
        for si, s in enumerate(scales):
            oh, ow = pil_resize_size((h, w), s)
            wv[qi, si] = resample_weights(h, oh, "bicubic", canvas_in=hc, canvas_out=tc[0])
            wh[qi, si] = resample_weights(w, ow, "bicubic", canvas_in=wc, canvas_out=tc[1])
            shw[qi, si] = (oh, ow)

    fold = jax.vmap(fold_template, in_axes=(0, None, None))
    fold_rs = jax.vmap(fold, in_axes=(0, 0, None))

    def rot_take(maps_p, ridx_p, rok_p):
        flat = maps_p.reshape(C, hc * wc)
        rot = jnp.take(flat, ridx_p, axis=1)  # (C, R+1, hc*wc)
        rot = jnp.moveaxis(rot, 0, 1).reshape(-1, C, hc, wc)
        return jnp.where(rok_p[:, None], rot, 0.0)

    def rot_rows(maps_p, ridx_p, rok_p):
        # gather whole feature rows: flatT is (hc*wc, C); taking along axis 0
        # moves lane-contiguous C-vectors instead of per-lane elements
        flat_t = maps_p.reshape(C, hc * wc).T
        rot = jnp.take(flat_t, ridx_p, axis=0)  # (R+1, hc*wc, C)
        rot = jnp.where(rok_p.reshape(1 + n_rot, hc * wc, 1), rot, 0.0)
        return jnp.moveaxis(rot, -1, 1).reshape(-1, C, hc, wc)

    def rot_onehot(maps_p, ridx_p, rok_p):
        # rotation as an MXU dot: out[r, c, p] = sum_k flat[c, k] * 1[ridx[r,p]==k]
        # exact in highest precision (single 1.0 tap per output element)
        flat = maps_p.reshape(C, hc * wc)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (hc * wc, 1), 0)
        oh_mat = (ridx_p[:, None, :] == k_iota[None]).astype(flat.dtype)  # (R+1, K, P)
        rot = jnp.einsum("ck,rkp->rcp", flat, oh_mat, precision="highest")
        rot = rot.reshape(-1, C, hc, wc)
        return jnp.where(rok_p[:, None], rot, 0.0)

    def build_with(rot_fn):
        def one(maps_p, valid_p, ridx_p, rok_p, wv_p, wh_p, shw_p):
            rot = rot_fn(maps_p, ridx_p, rok_p)
            base_k = fold(rot[:1], valid_p, kernel_hw)
            scaled = jnp.einsum(
                "soh,rchw,spw->srcop", wv_p, rot, wh_p, precision="highest"
            )
            return base_k, fold_rs(scaled, shw_p, kernel_hw)

        def build(maps_a, valid_a, ridx_a, rok_a, wv_a, wh_a, shw_a):
            args7 = (maps_a, valid_a, ridx_a, rok_a, wv_a, wh_a, shw_a)
            ch = max(d for d in range(1, min(8, PB) + 1) if PB % d == 0)
            if ch != PB:
                chunked = jax.tree.map(
                    lambda x: x.reshape(PB // ch, ch, *x.shape[1:]), args7
                )
                base_k, scaled_k = jax.lax.map(
                    lambda a: jax.vmap(one)(*a), chunked
                )
                base_k = base_k.reshape(PB, *base_k.shape[2:])
                scaled_k = scaled_k.reshape(PB, *scaled_k.shape[2:])
            else:
                base_k, scaled_k = jax.vmap(one)(*args7)
            ck = base_k.shape[-3:]
            kerns = [base_k.reshape(PB * b0, *ck)]
            for si in range(n_scl):
                kerns.append(scaled_k[:, si].reshape(PB * (1 + n_rot), *ck))
            return pack_kernel_operands(
                jnp.concatenate(kerns), layout=layout, c_pad=c_pad8,
                compute_dtype=jnp.float32,
            )

        return jax.jit(build)

    args = (
        jnp.asarray(maps), jnp.asarray(q_sizes), jnp.asarray(ridx),
        jnp.asarray(rok), jnp.asarray(wv), jnp.asarray(wh), jnp.asarray(shw),
    )
    jax.block_until_ready(args)

    def sync(out):
        # block_until_ready is unreliable over the axon tunnel (returns
        # before server-side execution completes); pulling real bytes from
        # every leaf is the only trustworthy barrier (same as bench.py)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
        return out

    results = {}
    baseline_out = None
    for name, rot_fn in [("take", rot_take), ("rows", rot_rows),
                         ("onehot", rot_onehot)]:
        fn = build_with(rot_fn)
        t0 = time.perf_counter()
        out = sync(fn(*args))
        compile_s = time.perf_counter() - t0
        n_rep = 5
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = sync(fn(*args))
        dt = (time.perf_counter() - t0) / n_rep * 1e3
        if baseline_out is None:
            baseline_out = out
            err = 0.0
        else:
            err = max(
                float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(baseline_out), jax.tree.leaves(out))
            )
        results[name] = dt
        log(f"{name:8s} build: {dt:8.2f} ms/batch  (compile {compile_s:.1f}s, "
            f"max |err| vs take = {err:.2e})")

    best = min(results, key=results.get)
    log(f"best: {best} ({results[best]:.2f} ms vs take {results['take']:.2f} ms)")


if __name__ == "__main__":
    main()

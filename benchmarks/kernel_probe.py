#!/usr/bin/env python3
"""Isolated NCC-kernel probe: time score_direct_pallas alone, f32 vs bf16.

bench.py times the full probe-batch step (variant build + fold + kernel).
This probe pre-builds the packed kernel stack once and times ONLY the
Pallas scoring call, with an exact dynamic-FLOP count (the kernel's y-row
bound skips dot rows past each lane-packed group's tallest print), so the
delivered TFLOP/s of the hot dots can be read directly and compared
against the MXU microbenchmark (mxu_probe.py).

Section timing: NCC_SKIP (with NCC_SKIP_ACK=1) elides kernel sections by
name — {rolls, epilogue, gather, dots} (the round-2 "mac" pass no longer
exists: the scaled accumulation is fused into the dot y-loop) — so each
section's wall share can be measured by difference.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
        build_direct_cache,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        derive_class_taps,
        pack_gallery_operands,
        pack_kernel_operands,
        score_direct_pallas,
        score_packed_operands,
    )
    from shoeprint_image_retrieval_tpu.ops.warp import pil_resize_size

    # G/C envs shrink the workload for CHECK=1 runs: the XLA-direct
    # validation oracle materializes the (N, G, h, w) correlation tensor,
    # which OOMs HBM at the full bench scale (measured 36.8 GB needed at
    # PB=24, G=300 on a 15.75 GB part) — the fused kernel itself never
    # builds it, which is the point of the fusion.
    G, C = int(os.environ.get("G", "300")), int(os.environ.get("C", "176"))
    g_lo, g_hi, q_lo, q_hi = 38, 46, 28, 36
    # Same class-major layout as bench.py — class_counts (1, 8, 8, 8):
    # the unscaled original, then (orig + 7 rotations) per scale, with the
    # per-(class, probe) window sizes the engine would produce.  Round 2's
    # standalone probe used a single flat 25-variant class, whose group
    # structure costs ~1.5 MB more scoped VMEM and OOMed at the shipped
    # PB=56; with the bench's fused-graph layout PB=56 fits (VERDICT r2
    # weak #8).
    PB = int(os.environ.get("PB", "56"))
    DTYPES = os.environ.get("DTYPES", "f32,bf16").split(",")
    scales = [1.02, 1.04, 1.08]
    class_counts = (1, 8, 8, 8)
    n_var = sum(class_counts)
    N = PB * n_var

    rng = np.random.default_rng(0)
    g_sizes = np.stack(
        [rng.integers(g_lo, g_hi + 1, G), rng.integers(g_lo, g_hi + 1, G)], 1
    ).astype(np.int32)
    g_sizes = g_sizes[np.argsort(-g_sizes[:, 0], kind="stable")]
    gal = np.zeros((G, C, g_hi, g_hi), np.float32)
    for i, (h, w) in enumerate(g_sizes):
        gal[i, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)
    cache = jax.jit(build_direct_cache)(jnp.asarray(gal), jnp.asarray(g_sizes))
    jax.block_until_ready(cache.p0)

    # one folded template canvas shared by all N rows (window sizes vary)
    tc = int(q_hi * max(scales))
    kernel_hw = (tc - 4, tc - 4)
    layout = VariantLayout(class_counts, PB)
    q_sizes = np.stack(
        [rng.integers(q_lo, q_hi + 1, PB), rng.integers(q_lo, q_hi + 1, PB)], 1
    ).astype(np.int32)
    # group (ci * PB + p) window: class 0 = probe p's base size, class
    # 1 + si = probe p's PIL-resized size at scales[si] (as the engine's
    # variant build produces)
    wins = np.zeros((layout.n_groups, 2), np.int32)
    wins[:PB] = q_sizes - 4
    for si, s in enumerate(scales):
        for p in range(PB):
            oh, ow = pil_resize_size((int(q_sizes[p, 0]), int(q_sizes[p, 1])), s)
            wins[(1 + si) * PB + p] = (oh - 4, ow - 4)
    # row i of the class-major stack belongs to group offset(ci) + p
    row_win = np.zeros((N, 2), np.int32)
    for ci, cnt in enumerate(class_counts):
        off = layout.class_offset(ci)
        for p in range(PB):
            row_win[off + p * cnt : off + (p + 1) * cnt] = wins[ci * PB + p]
    tmpl = np.zeros((N, C, tc, tc), np.float32)
    for i, (hw_, ww_) in enumerate(row_win + 4):
        tmpl[i, :, :hw_, :ww_] = rng.normal(size=(C, hw_, ww_)).astype(np.float32)
    fold = jax.vmap(fold_template, in_axes=(0, 0, None))
    fold_j = jax.jit(lambda t, v: fold(t, v, kernel_hw))
    # fold in equal chunks (one compiled shape) and free the raw template
    # stack: at deep PB the raw (N, C, tc, tc) stack + folded kernels
    # together would crowd HBM. CHUNK is the largest DIVISOR of N <= 256
    # (N = PB * 25 so one always exists >= 25): the earlier floor-divide
    # left a remainder tail that recompiled a second shape.
    CHUNK = max(d for d in range(1, min(N, 256) + 1) if N % d == 0)
    chunks = []
    for i in range(0, N, CHUNK):
        out = jax.block_until_ready(fold_j(
            jnp.asarray(tmpl[i : i + CHUNK]),
            jnp.asarray(row_win[i : i + CHUNK] + 4),
        ))
        chunks.append(out)
    kernels = jnp.concatenate(chunks)
    del tmpl, chunks
    uniq, inv = np.unique(wins, axis=0, return_inverse=True)
    packed = PackedVariants(kernels, jnp.asarray(wins))
    slot_hw = jnp.asarray(uniq.astype(np.int32))
    slot_map = jnp.asarray(inv.astype(np.int32))

    # EPI=grid (default): cross-product epilogue — one wide band-dot per
    # distinct window HEIGHT; EPI=slot: the per-(h, w) loop, for A/B.
    epi = None
    if os.environ.get("EPI", "grid") == "grid":
        from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
            build_epilogue_grid,
        )

        epi = build_epilogue_grid(uniq)
        print(
            f"epilogue: grid {len(epi[0])}x{len(epi[1])} cells over "
            f"{len(uniq)} slots", flush=True,
        )
    else:
        print(f"epilogue: per-slot ({len(uniq)} slots)", flush=True)

    # per-class tap canvases: each class's dots contract only over its own
    # maximum window (centered sub-rectangle; excluded taps are exact
    # zeros). Default OFF: measured 16.30 -> 10.29 probes/s on v5e at the
    # shipped shapes — Mosaic's per-class patch sub-slices cost far more
    # than the ~6% FLOP savings (BASELINE.md round-3 negative results).
    # CLASS_CANVAS=1 enables for A/B on other parts/shapes.
    class_canvas = None
    if os.environ.get("CLASS_CANVAS", "0") == "1":
        class_canvas = tuple(
            (int(wins[ci * PB : (ci + 1) * PB, 0].max()),
             int(wins[ci * PB : (ci + 1) * PB, 1].max()))
            for ci in range(len(class_counts))
        )
        print(f"class canvases: {class_canvas} (full {kernel_hw})", flush=True)

    # exact dot FLOPs given the dynamic y bound + lane packing
    hk, wk = kernel_hw
    hb = wb = g_hi - 4
    n_pad = -(-N // 8) * 8
    gt = max(1, min(4, 128 // wb))
    g_pad = -(-G // gt) * gt
    heights = np.concatenate([g_sizes[:, 0] - 4, np.full(g_pad - G, 8)])
    lanes = gt * wb
    # per-class tap rectangles shrink each class's contraction depth
    if class_canvas is not None:
        row_taps = sum(
            (-(-PB * cnt // 8) * 8) * class_canvas[ci][0] * class_canvas[ci][1]
            for ci, cnt in enumerate(class_counts)
        )
    else:
        row_taps = n_pad * hk * wk
    flops = 0
    for gg in range(g_pad // gt):
        rows_max = heights[gg * gt : (gg + 1) * gt].max()
        yblocks = -(-int(rows_max) // 8)
        flops += yblocks * 8 * 2 * row_taps * lanes
    flops *= C
    print(f"G={G} C={C} N={N} kernel={kernel_hw} gt={gt} "
          f"dot FLOPs/batch = {flops/1e12:.2f} TF "
          f"({flops/PB/1e12:.3f} TF/probe)", flush=True)

    # pre-pack both operand sides so "kernel only" times the bare Pallas
    # call — the production engine hoists the packing exactly like this
    # (gallery operands once per block, kernel operands once per batch)
    c_pad = cache.p0.shape[0]
    class_taps = derive_class_taps(
        class_canvas, hk=kernel_hw[0], wk=kernel_hw[1],
        n_classes=len(class_counts),
    )
    gops = jax.block_until_ready(jax.jit(
        lambda c: pack_gallery_operands(c, hk=kernel_hw[0], wk=kernel_hw[1])
    )(cache))

    for name, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        if name not in DTYPES:
            continue
        ki = jax.block_until_ready(jax.jit(
            lambda k, _dt=dt_: pack_kernel_operands(
                k, layout=layout, c_pad=c_pad, compute_dtype=_dt,
                class_taps=class_taps,
            )
        )(packed.kernels))
        f = jax.jit(
            lambda g, k, sh, sm, _dt=dt_: score_packed_operands(
                g, k, sh, sm, true_channels=C, layout=layout,
                hk=kernel_hw[0], wk=kernel_hw[1], class_taps=class_taps,
                compute_dtype=_dt, epi=epi,
            )
        )
        t0 = time.perf_counter()
        np.asarray(f(gops, ki, slot_hw, slot_map))
        print(f"{name}: compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(gops, ki, slot_hw, slot_map)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms/batch -> {flops/dt/1e12:.1f} TF/s, "
              f"{PB/dt:.2f} probes/s (kernel only)", flush=True)

    # CHECK=1: validate the fused kernel ON THIS DEVICE against the XLA
    # direct path (same formulas, no Pallas, no DMA) — interpret-mode tests
    # can't exercise real DMA-ring semantics, so device-only races would
    # otherwise be invisible to the suite. f32 scores must agree to MXU
    # summation-order tolerance and rank vectors must match exactly.
    if os.environ.get("CHECK") == "1":
        from shoeprint_image_retrieval_tpu.ops.ncc_direct import score_direct

        got = np.asarray(
            jax.jit(
                lambda c, p, sh, sm: score_direct_pallas(
                    c, p, true_channels=C, layout=layout,
                    slot_hw=sh, slot_map=sm, class_canvas_hw=class_canvas,
                    epi=epi,
                )
            )(cache, packed, slot_hw, slot_map)
        )
        want = np.asarray(
            jax.jit(
                lambda c, p: score_direct(
                    c, p, true_channels=C, layout=layout
                )
            )(cache, packed)
        )
        err = np.abs(got - want).max()
        # a DMA race would corrupt whole energy maps -> order-1 errors;
        # agreement at MXU summation-order tolerance rules that out. Rank
        # flips are only tolerable between random near-ties (gap below the
        # measured backend-difference scale, BASELINE.md rank stability).
        top_got = np.argsort(-got, axis=1, kind="stable")
        top_want = np.argsort(-want, axis=1, kind="stable")
        n_flip = int((top_got != top_want).any(axis=1).sum())
        srt = -np.sort(-want, axis=1)
        min_gap = float(np.min(np.abs(np.diff(srt, axis=1))))
        print(f"CHECK: |pallas - direct| max = {err:.3e}, rows with any rank "
              f"disagreement = {n_flip}/{got.shape[0]} "
              f"(min adjacent score gap {min_gap:.1e})", flush=True)
        assert err < 3e-4, err


if __name__ == "__main__":
    main()

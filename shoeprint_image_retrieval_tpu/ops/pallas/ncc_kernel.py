"""Fused Pallas NCC scoring kernel — the framework's hot-path kernel.

Computes the same quantity as :func:`..ncc_direct.score_direct` (the
reference's per-pair normalized cross-correlation, summed over channels,
maxed over shifts — reference similarity.py:26-108) with every per-channel
intermediate living in VMEM.

grid = (G / GT, C), sequential; each step handles GT prints x 1 channel:

1. **Gallery lane packing**: GT prints sit side by side on the lane axis
   with a (wk-1)-zero separation, so correlation windows never cross print
   boundaries and the dot's output lanes are ~fully dense (GT*wb ~ 128
   instead of wb ~ 42 of 128 — a naive single-print layout wastes ~3x of
   every MXU pass on lane padding).
2. **Patch build** (VMEM only): the vertically padded packed canvas is
   lane-rolled once per tap column; tap-row-blocked block copies assemble
   the im2col patch stack.
3. **Energy epilogue**: per DISTINCT window size (slot), box sums come from
   packed, edge-extended integral images (clip semantics baked into the
   extension): a per-height dynamic sublane-roll row pass, then ONE MXU dot
   against an iota-built +-1 band matrix does the column box-sum AND the
   per-print lane compaction in a single pass (no lane-crossing VPU work)
   -> per-slot ``1/sqrt(energy)`` maps.
4. **einv gather**: async DMAs (one per group, issued up front on a
   byte-counting semaphore, drained under the patch build) expand the
   slot maps to a per-group scratch, so the dot loop's scaled
   accumulation is pure vector FMAs with static class offsets — the
   expansion costs ~67 ms of a ~3.4 s PB=56 batch.
5. **Fused MXU dots + accumulate**: per 8-row output block,
   ``kernels (N, u_blk*wk) @ patches`` with every variant of every probe
   on the N axis, immediately scaled by the group's einv rows and added
   into the cross-channel VMEM accumulator — the correlation tensor is
   never materialized (round 2 stored a full (N, Hb, lanes) corr scratch
   and re-read it in a per-probe mac pass: +34 MB VMEM and ~2x the
   accumulate traffic).
6. At the last channel step: per-print masked max over valid positions,
   ``/ C`` (reference similarity.py:106-108), one (N,) row per print to HBM.

HBM traffic per probe-batch is the cache + kernel reads (~30 GB at WVU
scale vs ~1 TB materialized by the XLA formulations).

Mosaic constraints encoded here: no lane-crossing reshapes; dynamic slicing
only through refs (`pl.ds`) and only on sublanes; dynamic lane selection via
`pltpu.roll` on 128-aligned widths; rolls require 32-bit data; reductions
one axis at a time.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple as _NamedTuple, Sequence

# Profiling knob (benchmarks/kernel_probe.py, BASELINE.md kernel time
# split): NCC_SKIP is a comma-set of kernel sections to elide —
# {rolls,dots,epilogue,gather} — so each section's wall share can be
# measured by difference. 'gather' elides the per-slot einv writes nested
# inside the epilogue loop (skipping 'epilogue' skips both). (The round-2
# 'mac' section no longer exists: the scaled accumulation is fused into
# the dot loop and elides with 'dots'.)
# Results are garbage when any section is skipped, so a
# stray NCC_SKIP in a job environment must never silently corrupt real
# runs: it is refused unless NCC_SKIP_ACK=1 explicitly acknowledges a
# profiling session, and even then a loud stderr banner marks every import.
_SKIP = set(filter(None, os.environ.get("NCC_SKIP", "").split(",")))
_SKIP_KNOWN = {"rolls", "dots", "epilogue", "gather"}
if _SKIP - _SKIP_KNOWN:
    raise RuntimeError(
        f"NCC_SKIP names unknown kernel sections {sorted(_SKIP - _SKIP_KNOWN)} "
        f"(known: {sorted(_SKIP_KNOWN)}) — a skip that elides nothing would "
        "silently corrupt the by-difference profiling methodology."
    )
if _SKIP:
    if os.environ.get("NCC_SKIP_ACK") != "1":
        raise RuntimeError(
            f"NCC_SKIP={sorted(_SKIP)} would elide kernel sections and produce "
            "garbage scores. This is a profiling-only knob: set NCC_SKIP_ACK=1 "
            "to acknowledge, or unset NCC_SKIP."
        )
    import sys as _sys

    print(
        f"*** NCC_SKIP={sorted(_SKIP)}: kernel sections ELIDED — scores are "
        "garbage (profiling mode) ***",
        file=_sys.stderr,
        flush=True,
    )

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ncc_direct import (
    DirectGalleryCache,
    PackedVariants,
    VariantGroup,
    VariantLayout,
    pack_variant_groups,
)


def _extend_integral(integral: jnp.ndarray, top: int, bot: int) -> jnp.ndarray:
    """Pad an integral image with zeros (top/left) and edge-replication
    (bottom/right) so clipped box-sum indices become plain offsets."""
    z = jnp.pad(integral, [(0, 0)] * (integral.ndim - 2) + [(top, 0), (top, 0)])
    return jnp.pad(z, [(0, 0)] * (integral.ndim - 2) + [(0, bot), (0, bot)], mode="edge")


def _pack_lanes(x: jnp.ndarray, gt: int) -> jnp.ndarray:
    """(C, G, H, W) -> (C, G/gt, H, gt*W): gt prints side by side on lanes."""
    c, g, h, w = x.shape
    x = x.reshape(c, g // gt, gt, h, w)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(c, g // gt, h, gt * w)


def _kernel_body(
    class_counts: tuple[int, ...],
    class_taps: tuple[tuple[int, int, int, int], ...],  # per class (hk_c, wk_c, du, dv)
    pb: int,
    gt: int,
    hb: int,
    hb_pad: int,
    wb: int,
    hk: int,
    wk: int,
    we: int,
    top: int,
    true_channels: int,
    compute_dtype,
    grid_epi: tuple[int, int] | None,  # (n_h_pad, n_w_pad) cross-product epilogue
    # refs (in order): 3-4 SMEM inputs, packed-operand inputs, one kern
    # input PER CLASS, the output, then the scratch refs (see unpack below)
    *refs,
):
    n_kern = 1 if class_taps is None else len(class_counts)
    if grid_epi is None:
        (slot_hw_ref,  # SMEM (n_slots, 2) int32 distinct window sizes
         smap_ref,     # SMEM (n_groups,) int32 group -> slot index
         gvalid_ref,   # SMEM (G_pad, 2) int32 per-print valid sizes (full array)
         p0_ref,       # VMEM (1, 1, hb, gt*ws) packed prints
         int12_ref,    # VMEM (1, 1, 2*he, Wi): int1 over int2, packed + extended
         lidx_ref,     # VMEM (1, 1, lanes_e) int32 box-sum source column per lane
         ) = refs[:6]
        kern_refs = refs[6 : 6 + n_kern]  # VMEM (1, n_cls_pad, hk_c*wk_c) each
        (out_ref,      # VMEM (G_pad, n_pad) — full scores block
         acc_ref,      # scratch VMEM (n_pad, hb, gt*wb)
         rolls_ref,    # scratch VMEM (wk, hp, gt*wb) compacted
         einv_ref,     # scratch VMEM (n_groups, hb_pad, gt*wb) per-group 1/sqrt(E)
         slots_ref,    # scratch VMEM (n_slots, hb_pad, gt*wb) per-slot 1/sqrt(energy)
         rowdiff_ref,  # scratch VMEM (2*hb_pad, Wi) row box-sum pass, shared per h
         ) = refs[6 + n_kern :]
    else:
        # hts/cell are (n, 1) 2-D with the TRACED index on the LEADING axis:
        # any other dynamic SMEM read form traces to a gather, which Mosaic
        # cannot lower (the slot path's reads are all slot_hw_ref[si, 0])
        (hts_ref,      # SMEM (n_h_pad, 1) int32 distinct window heights
         cell_ref,     # SMEM (n_h_pad*n_w_pad, 1) int32 grid cell -> slot row
         smap_ref,     # SMEM (n_groups,) int32 group -> slot index
         gvalid_ref,   # SMEM (G_pad, 2) int32 per-print valid sizes
         p0_ref,       # VMEM (1, 1, hb, gt*ws) packed prints
         int12_ref,    # VMEM (1, 1, 2*he, Wi): int1 over int2, packed + extended
         hi_idx_ref,   # VMEM (1, 1, Wn) int32 band hi column per output lane
         lo_idx_ref,   # VMEM (1, 1, Wn) int32 band lo column per output lane
         wvec_ref,     # VMEM (1, 1, Wn) f32 window width per output lane
         ) = refs[:9]
        kern_refs = refs[9 : 9 + n_kern]
        (out_ref,
         acc_ref,
         rolls_ref,
         einv_ref,
         slots_ref,    # scratch VMEM (n_slots+1, hb_pad, lanes_e); last row = trash
         band_ref,     # scratch VMEM (Wi, Wn) f32 +-1 band matrix, built once
         ) = refs[9 + n_kern :]
    gg = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    ws = wb + wk - 1

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # --- patch build (VMEM). pltpu.roll needs 32-bit data, so the roll runs
    # on the f32 p0 rows and the compacted store casts to the compute dtype:
    # in bf16 mode the rolls scratch holds bf16, halving the dot-operand
    # VMEM traffic the y loop streams (the dots measure as operand-bound:
    # f32 and bf16 MXU rates are identical on this part).
    # Deferred to a helper: the patch build runs BETWEEN the einv DMA issue
    # and its wait (see the gather section) so the expansion's copy
    # latencies drain under this vector work.
    def patch_rolls():
        padded = jnp.pad(
            p0_ref[0, 0], ((hk // 2, hk - 1 - hk // 2 + (hb_pad - hb) + 7), (0, 0))
        )
        wp = gt * ws
        for v in range(wk) if "rolls" not in _SKIP else ():
            # rolled[., x] = padded[., x + v]; windows stay inside each
            # print's ws-wide span because x_local + v <= wb - 1 + wk - 1
            # < ws. Stored compacted to the per-print wb columns (the
            # ws-wide scratch would dominate VMEM at packed widths).
            rolled = pltpu.roll(padded, wp - v, axis=1) if v else padded
            rolls_ref[v] = jnp.concatenate(
                [rolled[:, p * ws : p * ws + wb] for p in range(gt)], axis=1
            ).astype(compute_dtype)

    # --- energy epilogue, deduped per distinct window size ------------------
    # 1/sqrt(local energy) depends only on the window (h, w), not on which
    # group/variant uses it — real probe batches repeat sizes heavily (all
    # rotations of a probe, equal-sized probes, equal scaled sizes), so the
    # box-sum work runs once per SLOT (distinct size). Runs BEFORE the dots:
    # the dot loop consumes the expanded per-group maps directly.
    wi = int12_ref.shape[-1]  # 128-aligned packed integral width
    he2 = int12_ref.shape[-2]  # 2*he: int1 stacked over int2
    he = he2 // 2
    n_slots = slots_ref.shape[0]
    # slots/einv lane dims are padded to a 128 multiple: Mosaic DMA slices
    # must be lane-tile-aligned (a (1, hb_pad, 126) memref_slice is rejected
    # on hardware), so the expansion copies the padded rows and the dot loop
    # slices the loaded VALUE back down to the live gt*wb lanes.
    lanes_e = einv_ref.shape[-1]

    # --- cross-product ("grid") energy epilogue ------------------------------
    # The per-slot loop below pays its fixed costs (band build, a narrow
    # N=lanes_e MXU dot, loop scalar overhead) once per DISTINCT (h, w)
    # window size — ~87 iterations at WVU batch scale. But the row pass
    # depends only on h and the band only on w, so the whole slot set
    # factors into a (distinct heights) x (distinct widths) grid: ONE wide
    # band matrix covering every distinct width side by side (block j =
    # width j's +-1 columns), built once per kernel call into scratch, and
    # one (2*hb_pad, Wi) @ (Wi, n_w*lanes_e) dot per distinct HEIGHT
    # (~12 iterations) produces every (h, *) energy map in a single MXU
    # pass. A host-built cell->slot table routes each grid cell's map to
    # its slot row (cells with no live slot go to the trash row), so the
    # einv expansion and the dot loop are unchanged. Per-lane math is
    # bit-identical to the per-slot path: same +-1 band columns, same
    # two-term dot, and n_win = h*w is exact in f32 for window-sized ints.
    if grid_epi is not None:
        n_h_pad, n_w_pad = grid_epi
        wn = band_ref.shape[-1]

        @pl.when((gg == 0) & (c == 0))
        def _build_band():
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (wi, wn), 0)
            band_ref[:] = (rows_i == hi_idx_ref[0]).astype(jnp.float32) - (
                rows_i == lo_idx_ref[0]
            ).astype(jnp.float32)

        def height_energy(hi, _):
            h = hts_ref[hi, 0]
            lo_h = top - h // 2
            hi_h = top + (h - 1) // 2 + 1
            full = int12_ref[0, 0]  # (2he, wi)
            hi_rows = pltpu.roll(full, he2 - hi_h, axis=0)
            lo_rows = pltpu.roll(full, he2 - lo_h, axis=0)
            rowdiff = jnp.concatenate(
                [
                    hi_rows[:hb_pad] - lo_rows[:hb_pad],    # int1 rows
                    hi_rows[he : he + hb_pad] - lo_rows[he : he + hb_pad],
                ],
                axis=0,
            )  # (2*hb_pad, wi)
            compact = jnp.dot(
                rowdiff, band_ref[:], preferred_element_type=jnp.float32
            )  # (2*hb_pad, wn)
            b1 = compact[:hb_pad]
            b2 = compact[hb_pad:]
            n_win = h.astype(jnp.float32) * wvec_ref[0]  # (1, wn)
            energy = jnp.maximum(b2 - b1 * b1 / n_win, 0.0)
            emap = jnp.where(energy > 0, jax.lax.rsqrt(energy), 0.0)
            # NOTE emap[:, a:b][None], not emap[None, :, a:b]: mixing None
            # with slices in ONE indexing op traces to a lax.gather Mosaic
            # cannot lower (hardware-only failure; interpret mode accepts it)
            for j in range(n_w_pad):
                slots_ref[pl.ds(cell_ref[hi * n_w_pad + j, 0], 1)] = emap[
                    :, j * lanes_e : (j + 1) * lanes_e
                ][None]
            return _

        if "epilogue" not in _SKIP:
            jax.lax.fori_loop(0, n_h_pad, height_energy, None)

    def slot_energy(si, _):
        h = slot_hw_ref[si, 0]
        w = slot_hw_ref[si, 1]
        lo_w = top - w // 2
        hi_w = top + (w - 1) // 2 + 1

        # The row pass depends only on h. Slots arrive sorted by (h, w)
        # (np.unique sorts rows), so consecutive slots share h in runs —
        # recompute the two sublane rolls only when h changes (typically
        # ~10 distinct heights serve ~75 slots at WVU batch scale).
        prev_h = slot_hw_ref[jnp.maximum(si - 1, 0), 0]

        @pl.when((si == 0) | (h != prev_h))
        def _row_pass():
            lo_h = top - h // 2
            hi_h = top + (h - 1) // 2 + 1
            # dynamic offsets become dynamic rolls (Mosaic forbids unaligned
            # dynamic slice starts). int1 and int2 are stacked on sublanes so
            # one pair of sublane rolls serves both box sums: rolled[y] reads
            # full[y + off] within each half because off + hb < he.
            full = int12_ref[0, 0]  # (2he, wi)
            hi_rows = pltpu.roll(full, he2 - hi_h, axis=0)
            lo_rows = pltpu.roll(full, he2 - lo_h, axis=0)
            rowdiff_ref[:] = jnp.concatenate(
                [
                    hi_rows[:hb_pad] - lo_rows[:hb_pad],    # int1 rows
                    hi_rows[he : he + hb_pad] - lo_rows[he : he + hb_pad],
                ],
                axis=0,
            )  # (2*hb_pad, wi)

        rowdiff = rowdiff_ref[:]
        # Column box-sum + per-print compaction as ONE MXU dot. The naive
        # lane pass (two dynamic LANE rolls of rowdiff + subtract + a
        # lane-crossing compaction concatenate) is all lane-crossing VPU
        # work — measured ~280 ms of a 3.43 s PB=56 batch. Instead the
        # constant 0/1 selection matrix (input row q*we+x -> output lane
        # q*wb+x) is rolled along its SUBLANE axis (cheap on TPU; lanes
        # untouched) by hi_w/lo_w, so
        #   (rowdiff @ (roll(sel, hi_w) - roll(sel, lo_w)))[r, q*wb+x]
        #     = rowdiff[r, q*we+x+hi_w] - rowdiff[r, q*we+x+lo_w]
        # exactly the clipped box sum. The +-1 band matrix is exact in f32
        # and each output is a two-term sum, so the only new rounding is
        # the MXU's f32(bf16x3) product pass — bounded by ~1e-7 x |operand|
        # (validated on device by kernel_probe CHECK=1 and the backend
        # rank-identity suite). Built by two iota compares (pure VPU, no
        # dynamic roll lowering); indices never wrap: lidx + hi_w
        # <= (gt-1)*we + (wb-1) + (we - wb) < gt*we <= wi.
        lidx = lidx_ref[0]  # (1, lanes_e) int32 source column per out lane
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (wi, lanes_e), 0)
        band = (rows_i == lidx + hi_w).astype(jnp.float32) - (
            rows_i == lidx + lo_w
        ).astype(jnp.float32)
        compact = jnp.dot(
            rowdiff, band, preferred_element_type=jnp.float32
        )  # (2*hb_pad, lanes_e)
        b1 = compact[:hb_pad]
        b2 = compact[hb_pad:]
        n_win = (h * w).astype(jnp.float32)
        energy = jnp.maximum(b2 - b1 * b1 / n_win, 0.0)
        slots_ref[pl.ds(si, 1)] = jnp.where(
            energy > 0, jax.lax.rsqrt(energy), 0.0
        )[None]
        return _

    if grid_epi is None and "epilogue" not in _SKIP:
        jax.lax.fori_loop(0, n_slots, slot_energy, None)

    # --- einv gather: expand slot maps to per-group rows --------------------
    # Async DMAs, one per group, all issued up front on ONE byte-counting
    # semaphore, drained under the patch build (issuing every copy before
    # the waits lets the DMA engines overlap the copy latencies; a
    # semaphore counts BYTES, so waits and completions commute).
    # Measured marginal cost at PB=56 (224 copies x 24 KB x 1232 grid
    # steps): ~67 ms/batch (NCC_SKIP=gather 3363.8 vs full 3430.9,
    # 2026-08-18). NOTE the round-2/early-round-3 "einv expansion ~612 ms"
    # attribution was a dead-code artifact: the einv writes then lived
    # inside the slot loop, so skipping them let Mosaic DCE the ENTIRE
    # slot computation — the 612 ms was mostly the box-sum arithmetic
    # itself (see BASELINE.md round-3 split). Every expansion formulation
    # tried (fori dynamic stores, static unroll, fused-in-slot-loop, async
    # DMA) lands within 3390-3466 ms total, i.e. equal within this part's
    # run spread.
    # SIR_EINV_DMA=0 falls back to the synchronous unrolled-copy expansion
    # (the measured-safe formulation) if the DMA path misbehaves on some
    # part/toolchain; default is the async-DMA overlap.
    if "gather" not in _SKIP and os.environ.get("SIR_EINV_DMA", "1") == "1":
        n_g = einv_ref.shape[0]

        def gather_dma(sem):
            handles = []
            for gi in range(n_g):
                dma = pltpu.make_async_copy(
                    slots_ref.at[pl.ds(smap_ref[gi], 1)],
                    einv_ref.at[gi : gi + 1],
                    sem,
                )
                dma.start()
                handles.append(dma)
            patch_rolls()  # overlap the drain with the patch build
            for dma in handles:
                dma.wait()

        pl.run_scoped(gather_dma, pltpu.SemaphoreType.DMA(()))
    else:
        if "gather" not in _SKIP:
            for gi in range(einv_ref.shape[0]):
                einv_ref[gi : gi + 1] = slots_ref[pl.ds(smap_ref[gi], 1)]
        patch_rolls()

    # --- fused MXU dots + scaled accumulation -------------------------------
    # The im2col patch matrix for output row y is exactly
    # rolls[:, y : y + hk, :] collapsed over its leading two dims (a
    # layout-preserving reshape: lanes untouched) — so the dot streams the
    # rolls scratch directly and no patch matrix is ever materialized.
    # Kernels are pre-laid out host-side as (v, u)-major to match. Each
    # 8-row dot block is immediately scaled by its group's einv rows and
    # accumulated: the correlation tensor never exists in memory.
    #
    # Per-class tap rectangles: fold_template centers every variant on the
    # shared canvas and zero-fills outside its window, so a class whose
    # windows all fit a smaller centered sub-canvas (hk_c, wk_c) can
    # restrict its dot to that rectangle — the excluded taps are exact
    # zeros and contribute nothing. The sub-slice offsets (du, dv) are
    # static per class, so each class streams a smaller slice of the SAME
    # rolls scratch (no extra operand build): dot FLOPs scale with each
    # class's own canvas instead of the batch-wide maximum.
    lanes = rolls_ref.shape[-1]

    def y_block(yb, _):
        # one aligned rolls load per 8 output rows keeps VMEM temps bounded
        # (a fully unrolled per-y loop makes Mosaic hold 40+ live slices)
        y0 = pl.multiple_of(yb * 8, 8)
        blk = rolls_ref[:, pl.ds(y0, hk + 7), :]  # (wk, hk+7, lanes), dtype
        if class_taps is None:
            # uniform canvas: ONE deep dot per dy over every class's rows
            kern = kern_refs[0][0]  # (n_pad, wk*hk), (v, u)-major taps
            parts = []
            for dy in range(8):
                rhs = blk[:, dy : dy + hk, :].reshape(wk * hk, lanes)
                parts.append(
                    jnp.dot(kern, rhs, preferred_element_type=jnp.float32)
                )
            corr_all = jnp.stack(parts, axis=1)  # (n_pad, 8, lanes)
        start = 0
        for ci, cnt in enumerate(class_counts):
            n_cls = pb * cnt
            if class_taps is None:
                corr = corr_all[start : start + n_cls]
            else:
                hk_c, wk_c, du, dv = class_taps[ci]
                kern = kern_refs[ci][0]  # (n_cls_pad, wk_c*hk_c), (v, u)-major
                parts = []
                for dy in range(8):
                    rhs = blk[
                        dv : dv + wk_c, du + dy : du + dy + hk_c, :
                    ].reshape(wk_c * hk_c, lanes)
                    parts.append(
                        jnp.dot(kern, rhs, preferred_element_type=jnp.float32)
                    )
                corr = jnp.stack(parts, axis=1)[:n_cls]  # (n_cls, 8, lanes)
            # FMA: class offsets are static; leading-axis reshapes are
            # layout-preserving (sublane/lane dims untouched)
            slab = corr.reshape(pb, cnt, 8, lanes)
            ei = einv_ref[ci * pb : (ci + 1) * pb, pl.ds(y0, 8), :]
            if lanes_e != lanes:  # drop the DMA-alignment lanes (value slice)
                ei = ei[:, :, :lanes]
            cur = acc_ref[start : start + n_cls, pl.ds(y0, 8), :]
            acc_ref[start : start + n_cls, pl.ds(y0, 8), :] = (
                cur + (slab * ei[:, None]).reshape(n_cls, 8, lanes)
            )
            start += n_cls
        return _

    # dynamic y bound: output rows past this step's tallest print are never
    # read (the final max masks per print's valid rows; rows the loop skips
    # keep their prior acc values, which only land in masked-out positions)
    # — so their MXU dots are skipped outright. Pays when the caller sorts
    # the gallery by height so lane-packed prints share heights.
    rows_max = gvalid_ref[gg * gt, 0]
    for p in range(1, gt):
        rows_max = jnp.maximum(rows_max, gvalid_ref[gg * gt + p, 0])
    if "dots" not in _SKIP:
        jax.lax.fori_loop(0, (rows_max + 7) // 8, y_block, None)

    # --- final per-print masked max at the last channel --------------------
    @pl.when(c == n_c - 1)
    def _finish():
        rows = jax.lax.broadcasted_iota(jnp.int32, (hb_pad, wb), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hb_pad, wb), 1)
        for p in range(gt):
            gidx = gg * gt + p
            ok = (rows < gvalid_ref[gidx, 0]) & (cols < gvalid_ref[gidx, 1])
            masked = jnp.where(
                ok[None], acc_ref[:, :, p * wb : (p + 1) * wb], jnp.float32(-jnp.inf)
            )
            # chained single-axis maxes: Mosaic miscompiles axis=(1, 2)
            out_ref[gidx, :] = jnp.max(jnp.max(masked, axis=2), axis=1) / true_channels


# ---------------------------------------------------------------------------
# VMEM budgeting — derived from the device, not baked-in magic numbers.
# ---------------------------------------------------------------------------

def mosaic_headroom_bytes(n_pad: int) -> int:
    """Mosaic's compile-time stack/temporaries need beyond the declared
    scratch + pipeline blocks, as a function of the MXU row depth. Measured
    on v5e for this kernel: <=46 MB at N=1400, 55.2 MB at N=1800 (the
    compiler reports the exact stack need on OOM) — ~24 KB/row + base.
    SIR_VMEM_HEADROOM overrides with an absolute byte count."""
    env = os.environ.get("SIR_VMEM_HEADROOM")
    if env:
        return int(env)
    return 16 * 1024 * 1024 + 24 * 1024 * n_pad

# Per-core VMEM by TPU generation (bytes). Every currently shipping TPU
# exposes 128 MiB of VMEM per core (v4/v5e/v5p/v6e per the public TPU system
# docs); the table exists so a future part with a different size is a
# one-line change (and SIR_VMEM_BYTES overrides without code).
_VMEM_BY_KIND = {
    "TPU v4": 128 * 1024 * 1024,
    "TPU v5 lite": 128 * 1024 * 1024,
    "TPU v5e": 128 * 1024 * 1024,
    "TPU v5": 128 * 1024 * 1024,
    "TPU v5p": 128 * 1024 * 1024,
    "TPU v6 lite": 128 * 1024 * 1024,
    "TPU v6e": 128 * 1024 * 1024,
}


def device_vmem_bytes() -> int:
    """Total per-core VMEM of the attached device (env/table/default)."""
    env = os.environ.get("SIR_VMEM_BYTES")
    if env:
        return int(env)
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    # longest prefix wins: "TPU v5p" must not be shadowed by "TPU v5"
    for prefix in sorted(_VMEM_BY_KIND, key=len, reverse=True):
        if kind.startswith(prefix):
            return _VMEM_BY_KIND[prefix]
    return 128 * 1024 * 1024


def vmem_cap_bytes() -> int:
    """Scoped-VMEM ceiling to request: the part total minus 1 MiB (asking
    for the full size is rejected; 1 MiB under is the measured edge on v5e)."""
    return device_vmem_bytes() - 1024 * 1024


_HBM_BY_KIND = {
    # usable HBM per chip (bytes_limit as the runtime reports it; the raw
    # part size minus the runtime's reserved slice). v5e: 16 GiB part,
    # observed limit 15.75 GB.
    "TPU v4": int(31.5e9),
    "TPU v5 lite": int(15.75e9),
    "TPU v5e": int(15.75e9),
    "TPU v5p": int(94.5e9),
    "TPU v5": int(15.75e9),
    "TPU v6 lite": int(31.5e9),
    "TPU v6e": int(31.5e9),
}


def device_hbm_bytes() -> int:
    """Usable HBM of the attached device: env override, runtime-reported
    limit when available, else a per-generation table."""
    env = os.environ.get("SIR_HBM_BYTES")
    if env:
        return int(env)
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    for prefix in sorted(_HBM_BY_KIND, key=len, reverse=True):
        if kind.startswith(prefix):
            return _HBM_BY_KIND[prefix]
    return int(15.75e9)


def pack_gallery_gt(wb: int) -> int:
    """Default prints-per-step lane packing for a post-crop print width."""
    return max(1, min(4, 128 // max(1, wb)))


def packed_gallery_geometry(
    hb: int, wb: int, hk: int, wk: int, gt: int
) -> tuple[int, int, int, int, int, int, int]:
    """(ws, top, bot, he, we, wi, hb_pad) implied by the packed-operand
    layout. The SINGLE source of truth shared by the packing
    (:func:`pack_gallery_operands`), the kernel's geometry check
    (:func:`score_packed_operands`), and the HBM/VMEM sizing models
    (:func:`gallery_block_bytes_per_print`, :func:`auto_probe_rows`) — an
    earlier drift between packing and model undercounted ``wi`` by a whole
    128-lane tile at a packing boundary and let the solved row budget land
    past the true VMEM edge."""
    hb_pad = -(-hb // 8) * 8
    ws = wb + wk - 1                  # packed per-print lane span
    top = hk // 2 + 1                 # integral top/left extension
    bot = top + 1 + (hb_pad - hb)     # bottom/right extension
    he = -(-(hb + 1 + top + bot) // 8) * 8   # extended integral height (8-pad)
    we = wb + 1 + top + bot                  # extended integral width
    wi = -(-(gt * we) // 128) * 128          # packed integral lanes (128-pad)
    return ws, top, bot, he, we, wi, hb_pad


def gallery_block_bytes_per_print(
    hb: int, wb: int, hk: int, wk: int, *, c_pad: int, gt: int | None = None,
) -> int:
    """Peak scoring-graph HBM per gallery print.

    Counts the per-block direct cache (p0 + two integral images) plus the
    kernel-operand build temps inside the scoring jit: the packed,
    edge-extended integral stack ``int12p`` and packed prints ``p0p``
    (x2 each — XLA keeps the pre-concat halves alive at the concatenate,
    the measured dominant temp: at C=176, hb=wb~42, hk=wk=34 this model
    gives ~40 MB/print, matching the observed fit at 256-print blocks +
    2.6 GB resident and OOM at 512 on a 15.75 GB part).
    """
    gt = gt or pack_gallery_gt(wb)
    ws, _top, _bot, he, _we, wi, _hb_pad = packed_gallery_geometry(hb, wb, hk, wk, gt)
    cache_b = c_pad * (hb * wb + 2 * (hb + 1) * (wb + 1)) * 4
    int12_b = c_pad * 2 * he * wi * 4 // gt  # packed operand, per print
    p0p_b = c_pad * hb * gt * ws * 4 // gt
    return int(cache_b + 2 * int12_b + 2 * p0p_b)


def auto_gallery_block(
    hb: int, wb: int, hk: int, wk: int, *,
    c_pad: int, resident_bytes: int = 0, gt: int | None = None,
    safety_bytes: int = int(2.0e9),
) -> int:
    """Largest gallery block whose scoring-graph peak fits device HBM.

    ``resident_bytes`` is what the caller keeps alive across block scoring
    calls (prebuilt variant stacks, the kernel operand stack, probe
    canvases); ``safety_bytes`` covers runtime reserve + fragmentation +
    host-transfer staging. Replaces hand-picked block sizes the same way
    :func:`auto_probe_rows` replaced the VMEM row constant — a gallery too
    big for one shot (e.g. full WVU2019 at 176 channels) blocks itself
    instead of OOMing.
    """
    gt = gt or pack_gallery_gt(wb)
    budget = device_hbm_bytes() - resident_bytes - safety_bytes
    per = gallery_block_bytes_per_print(hb, wb, hk, wk, c_pad=c_pad, gt=gt)
    return max(gt, (int(budget // per) // gt) * gt)


def auto_probe_rows(
    hb: int, wb: int, hk: int, wk: int, *,
    n_var: int, n_classes: int, g_pad: int,
    n_slots_est: int = 80, compute_itemsize: int = 4,
    epi_grid_est: tuple[int, int] | None = None,
) -> int:
    """Largest MXU row count N (probe batch * variants) whose kernel fits
    the device's scoped VMEM: solve bytes(N) <= cap for the linear model
    scratch(N) + blocks(N) + headroom. Replaces round 2's measured-on-v5e
    constants (68e6-byte scratch target / 1400-row budget) so a different
    TPU generation re-derives its own edge instead of OOM-bisecting."""
    gt = pack_gallery_gt(wb)
    lanes = gt * wb
    lanes_e = -(-lanes // 128) * 128  # slots/einv DMA-aligned lane width
    # integral-image block extents: EXACTLY the packing's, via the shared
    # geometry helper (see packed_gallery_geometry's docstring for the
    # drift this prevents)
    ws, _top, _bot, he, _we, wi, hb_pad = packed_gallery_geometry(hb, wb, hk, wk, gt)
    # linear model: per-row cost (acc + einv amortized + kern blocks + out +
    # Mosaic stack growth, calibrated via mosaic_headroom_bytes)
    a = (
        4 * hb_pad * lanes                          # acc row
        + 4 * (n_classes / max(1, n_var)) * hb_pad * lanes_e  # einv row share
        + 2 * compute_itemsize * hk * wk            # kern, double-buffered
        + 4 * g_pad                                 # resident output column
        + (mosaic_headroom_bytes(1024) - mosaic_headroom_bytes(0)) / 1024
    )
    if epi_grid_est is not None:
        # cross-product epilogue: +1 trash slots row, the band-matrix
        # scratch (wi x n_w*lanes_e f32), and the rowdiff pass as a live
        # (2*hb_pad, wi) value instead of scratch (counted the same)
        epi_b = (
            4 * (n_slots_est + 1) * hb_pad * lanes_e            # slots
            + 4 * wi * epi_grid_est[1] * lanes_e                # band
            # rowdiff/compact: the (2*hb_pad, wi) rowdiff and the
            # (2*hb_pad, n_w*lanes_e) compact are both live across the
            # band MXU dot, so the peak is their SUM (a max under-counts
            # and can push edge shapes over the scoped-VMEM cap)
            + 4 * 2 * hb_pad * (wi + epi_grid_est[1] * lanes_e)
        )
    else:
        epi_b = (
            4 * n_slots_est * hb_pad * lanes_e                  # slots
            + 4 * 2 * hb_pad * wi                               # rowdiff
        )
    b = (
        compute_itemsize * wk * (hb_pad + hk - 1 + 7) * lanes  # rolls
        + epi_b
        + 4 * 2 * hb * gt * ws                                 # p0 block
        + 4 * 2 * 2 * he * wi                                  # int12 block
        + mosaic_headroom_bytes(0)
    )
    n = int((vmem_cap_bytes() - b) / a)
    return max(64, (n // 8) * 8)


class PackedGalleryOperands(_NamedTuple):
    """Kernel-ready packed gallery operands, reusable across probe batches.

    Built once per gallery (block) by :func:`pack_gallery_operands`; every
    probe batch scored against the block reuses the same arrays. The packing
    (channel/print pads, integral edge-extension, lane packing, concats) is
    several full HBM passes over cache-sized arrays (~GBs at WVU scale) and
    used to re-run inside EVERY ``score_direct_pallas`` call — per probe
    batch per block — even though it depends only on the cache and the
    kernel canvas.
    """

    p0p: jnp.ndarray     # (C, G_pad/gt, hb, gt*ws) f32 packed demeaned prints
    int12p: jnp.ndarray  # (C, G_pad/gt, 2*he, wi) f32 int1 over int2, extended
    gvalid: jnp.ndarray  # (G_pad, 2) int32 per-print valid sizes


def pack_gallery_operands(
    cache: DirectGalleryCache,
    *,
    hk: int,
    wk: int,
    prints_per_step: int | None = None,
) -> PackedGalleryOperands:
    """Pack a direct gallery cache into the fused kernel's operand layout.

    Depends only on the cache and the (hk, wk) kernel canvas — NOT on the
    probe batch — so callers scoring several probe batches against one
    gallery block should call this once and feed the result to
    :func:`score_packed_operands` (the cache itself can then be freed: the
    kernel never reads it).
    """
    c_pad, g, hb, wb = cache.p0.shape
    gt = prints_per_step or pack_gallery_gt(wb)
    g_pad = -(-g // gt) * gt
    ws, top, bot, he, we, wi, _hb_pad = packed_gallery_geometry(hb, wb, hk, wk, gt)

    def pad_g(a):
        return jnp.pad(a, ((0, 0), (0, g_pad - g), (0, 0), (0, 0)))

    # packed prints: per-print span ws with the content at lane offset wk//2
    p0p = jnp.pad(pad_g(cache.p0), ((0, 0), (0, 0), (0, 0), (wk // 2, ws - wb - wk // 2)))
    p0p = _pack_lanes(p0p, gt)  # (C, G/gt, hb, gt*ws)

    # packed, edge-extended integral images; total width 128-aligned for the
    # dynamic lane-rolls (padding is never read: hi_w + wb <= we)
    int1e = _extend_integral(pad_g(cache.int1), top, bot)
    int2e = _extend_integral(pad_g(cache.int2), top, bot)
    # height 8-aligned for the dynamic sublane rolls (padding is never read)
    he_pad = he - int1e.shape[-2]
    int1e = jnp.pad(int1e, ((0, 0), (0, 0), (0, he_pad), (0, 0)), mode="edge")
    int2e = jnp.pad(int2e, ((0, 0), (0, 0), (0, he_pad), (0, 0)), mode="edge")
    assert int1e.shape[-1] == we and int1e.shape[-2] == he
    int12p = jnp.concatenate([_pack_lanes(int1e, gt), _pack_lanes(int2e, gt)], axis=2)
    int12p = jnp.pad(int12p, ((0, 0), (0, 0), (0, 0), (0, wi - gt * we)))

    gvalid = jnp.concatenate(
        [cache.valid_hw, jnp.full((g_pad - g, 2), 8, cache.valid_hw.dtype)]
    ).astype(jnp.int32)
    return PackedGalleryOperands(p0p, int12p, gvalid)


def derive_class_taps(
    class_canvas_hw: Sequence[tuple[int, int]] | None,
    *,
    hk: int,
    wk: int,
    n_classes: int,
) -> tuple[tuple[int, int, int, int], ...] | None:
    """Static per-class tap sub-rectangles (hk_c, wk_c, du, dv) for
    ``class_canvas_hw`` (see :func:`score_direct_pallas`); None when every
    class uses the full canvas."""
    if class_canvas_hw is None:
        return None
    if len(class_canvas_hw) != n_classes:
        raise ValueError(
            f"class_canvas_hw has {len(class_canvas_hw)} entries for "
            f"{n_classes} classes"
        )
    if all(int(h) >= hk and int(w) >= wk for h, w in class_canvas_hw):
        return None
    taps = []
    for h, w in class_canvas_hw:
        hk_c = min(hk, max(1, int(h)))
        wk_c = min(wk, max(1, int(w)))
        taps.append((hk_c, wk_c, hk // 2 - hk_c // 2, wk // 2 - wk_c // 2))
    return tuple(taps)


def build_epilogue_grid(
    slot_hw: "_np.ndarray",
    *,
    n_h_pad: int | None = None,
    n_w_pad: int | None = None,
    n_live: int | None = None,
) -> tuple["_np.ndarray", "_np.ndarray", "_np.ndarray"]:
    """Factor distinct window sizes into the kernel's cross-product epilogue.

    ``slot_hw`` (n_slots, 2) int32 HOST-KNOWN window sizes (the first
    ``n_live`` rows are real; trailing rows are batch-shape filler). Returns
    ``(heights (n_h_pad,), widths (n_w_pad,), cell2slot (n_h_pad*n_w_pad,))``
    numpy int32 arrays: the kernel computes one energy map per (height,
    width) grid cell and stores it at ``slots[cell2slot[cell]]`` — cells
    with no live slot (and filler-height duplicates) route to the trash row
    ``n_slots``. Pads replay the last real value so every roll/rsqrt index
    stays valid. The per-slot smap (group -> slot) is unchanged.
    """
    slot_hw = _np.asarray(slot_hw, dtype=_np.int32)
    n_slots = len(slot_hw)
    live = slot_hw[: n_live if n_live is not None else n_slots]
    # live rows must be DISTINCT (h, w) pairs: cell2slot maps each grid cell
    # to exactly one slot row, so a duplicate's earlier row would never be
    # written and the kernel's einv gather would read uninitialized VMEM
    # scratch. Production callers pass np.unique-derived tables; anyone else
    # must dedupe (np.unique(wins, axis=0)) and pass n_live.
    if len(_np.unique(live, axis=0)) != len(live):
        raise ValueError(
            "build_epilogue_grid: live slot_hw rows contain duplicate (h, w) "
            "pairs — dedupe with np.unique(..., axis=0) and pass n_live"
        )
    hs = _np.unique(live[:, 0])
    ws_d = _np.unique(live[:, 1])
    n_h_pad = n_h_pad or len(hs)
    n_w_pad = n_w_pad or len(ws_d)
    if len(hs) > n_h_pad or len(ws_d) > n_w_pad:
        raise ValueError(
            f"epilogue grid pad ({n_h_pad}, {n_w_pad}) smaller than the live "
            f"distinct sizes ({len(hs)}, {len(ws_d)})"
        )
    heights = _np.concatenate([hs, _np.repeat(hs[-1:], n_h_pad - len(hs))])
    widths = _np.concatenate([ws_d, _np.repeat(ws_d[-1:], n_w_pad - len(ws_d))])
    cell2slot = _np.full(n_h_pad * n_w_pad, n_slots, _np.int32)  # trash row
    h_idx = _np.searchsorted(hs, live[:, 0])
    w_idx = _np.searchsorted(ws_d, live[:, 1])
    cell2slot[h_idx * n_w_pad + w_idx] = _np.arange(len(live), dtype=_np.int32)
    return (
        heights.astype(_np.int32),
        widths.astype(_np.int32),
        cell2slot,
    )


def pack_kernel_operands(
    kernels: jnp.ndarray,
    *,
    layout: VariantLayout,
    c_pad: int,
    compute_dtype=jnp.float32,
    class_taps: tuple[tuple[int, int, int, int], ...] | None = None,
) -> list[jnp.ndarray]:
    """Transpose a folded variant stack into the kernel's (v, u)-major
    channel-leading operand layout.

    Depends only on the probe batch's variant stack — NOT on the gallery —
    so a multi-block gallery loop should pack each batch's kernels once and
    reuse them for every block (round 3 measured the per-call transpose at
    ~2.6 GB of HBM traffic at PB=56 sweep shapes).
    """
    n_total = layout.n_variants
    n_pad = -(-n_total // 8) * 8
    hk, wk = kernels.shape[-2:]
    if kernels.shape[1] != c_pad:
        kernels = jnp.pad(kernels, ((0, 0), (0, c_pad - kernels.shape[1]), (0, 0), (0, 0)))

    if class_taps is None:
        k_all = kernels
        if n_pad != n_total:
            k_all = jnp.pad(k_all, ((0, n_pad - n_total), (0, 0), (0, 0), (0, 0)))
        # (v, u)-major tap order matches the rolls-slice patch layout
        return [
            jnp.transpose(k_all, (1, 0, 3, 2)).reshape(
                c_pad, n_pad, wk * hk
            ).astype(compute_dtype)
        ]
    kern_inputs = []
    off = 0
    for (hk_c, wk_c, du, dv), cnt in zip(class_taps, layout.class_counts):
        n_cls = layout.pb * cnt
        rows = kernels[off : off + n_cls, :, du : du + hk_c, dv : dv + wk_c]
        n_cls_pad = -(-n_cls // 8) * 8
        if n_cls_pad != n_cls:
            rows = jnp.pad(rows, ((0, n_cls_pad - n_cls), (0, 0), (0, 0), (0, 0)))
        kern_inputs.append(
            jnp.transpose(rows, (1, 0, 3, 2)).reshape(
                c_pad, n_cls_pad, wk_c * hk_c
            ).astype(compute_dtype)
        )
        off += n_cls
    return kern_inputs


def score_direct_pallas(
    cache: DirectGalleryCache,
    groups: Sequence[VariantGroup] | PackedVariants,
    *,
    true_channels: int,
    compute_dtype=jnp.float32,
    prints_per_step: int | None = None,
    interpret: bool = False,
    layout: VariantLayout | None = None,
    slot_hw: jnp.ndarray | None = None,
    slot_map: jnp.ndarray | None = None,
    class_canvas_hw: Sequence[tuple[int, int]] | None = None,
    epi: tuple | None = None,
) -> jnp.ndarray:
    """Drop-in fused-kernel equivalent of :func:`..ncc_direct.score_direct`.

    ``slot_hw`` (n_slots, 2) / ``slot_map`` (n_groups,) dedupe the energy
    epilogue: groups with equal window sizes share one box-sum pass (the
    host knows every window size, so it can pass the distinct set). When
    omitted every group gets its own slot.

    ``class_canvas_hw`` (one static (h, w) per class, post-crop) restricts
    each class's MXU dots to a centered tap sub-rectangle of the shared
    kernel canvas: :func:`..ncc_direct.fold_template` centers every variant
    and zero-fills outside its window, so taps beyond a class's own maximum
    window are exact zeros and can be dropped from the contraction — dot
    FLOPs then scale with each class's canvas instead of the batch-wide
    maximum (the unscaled-originals class pays ~(1/s_max)^2 of the full
    canvas). CALLER CONTRACT: entry ci must cover every window of class ci
    in this batch (the engine derives it from the same host-known window
    sizes that feed ``slot_hw``); an undersized canvas silently truncates
    the correlation. ``None`` keeps the single full-canvas dot.

    ``compute_dtype=jnp.bfloat16`` runs the correlation MXU dots in bf16
    (f32 accumulation; measured NO faster than f32 on this chip — the
    tunneled v5e delivers ~45 TFLOP/s at either precision, see
    benchmarks/mxu_probe.py). Returns (N_total, G) float32 scores.

    This is the one-shot composition of :func:`pack_kernel_operands` +
    :func:`pack_gallery_operands` + :func:`score_packed_operands`; callers
    scoring several probe batches against one gallery block (or one batch
    against several blocks) should call the pieces and reuse the packed
    operands across calls — the packing passes move multi-GB arrays.
    """
    if layout is None:
        packed, layout = pack_variant_groups(groups)
    else:
        packed = groups  # already a PackedVariants stack

    if slot_hw is None:
        slot_hw = packed.window_hw  # identity: one slot per group
        slot_map = jnp.arange(layout.n_groups, dtype=jnp.int32)

    c_pad, g = cache.p0.shape[0], cache.p0.shape[1]
    hk, wk = packed.kernels.shape[-2:]
    class_taps = derive_class_taps(
        class_canvas_hw, hk=hk, wk=wk, n_classes=len(layout.class_counts)
    )
    kern_inputs = pack_kernel_operands(
        packed.kernels, layout=layout, c_pad=c_pad,
        compute_dtype=compute_dtype, class_taps=class_taps,
    )
    gops = pack_gallery_operands(
        cache, hk=hk, wk=wk, prints_per_step=prints_per_step
    )
    scores = score_packed_operands(
        gops, kern_inputs, slot_hw, slot_map,
        layout=layout, true_channels=true_channels, hk=hk, wk=wk,
        class_taps=class_taps, compute_dtype=compute_dtype, interpret=interpret,
        epi=epi,
    )
    return scores[:, :g]


def score_packed_operands(
    gops: PackedGalleryOperands,
    kern_inputs: Sequence[jnp.ndarray],
    slot_hw: jnp.ndarray,
    slot_map: jnp.ndarray,
    *,
    layout: VariantLayout,
    true_channels: int,
    hk: int,
    wk: int,
    class_taps: tuple[tuple[int, int, int, int], ...] | None = None,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    epi: tuple | None = None,
) -> jnp.ndarray:
    """Run the fused NCC kernel on pre-packed operands.

    ``gops`` from :func:`pack_gallery_operands` (reusable across probe
    batches), ``kern_inputs`` from :func:`pack_kernel_operands` (reusable
    across gallery blocks). Returns (N_total, G_pad) float32 scores — the
    caller slices the gallery pad columns (filler prints score a masked max
    over their 8x8 dummy region, finite but meaningless).

    ``epi`` = ``(heights, widths, cell2slot)`` from
    :func:`build_epilogue_grid` switches the energy epilogue to the
    cross-product form: one wide band-dot per distinct window HEIGHT
    instead of one narrow dot per distinct (h, w) pair — the production
    fast path (fewer, deeper MXU passes; ~7x fewer epilogue loop
    iterations at WVU batch scale). Requires host-known window sizes; the
    arrays may be traced, but their SHAPES fix the grid. ``slot_hw`` rows
    are then only read for their count (the slots scratch extent) and
    ``slot_map`` keeps its group->slot meaning unchanged.
    """
    c_pad, n_gg, hb, p0_lanes = gops.p0p.shape
    g_pad = gops.gvalid.shape[0]
    gt = g_pad // n_gg
    ws = p0_lanes // gt
    wb = ws - wk + 1
    hb_pad = -(-hb // 8) * 8
    n_total = layout.n_variants
    n_pad = -(-n_total // 8) * 8

    # geometry implied by the packing (shared helper — see its docstring)
    _ws, top, _bot, he, we, wi, _hb8 = packed_gallery_geometry(hb, wb, hk, wk, gt)
    if gops.int12p.shape[-2:] != (2 * he, wi):
        raise ValueError(
            f"gallery operands shaped {gops.int12p.shape[-2:]} do not match "
            f"the (hk={hk}, wk={wk}) canvas geometry (2*he={2*he}, wi={wi}) "
            "— were they packed for a different kernel canvas?"
        )
    for i, kf in enumerate(kern_inputs):
        if kf.shape[0] != c_pad:
            # the two operand sides are packed independently; a channel-pad
            # mismatch would otherwise have the (n_gg, c_pad) grid index the
            # kern BlockSpec past its extent for cc >= kf.shape[0] — Pallas
            # CLAMPS out-of-range block indices, silently reusing the last
            # kern block for the tail channels instead of raising
            raise ValueError(
                f"kern_inputs[{i}] has channel dim {kf.shape[0]} but the "
                f"gallery operands are packed with c_pad={c_pad} — pack "
                "both sides with the same channel pad"
            )

    slot_hw = slot_hw.astype(jnp.int32)   # (n_slots, 2)
    slot_map = slot_map.astype(jnp.int32)  # (n_groups,)
    n_slots = int(slot_hw.shape[0])
    p0p, int12p, gvalid = gops.p0p, gops.int12p, gops.gvalid
    kern_inputs = list(kern_inputs)

    # constant source-column index per output lane for the epilogue's
    # box-sum band dot: output lane q*wb + x reads packed column q*we + x
    # (the kernel offsets it by each slot's hi_w/lo_w and compares against
    # a row iota to form the +-1 band matrix); the DMA-alignment filler
    # lanes replay the leading columns (finite, so the rsqrt stays
    # NaN-free). Pure geometry — built once per compiled shape.
    lanes_e = -(-(gt * wb) // 128) * 128
    lidx_np = _np.zeros((1, lanes_e), _np.int32)
    for q in range(gt):
        for x in range(wb):
            lidx_np[0, q * wb + x] = q * we + x
    for x in range(lanes_e - gt * wb):
        lidx_np[0, gt * wb + x] = x

    grid_shape = None
    if epi is not None:
        epi_h, epi_w, epi_cell = epi
        n_h_pad = int(epi_h.shape[0])
        n_w_pad = int(epi_w.shape[0])
        grid_shape = (n_h_pad, n_w_pad)
        wn = n_w_pad * lanes_e
        # per-lane band column indices: block j carries width j's shifts on
        # the shared source-column geometry (same values the per-slot path
        # derives one slot at a time)
        src = jnp.asarray(_np.tile(lidx_np, (1, n_w_pad)))  # (1, wn)
        w_lane = jnp.repeat(
            jnp.asarray(epi_w).astype(jnp.int32), lanes_e
        )[None]  # (1, wn)
        hi_idx = (src + top + (w_lane - 1) // 2 + 1)[None]  # (1, 1, wn)
        lo_idx = (src + top - w_lane // 2)[None]
        wvec = w_lane.astype(jnp.float32)[None]
        hts = jnp.asarray(epi_h).astype(jnp.int32)[:, None]        # (n_h_pad, 1)
        cell2slot = jnp.asarray(epi_cell).astype(jnp.int32)[:, None]  # (cells, 1)
    else:
        lidx = jnp.asarray(lidx_np)[None]  # (1, 1, lanes_e)

    body = functools.partial(
        _kernel_body, layout.class_counts, class_taps, layout.pb, gt, hb,
        hb_pad, wb, hk, wk, we, top, true_channels, compute_dtype,
        grid_shape,
    )

    if epi is not None:
        in_specs = [
            pl.BlockSpec((n_h_pad, 1), lambda gg, cc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_h_pad * n_w_pad, 1), lambda gg, cc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((layout.n_groups,), lambda gg, cc: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g_pad, 2), lambda gg, cc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, hb, gt * ws), lambda gg, cc: (cc, gg, 0, 0)),
            pl.BlockSpec((1, 1, 2 * he, wi), lambda gg, cc: (cc, gg, 0, 0)),
            pl.BlockSpec((1, 1, wn), lambda gg, cc: (0, 0, 0)),
            pl.BlockSpec((1, 1, wn), lambda gg, cc: (0, 0, 0)),
            pl.BlockSpec((1, 1, wn), lambda gg, cc: (0, 0, 0)),
        ]
        inputs = (hts, cell2slot, slot_map, gvalid, p0p, int12p,
                  hi_idx, lo_idx, wvec)
        # +1 slots row: grid cells with no live slot (and filler-height
        # duplicates) write a trash row the smap never reads
        slots_rows = n_slots + 1
        extra_scratch = [pltpu.VMEM((wi, wn), jnp.float32)]  # band matrix
    else:
        in_specs = [
            pl.BlockSpec((n_slots, 2), lambda gg, cc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((layout.n_groups,), lambda gg, cc: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g_pad, 2), lambda gg, cc: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, hb, gt * ws), lambda gg, cc: (cc, gg, 0, 0)),
            pl.BlockSpec((1, 1, 2 * he, wi), lambda gg, cc: (cc, gg, 0, 0)),
            pl.BlockSpec((1, 1, lanes_e), lambda gg, cc: (0, 0, 0)),
        ]
        inputs = (slot_hw, slot_map, gvalid, p0p, int12p, lidx)
        slots_rows = n_slots
        extra_scratch = [pltpu.VMEM((2 * hb_pad, wi), jnp.float32)]  # rowdiff

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_gg, c_pad),
        in_specs=[
            *in_specs,
            *[
                pl.BlockSpec(
                    (1, kf.shape[1], kf.shape[2]), lambda gg, cc: (cc, 0, 0)
                )
                for kf in kern_inputs
            ],
        ],
        out_specs=pl.BlockSpec((g_pad, n_pad), lambda gg, cc: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_pad, hb_pad, gt * wb), jnp.float32),
            pltpu.VMEM((wk, hb_pad + hk - 1 + 7, gt * wb), compute_dtype),
            # slots/einv lanes padded to the 128 tile so the einv-expansion
            # DMA slices are lane-aligned (hardware Mosaic rejects unaligned
            # memref slices; VMEM cost is <2% since 126 -> 128 etc.)
            pltpu.VMEM(
                (layout.n_groups, hb_pad, -(-(gt * wb) // 128) * 128),
                jnp.float32,
            ),
            pltpu.VMEM(
                (slots_rows, hb_pad, -(-(gt * wb) // 128) * 128), jnp.float32
            ),
            *extra_scratch,
        ],
    )

    # Request the part's full scoped-VMEM edge: the limit is a cap, not an
    # allocation, and requesting only an estimated need creates artificial
    # stack OOMs when Mosaic's temporaries outgrow the estimate (observed at
    # N=1800: need 119.6 MB vs a 110.4 MB estimate with 22.8 MB of part
    # still free). auto_probe_rows keeps requested shapes under the cap.
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_cap_bytes(),
    )
    scores = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, n_pad), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else compiler_params,
    )(*inputs, *kern_inputs)
    return jnp.transpose(scores)[:n_total]

"""Direct (FFT-free) NCC scoring: correlation as MXU matmul convolutions.

The mathematically obvious port of the reference's scoring is FFT
correlation (see :mod:`.ncc`) — but on TPU that path is HBM-bound: the
inverse FFT materializes a full correlation canvas per (channel, print,
variant), and the MXU sits idle. At the reference's feature-map sizes
(templates ~30x30 on prints ~45x45) *direct* correlation has only ~7x more
FLOPs and maps onto the MXU as an implicit-GEMM convolution with a
1156-deep contraction — measured ~20x faster end to end on v5e than the
FFT path, computing the identical quantity.

Design:

* **Gallery cache**: demeaned masked prints ``p0`` (channel-major) plus
  integral images of ``p0`` / ``p0^2`` — no FFTs, cheap to build.
* **Template folding**: each variant's demeaned template is scaled by
  ``1/sqrt(sum(t0^2))`` (the reference's template energy, similarity.py:67)
  and written *centered* on a shared kernel canvas. Centering makes every
  variant's "same"-mode window land on the same conv output coordinates, so
  one conv serves every template size with zero per-variant slicing.
* **Scoring scan over channels**: per channel, one
  ``conv_general_dilated`` — input ``(G, 1, Hb, Wb)``, kernels
  ``(N, 1, hk, wk)`` where ``N`` stacks every variant of every probe in the
  batch — is a ``(G*Hb*Wb, hk*wk) @ (hk*wk, N)`` GEMM on the MXU. The
  channel's normalized contribution ``conv * inv_energy`` accumulates into
  ``(N, G, Hb, Wb)`` in f32.
* **Energy sharing**: ``1/sqrt(local_energy)`` depends only on the window
  size, not template content, so the integral-image box sums are computed
  once per distinct (h, w) *group* (rotations share their source's size) and
  broadcast over that group's variants — the division also becomes one
  multiply (reference computes 2 extra FFT convolutions per channel per
  pair per variant here: similarity.py:57-62).

Numerics: correlation in f32 with HIGHEST precision; results equal the
reference formulas up to summation order (validated rank-identical vs the
scipy oracle in tests/test_ncc_direct.py). The zero-energy / zero-template
conventions (non-finite -> 0, similarity.py:65-71) are reproduced via
``where`` masks on the folded template and inverse energy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .boxsum import box_sum_same, integral_image
from .ncc import EDGE_CROP, _masked_demean


class DirectGalleryCache(NamedTuple):
    """Channel-major direct-scoring cache.

    p0:   (C, G, Hb, Wb) f32 — demeaned, masked, edge-cropped prints.
    int1: (C, G, Hb+1, Wb+1) f32 — integral images of p0.
    int2: (C, G, Hb+1, Wb+1) f32 — integral images of p0^2.
    valid_hw: (G, 2) int32 — per-print valid size after edge crop.
    """

    p0: jnp.ndarray
    int1: jnp.ndarray
    int2: jnp.ndarray
    valid_hw: jnp.ndarray


def build_direct_cache(
    prints: jnp.ndarray,
    valid_hw: jnp.ndarray,
    channel_block: int = 8,
) -> DirectGalleryCache:
    """(G, C, Hraw, Wraw) zero-padded prints -> cache (crops 2 px per edge)."""
    g, c, hraw, wraw = prints.shape
    hb, wb = hraw - 2 * EDGE_CROP, wraw - 2 * EDGE_CROP
    p = prints[:, :, EDGE_CROP : EDGE_CROP + hb, EDGE_CROP : EDGE_CROP + wb]
    v = valid_hw - 2 * EDGE_CROP

    def per_print(pm, vhw):
        return _masked_demean(pm, vhw[0], vhw[1])

    p0 = jax.vmap(per_print)(p, v)  # (G, C, Hb, Wb)
    c_pad = -(-c // channel_block) * channel_block
    if c_pad != c:
        p0 = jnp.pad(p0, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
    p0 = jnp.transpose(p0, (1, 0, 2, 3))
    return DirectGalleryCache(
        p0=p0,
        int1=integral_image(p0),
        int2=integral_image(p0 * p0),
        valid_hw=v.astype(jnp.int32),
    )


def fold_template(
    template: jnp.ndarray,
    valid_hw,
    kernel_hw: tuple[int, int],
    centering: str = "auto",
) -> jnp.ndarray:
    """Crop, demean, energy-fold and center one template on the kernel canvas.

    Args:
        template: (C, hraw, wraw) zero-padded variant maps.
        valid_hw: (2,) traced valid size (pre-crop).
        kernel_hw: static kernel canvas (>= cropped template canvas).
        centering: how the dynamic centering shift is applied —
            ``"roll"`` uses ``jnp.roll`` (exact, but a traced-shift roll
            lowers to per-template dynamic slices: measured ~95-145 ms of a
            ~175 ms PB=56 variant build on v5e, benchmarks/bench_build.py);
            ``"dot"`` multiplies by two iota-built one-hot permutation
            matrices instead — MXU work that cuts the build to ~91 ms.
            Exact on CPU (each output is a single ``v * 1.0`` product); on
            the MXU's bf16x3 f32 path it is within one ulp of the roll
            (measured max 6.0e-8 — all scoring backends share this fold, so
            backend-mutual and sharded-vs-unsharded bit-identity are
            unaffected). ``"auto"`` picks "dot" on accelerators and "roll"
            on CPU at trace time.

    Returns:
        (C, hk, wk) f32: ``t0 / sqrt(sum(t0^2))`` centered at
        ``(hk//2 - h//2, wk//2 - w//2)`` — the placement that aligns every
        variant's "same" window on identical conv output coordinates.
    """
    hct, wct = template.shape[-2] - 2 * EDGE_CROP, template.shape[-1] - 2 * EDGE_CROP
    t = template[:, EDGE_CROP : EDGE_CROP + hct, EDGE_CROP : EDGE_CROP + wct]
    h = valid_hw[0] - 2 * EDGE_CROP
    w = valid_hw[1] - 2 * EDGE_CROP
    t0 = _masked_demean(t, h, w)
    tsq = jnp.sum(t0 * t0, axis=(-2, -1), keepdims=True)
    u = jnp.where(tsq > 0, t0 / jnp.sqrt(tsq), 0.0)

    hk, wk = kernel_hw
    u_pad = jnp.pad(u, ((0, 0), (0, hk - hct), (0, wk - wct)))
    dy = hk // 2 - h // 2
    dx = wk // 2 - w // 2
    if centering == "auto":
        centering = "roll" if jax.default_backend() == "cpu" else "dot"
    if centering == "roll":
        # dynamic centering via roll: the rolled-in tail is all zeros because
        # u vanishes beyond its (h, w) valid region and h + offset <= hk
        return jnp.roll(u_pad, (dy, dx), axis=(-2, -1))
    if centering != "dot":
        raise LookupError(f"Unknown centering mode: {centering!r}")
    # centering as two one-hot permutation matmuls: out[i] = in[(i - dy) % n]
    io = jax.lax.broadcasted_iota(jnp.int32, (hk, hk), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (hk, hk), 1)
    ph = (ji == (io - dy) % hk).astype(u_pad.dtype)  # (row out, row in)
    wi = jax.lax.broadcasted_iota(jnp.int32, (wk, wk), 0)
    wo = jax.lax.broadcasted_iota(jnp.int32, (wk, wk), 1)
    pw = (wi == (wo - dx) % wk).astype(u_pad.dtype)  # (col in, col out)
    rows = jnp.einsum("ij,cjw->ciw", ph, u_pad, precision="highest")
    return jnp.einsum("ciw,wx->cix", rows, pw, precision="highest")


def inv_window_energy(cache: DirectGalleryCache, h, w) -> jnp.ndarray:
    """(C, G, Hb, Wb) ``1/sqrt(local window energy)`` for a (traced) window.

    Reference similarity.py:57-68: energy = boxsum(p0^2) - boxsum(p0)^2/N,
    negatives clamped, zero -> 0 (the non-finite->0 convention).
    """
    b1 = box_sum_same(cache.int1, h, w)
    b2 = box_sum_same(cache.int2, h, w)
    n = (h * w).astype(jnp.float32)
    energy = jnp.maximum(b2 - b1 * b1 / n, 0.0)
    return jnp.where(energy > 0, 1.0 / jnp.sqrt(energy), 0.0)


class VariantGroup(NamedTuple):
    """One same-sized group of folded templates (static count per cluster)."""

    kernels: jnp.ndarray  # (Ng, C, hk, wk) folded, centered
    window_hw: jnp.ndarray  # (2,) traced post-crop window size


class PackedVariants(NamedTuple):
    """Class-major packed variant stack for a whole probe batch.

    The probe batch is laid out *class-major*: for each variant class
    (the unscaled originals, then one class per scale) all ``pb`` probes'
    variants are contiguous, probe-major within the class.  Row
    ``offset(ci) + p * count(ci) + k`` is probe ``p``'s ``k``-th variant of
    class ``ci``.  This regular layout lets the Pallas kernel loop over
    probes with ``fori_loop`` + dynamic leading-axis slices instead of a
    Python-unrolled per-group epilogue (the round-1 compile-time cliff).

    Attributes:
        kernels: (N, C, hk, wk) folded, centered templates,
            N = pb * sum(class_counts).
        window_hw: (n_groups, 2) int32 post-crop window sizes; group
            ``ci * pb + p`` is (class ci, probe p).
    """

    kernels: jnp.ndarray
    window_hw: jnp.ndarray


@dataclass(frozen=True)
class VariantLayout:
    """Static shape info for a :class:`PackedVariants` stack (hashable, so
    it can ride through ``jax.jit`` as a static argument)."""

    class_counts: tuple[int, ...]  # variants per probe, per class
    pb: int                        # probes in the batch

    @property
    def n_groups(self) -> int:
        return len(self.class_counts) * self.pb

    @property
    def n_variants(self) -> int:
        return self.pb * sum(self.class_counts)

    def class_offset(self, ci: int) -> int:
        return self.pb * sum(self.class_counts[:ci])


def pack_variant_groups(
    groups: Sequence[VariantGroup],
) -> tuple[PackedVariants, VariantLayout]:
    """Adapt the per-group list API (pb=1: every group is its own class)."""
    kernels = jnp.concatenate([g.kernels for g in groups])
    window_hw = jnp.stack([jnp.asarray(g.window_hw) for g in groups]).astype(jnp.int32)
    layout = VariantLayout(tuple(int(g.kernels.shape[0]) for g in groups), 1)
    return PackedVariants(kernels, window_hw), layout


def score_direct(
    cache: DirectGalleryCache,
    groups: Sequence[VariantGroup] | PackedVariants,
    *,
    true_channels: int,
    channel_block: int = 8,
    compute_dtype=jnp.float32,
    layout: VariantLayout | None = None,
) -> jnp.ndarray:
    """Score every variant in every group against every print.

    Returns (N_total, G) f32 where N_total = sum of group sizes, ordered as
    the groups are given. Score = max over each print's valid "same" window
    of the channel-summed normalized correlation, divided by C (reference
    similarity.py:106-108).

    ``channel_block`` channels are processed per scan step so the large
    (N, G, Hb, Wb) accumulator is read+written C/channel_block times instead
    of C times (measured: the accumulator dominates HBM traffic otherwise).
    ``compute_dtype=jnp.bfloat16`` halves correlation input traffic and
    doubles MXU rate at a ~1e-3 relative score error (accumulation stays
    f32); the default keeps the reference's f32 semantics.
    """
    if layout is None:
        packed, layout = pack_variant_groups(groups)
    else:
        packed = groups  # already a PackedVariants stack

    c_pad, g, hb, wb = cache.p0.shape
    # largest divisor of the padded channel count not exceeding the request
    channel_block = max(d for d in range(1, channel_block + 1) if c_pad % d == 0)
    hk, wk = packed.kernels.shape[-2:]
    # class-major group order: ci outer, probe inner (rows are contiguous)
    counts = [cnt for cnt in layout.class_counts for _ in range(layout.pb)]
    n_total = sum(counts)
    kernels = packed.kernels  # (N, C, hk, wk)
    if kernels.shape[1] != c_pad:
        kernels = jnp.pad(kernels, ((0, 0), (0, c_pad - kernels.shape[1]), (0, 0), (0, 0)))
    kernels = jnp.transpose(kernels, (1, 0, 2, 3))  # (C, N, hk, wk)

    # group window sizes (traced scalars; energies are computed per channel
    # inside the scan so no (C, G, Hb, Wb) energy tensor is ever materialized
    # — at 176 channels x 20 groups that would be ~7 GB of HBM)
    group_hw = tuple(
        (packed.window_hw[i, 0], packed.window_hw[i, 1]) for i in range(layout.n_groups)
    )

    # --- tap-packed correlation ------------------------------------------
    # A naive conv with C_in=1 makes XLA:TPU do rank-1 MXU updates (measured
    # ~2% MXU util). Instead, DY_BLOCK consecutive tap rows x all wk tap
    # columns are packed into the conv's *input channels*: the input becomes
    # DY_BLOCK*wk shifted copies of the print and the kernel a
    # (N, DY_BLOCK*wk, hk/DY_BLOCK, 1) stack applied with row dilation
    # DY_BLOCK — a GEMM with a ~128-deep contraction, which is what the MXU
    # wants. Centered kernels keep "same"-window position (y, x) at conv
    # output (y, x) for every variant size.
    DY_BLOCK = 4
    hk4 = -(-hk // DY_BLOCK) * DY_BLOCK
    a_taps = hk4 // DY_BLOCK
    pad_lo_h = hk // 2
    pad_lo_w = wk // 2
    pad_hi_w = wk - 1 - wk // 2

    # kernel repack: k[n, 4a+b, dx] -> k4[n, (b, dx), a, 1], channel-blocked
    kern4 = jnp.pad(kernels, ((0, 0), (0, 0), (0, hk4 - hk), (0, 0)))
    kern4 = kern4.reshape(c_pad, n_total, a_taps, DY_BLOCK, wk)
    kern4 = jnp.transpose(kern4, (0, 1, 3, 4, 2)).reshape(
        c_pad, n_total, DY_BLOCK * wk, a_taps, 1
    ).astype(compute_dtype)

    hr = hb + hk4 - DY_BLOCK  # shifted-copy height so conv output is (Hb, Wb)
    nblk = c_pad // channel_block
    p0_b = cache.p0.reshape(nblk, channel_block, g, hb, wb)
    kern_b = kern4.reshape(nblk, channel_block, n_total, DY_BLOCK * wk, a_taps, 1)
    int1_b = cache.int1.reshape(nblk, channel_block, g, hb + 1, wb + 1)
    int2_b = cache.int2.reshape(nblk, channel_block, g, hb + 1, wb + 1)

    def block_step(acc, xs):
        p0_k, kern_k, int1_k, int2_k = xs
        contrib = None
        for ci in range(channel_block):
            p_pad = jnp.pad(
                p0_k[ci],
                ((0, 0), (pad_lo_h, hk4 - 1 - pad_lo_h), (pad_lo_w, pad_hi_w)),
            ).astype(compute_dtype)  # (G, Hb+hk4-1, Wb+wk-1)
            # r[(b, dx)][y, x] = p_pad[y + b, x + dx]
            shifts = [
                p_pad[:, b : b + hr, dx : dx + wb]
                for b in range(DY_BLOCK)
                for dx in range(wk)
            ]
            r = jnp.stack(shifts, axis=1)  # (G, DY*wk, hr, Wb)
            corr = jax.lax.conv_general_dilated(
                r,
                kern_k[ci],
                window_strides=(1, 1),
                padding="VALID",
                rhs_dilation=(DY_BLOCK, 1),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )  # (G, N, Hb, Wb)
            corr = jnp.transpose(corr, (1, 0, 2, 3))
            start = 0
            parts = []
            for gi, cnt in enumerate(counts):
                h, w = group_hw[gi]
                b1 = box_sum_same(int1_k[ci], h, w)
                b2 = box_sum_same(int2_k[ci], h, w)
                energy = jnp.maximum(b2 - b1 * b1 / (h * w).astype(jnp.float32), 0.0)
                inv_e = jnp.where(energy > 0, 1.0 / jnp.sqrt(energy), 0.0)
                parts.append(corr[start : start + cnt] * inv_e[None])
                start += cnt
            ch_part = jnp.concatenate(parts)
            contrib = ch_part if contrib is None else contrib + ch_part
        return acc + contrib, None

    acc0 = jnp.zeros((n_total, g, hb, wb), jnp.float32) + (
        jnp.sum(cache.valid_hw) * 0
    ).astype(jnp.float32)
    summed, _ = jax.lax.scan(block_step, acc0, (p0_b, kern_b, int1_b, int2_b))

    rows = jnp.arange(hb)[None, :, None] < cache.valid_hw[:, 0][:, None, None]
    cols = jnp.arange(wb)[None, None, :] < cache.valid_hw[:, 1][:, None, None]
    masked = jnp.where(rows & cols, summed, -jnp.inf)
    return jnp.max(masked, axis=(-2, -1)) / true_channels

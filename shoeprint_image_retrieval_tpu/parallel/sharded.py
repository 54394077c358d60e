"""Gallery-sharded NCC scoring: shard_map + ICI all-gather.

Replaces the reference's scheme — gallery feature maps copied into POSIX
shared memory and fully replicated into every worker process (reference
similarity.py:164-176, 309-317) — with an HBM-resident gallery cache sharded
across the mesh's ``gallery`` axis. Each device scores all query variants
against its shard (reusing the exact single-device kernel, ops/ncc.py) and
the per-shard score rows ride ICI through one tiled ``all_gather``.

Each (variant, print) score is computed entirely on one device by the same
kernel; sharded == unsharded up to XLA's per-shape scheduling (<= 1 ULP),
with rankings identical (tested in tests/test_sharded.py).
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.ncc import GalleryCache, score_templates
from ..ops.ncc_direct import (
    DirectGalleryCache,
    PackedVariants,
    VariantLayout,
    score_direct,
)
from ..ops.pallas.ncc_kernel import (
    PackedGalleryOperands,
    derive_class_taps,
    pack_gallery_operands,
    pack_kernel_operands,
    score_direct_pallas,
    score_packed_operands,
)
from .mesh import GALLERY_AXIS, pad_gallery_cache


def shard_cache(cache, mesh):
    """Pad + place a gallery cache sharded over the mesh (channel-major
    arrays shard on axis 1; valid sizes on axis 0). Accepts both the FFT
    (:class:`GalleryCache`) and direct cache layouts."""
    n = mesh.shape[GALLERY_AXIS]
    padded, g_true = pad_gallery_cache(cache, n)
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    fields = {
        k: put(v, P(GALLERY_AXIS) if k == "valid_hw" else P(None, GALLERY_AXIS))
        for k, v in padded._asdict().items()
    }
    return type(cache)(**fields), g_true


def _wrap_shard_scorer(local, mesh, in_specs, g_true: int | None):
    """Shared scaffold for the per-shard scoring paths: shard_map the local
    scorer (whose last op is the tiled all_gather of score rows), jit it
    with the cache/operands as ARGUMENTS (closure-captured arrays
    constant-fold through a device->host pull that hangs over the axon
    tunnel at real sizes), and slice the gallery pad columns."""
    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        # after the tiled all_gather every device holds identical full
        # rows; the static vma checker cannot infer that
        check_vma=False,
    )

    @jax.jit
    def score_impl(*args):
        s = mapped(*args)
        return s[:, :g_true] if g_true is not None else s

    return score_impl


# one jitted impl per (mesh, statics) — the engine's FFT gallery-block loop
# creates a scorer per block and must reuse one compiled program across
# equal-shaped blocks (same rationale as _packed_scorer_impls below)
_fft_scorer_impls: OrderedDict = OrderedDict()


def make_sharded_scorer(mesh, sharded_cache: GalleryCache, *, true_channels: int,
                        channel_block: int = 16, g_true: int | None = None):
    """Jitted (templates, tvalid) -> (V, G) scorer over the mesh."""
    key = (mesh, true_channels, channel_block, g_true)
    score_impl = _fft_scorer_impls.get(key)
    if score_impl is None:

        def local(phat, int1, int2, gvalid, templates, tvalid):
            local_cache = GalleryCache(phat, int1, int2, gvalid)
            s = score_templates(
                local_cache, templates, tvalid,
                true_channels=true_channels, channel_block=channel_block,
            )
            return jax.lax.all_gather(s, GALLERY_AXIS, axis=1, tiled=True)

        score_impl = _wrap_shard_scorer(
            local, mesh,
            (
                P(None, GALLERY_AXIS), P(None, GALLERY_AXIS), P(None, GALLERY_AXIS),
                P(GALLERY_AXIS), P(), P(),
            ),
            g_true,
        )
        _fft_scorer_impls[key] = score_impl
        while len(_fft_scorer_impls) > _PACKED_SCORER_MEMO_MAX:
            _fft_scorer_impls.popitem(last=False)
    else:
        _fft_scorer_impls.move_to_end(key)

    def score(templates, tvalid):
        return score_impl(
            sharded_cache.phat, sharded_cache.int1, sharded_cache.int2,
            sharded_cache.valid_hw, templates, tvalid,
        )

    return score


def make_sharded_packed_builder(mesh, build_kernels, class_counts, pb: int):
    """Probe-sharded variant-stack build over the mesh.

    The packed stack the sharded scorer consumes is replicated, but its
    CONSTRUCTION (rotation gathers + two resize einsums + fold per variant,
    engine build_kernels) need not run replicated: each device builds its
    ``pb / n`` probes' variants and the global class-major row stack is
    reassembled by one tiled all_gather per class. Without this the build
    is the serial term in the multi-chip speedup (Amdahl: ~0.3 s/batch of
    the ~3.6 s PB=56 step doesn't shard; BASELINE.md projection section).

    ``build_kernels`` must be shape-generic in the probe axis and return
    class-major rows (engine._scorer_bundle.build_kernels). ``pb`` must be
    divisible by the mesh size — the engine rounds its VMEM-solved batch
    DOWN to the mesh multiple (rounding up would blow the scoped-VMEM row
    budget) and keeps a replicated build instead when pb < mesh size.
    """
    n = mesh.shape[GALLERY_AXIS]
    if pb % n:
        raise ValueError(
            f"probe batch {pb} not divisible by mesh size {n}: the per-class "
            "all_gather would reassemble misaligned probe rows"
        )
    pb_local = pb // n

    def local(maps, valid, ridx, rok, wvq, whq, shw):
        kerns = build_kernels(maps, valid, ridx, rok, wvq, whq, shw)
        # local rows are class-major over pb_local probes; per class, the
        # probe axis gathers across devices back into global probe-major
        out, off = [], 0
        for cnt in class_counts:
            seg = kerns[off : off + pb_local * cnt]
            out.append(jax.lax.all_gather(seg, GALLERY_AXIS, axis=0, tiled=True))
            off += pb_local * cnt
        return jnp.concatenate(out)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(GALLERY_AXIS),) * 7,
        out_specs=P(),
        # the tiled all_gathers leave every device with identical full rows
        check_vma=False,
    )

    @jax.jit
    def build(maps, valid, ridx, rok, wvq, whq, shw, windows):
        return PackedVariants(
            mapped(maps, valid, ridx, rok, wvq, whq, shw), windows
        )

    return build


# one jitted impl per (mesh, workload statics): the engine's gallery-block
# loop calls make_sharded_packed_scorer once per ~2 GB block — without this
# memo every block re-jits (and re-compiles) an identical program. Bounded
# LRU: a long-lived process scoring many distinct workloads must not pin
# every compiled executable it ever built (block-loop reuse needs 1 entry;
# 8 covers interleaved pipelines with headroom).
_packed_scorer_impls: OrderedDict = OrderedDict()
_PACKED_SCORER_MEMO_MAX = 8


def make_sharded_packed_scorer(
    mesh,
    sharded_cache: DirectGalleryCache,
    *,
    true_channels: int,
    layout: VariantLayout,
    g_true: int | None = None,
    use_pallas: bool = False,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    class_canvas_hw: tuple[tuple[int, int], ...] | None = None,
    kernel_hw: tuple[int, int] | None = None,
    use_epi: bool = False,
):
    """Jitted (packed, slot_hw, slot_map[, epi]) -> (N, G) scorer over the mesh.

    ``use_epi`` switches the per-shard kernel to the cross-product energy
    epilogue (:func:`~..ops.pallas.ncc_kernel.build_epilogue_grid`); the
    returned ``score`` then requires its ``epi`` argument — a replicated
    (heights, widths, cell2slot) triple.

    Runs the SAME scoring kernel as the single-device path on each shard —
    the fused Pallas kernel when ``use_pallas`` (the TPU fast path; round-1
    hardcoded the slower XLA formulation here, forfeiting the fused-kernel
    win on real meshes) or the XLA direct-conv path otherwise. The packed
    variant stack and window-size slots are replicated to every device;
    each device scores its gallery shard; score rows ride ICI through one
    tiled ``all_gather``.

    With ``use_pallas`` and a static ``kernel_hw`` (the engine always knows
    its fold canvas), each shard's multi-GB gallery-operand packing runs
    ONCE here at scorer creation instead of inside every score call — the
    same hoist the single-device engine path does with
    :func:`~..ops.pallas.ncc_kernel.pack_gallery_operands`.
    """

    use_pops = use_pallas and kernel_hw is not None
    # g_local: each shard's true print count (pre-gt-pad) — static per
    # compiled program, so it keys the memo (the jitted impl closes over it)
    g_local = (
        sharded_cache.p0.shape[1] // mesh.shape[GALLERY_AXIS]
        if use_pops else None
    )
    use_epi = use_epi and use_pallas
    impl_key = (
        mesh, true_channels, layout, g_true, use_pallas,
        str(compute_dtype), interpret, class_canvas_hw, kernel_hw, g_local,
        use_epi,
    )
    impls = _packed_scorer_impls.get(impl_key)
    if impls is not None:
        _packed_scorer_impls.move_to_end(impl_key)
        score_impl, pack_impl = impls
    else:
        pack_impl = None
        if use_pops:
            hk, wk = kernel_hw
            class_taps = derive_class_taps(
                class_canvas_hw, hk=hk, wk=wk,
                n_classes=len(layout.class_counts),
            )

            def pack_local(p0, int1, int2, gvalid):
                return pack_gallery_operands(
                    DirectGalleryCache(p0, int1, int2, gvalid), hk=hk, wk=wk
                )

            pack_impl = jax.jit(jax.shard_map(
                pack_local,
                mesh=mesh,
                in_specs=(
                    P(None, GALLERY_AXIS), P(None, GALLERY_AXIS),
                    P(None, GALLERY_AXIS), P(GALLERY_AXIS),
                ),
                out_specs=PackedGalleryOperands(
                    P(None, GALLERY_AXIS), P(None, GALLERY_AXIS), P(GALLERY_AXIS)
                ),
            ))

            def local(p0p, int12p, gvalid, kernels, slot_hw, slot_map, *epi_args):
                # the kernel returns the shard's gt-padded columns, which
                # must be sliced to g_local (the shard's true print count)
                # before the tiled all_gather re-concatenates shards or the
                # pad columns would interleave into the rows
                kern_inputs = pack_kernel_operands(
                    kernels, layout=layout, c_pad=p0p.shape[0],
                    compute_dtype=compute_dtype, class_taps=class_taps,
                )
                s = score_packed_operands(
                    PackedGalleryOperands(p0p, int12p, gvalid), kern_inputs,
                    slot_hw, slot_map, layout=layout,
                    true_channels=true_channels, hk=hk, wk=wk,
                    class_taps=class_taps, compute_dtype=compute_dtype,
                    interpret=interpret, epi=epi_args or None,
                )[:, :g_local]
                return jax.lax.all_gather(s, GALLERY_AXIS, axis=1, tiled=True)

            score_impl = _wrap_shard_scorer(
                local, mesh,
                (
                    P(None, GALLERY_AXIS), P(None, GALLERY_AXIS),
                    P(GALLERY_AXIS), P(), P(), P(),
                    *((P(), P(), P()) if use_epi else ()),
                ),
                g_true,
            )

        else:

            def local(p0, int1, int2, gvalid, kernels, window_hw, slot_hw,
                      slot_map, *epi_args):
                local_cache = DirectGalleryCache(p0, int1, int2, gvalid)
                packed = PackedVariants(kernels, window_hw)
                if use_pallas:
                    s = score_direct_pallas(
                        local_cache, packed, true_channels=true_channels,
                        layout=layout, slot_hw=slot_hw, slot_map=slot_map,
                        compute_dtype=compute_dtype, interpret=interpret,
                        class_canvas_hw=class_canvas_hw, epi=epi_args or None,
                    )
                else:
                    s = score_direct(
                        local_cache, packed, true_channels=true_channels,
                        layout=layout, compute_dtype=compute_dtype,
                    )
                return jax.lax.all_gather(s, GALLERY_AXIS, axis=1, tiled=True)

            score_impl = _wrap_shard_scorer(
                local, mesh,
                (
                    P(None, GALLERY_AXIS), P(None, GALLERY_AXIS), P(None, GALLERY_AXIS),
                    P(GALLERY_AXIS), P(), P(), P(), P(),
                    *((P(), P(), P()) if use_epi else ()),
                ),
                g_true,
            )

        _packed_scorer_impls[impl_key] = (score_impl, pack_impl)
        while len(_packed_scorer_impls) > _PACKED_SCORER_MEMO_MAX:
            _packed_scorer_impls.popitem(last=False)

    def _epi_args(epi):
        if not use_epi:
            return ()
        if epi is None:
            raise ValueError(
                "use_epi scorer requires epi=(heights, widths, cell2slot) — "
                "build it with ops.pallas.ncc_kernel.build_epilogue_grid"
            )
        return tuple(epi)

    if use_pops:
        gops = pack_impl(
            sharded_cache.p0, sharded_cache.int1, sharded_cache.int2,
            sharded_cache.valid_hw,
        )

        def score(packed: PackedVariants, slot_hw, slot_map, epi=None):
            return score_impl(
                gops.p0p, gops.int12p, gops.gvalid, packed.kernels,
                slot_hw, slot_map, *_epi_args(epi),
            )

    else:

        def score(packed: PackedVariants, slot_hw, slot_map, epi=None):
            return score_impl(
                sharded_cache.p0, sharded_cache.int1, sharded_cache.int2,
                sharded_cache.valid_hw, packed.kernels, packed.window_hw,
                slot_hw, slot_map, *_epi_args(epi),
            )

    return score


def make_sharded_direct_scorer(mesh, sharded_cache, *, true_channels: int,
                               g_true: int | None = None):
    """Jitted (groups) -> (N, G) scorer over the mesh, direct-conv path.

    ``groups`` is the same static-length list of
    :class:`~..ops.ncc_direct.VariantGroup` the single-device
    :func:`~..ops.ncc_direct.score_direct` takes; kernels/window sizes are
    replicated to every device, each device scores its gallery shard, rows
    ride ICI through one tiled all_gather.
    """

    def local(p0, int1, int2, gvalid, groups):
        local_cache = DirectGalleryCache(p0, int1, int2, gvalid)
        s = score_direct(local_cache, groups, true_channels=true_channels)
        return jax.lax.all_gather(s, GALLERY_AXIS, axis=1, tiled=True)

    score_impl = _wrap_shard_scorer(
        local, mesh,
        (
            P(None, GALLERY_AXIS), P(None, GALLERY_AXIS), P(None, GALLERY_AXIS),
            P(GALLERY_AXIS), P(),
        ),
        g_true,
    )

    def score(groups):
        return score_impl(
            sharded_cache.p0, sharded_cache.int1, sharded_cache.int2,
            sharded_cache.valid_hw, groups,
        )

    return score

"""Guards on the profiling/tuning knobs that could corrupt production runs.

NCC_SKIP elides kernel sections for by-difference profiling
(benchmarks/kernel_probe.py) — a stray value in a job environment must be
refused loudly, never silently produce garbage rankings. auto_probe_rows
derives the MXU row budget from the device's VMEM instead of baked-in
constants; its derivation must be monotone and env-overridable so a
different TPU generation lands at its own edge.
"""

import os
import subprocess
import sys

MOD = "shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel"


def _import_with(env_extra):
    env = {k: v for k, v in os.environ.items() if not k.startswith("NCC_SKIP")}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", f"import {MOD}"],
        env=env, capture_output=True, text=True, timeout=300,
    )


def test_ncc_skip_refused_without_ack():
    res = _import_with({"NCC_SKIP": "dots"})
    assert res.returncode != 0
    assert "NCC_SKIP_ACK" in res.stderr


def test_ncc_skip_unknown_section_refused_even_with_ack():
    res = _import_with({"NCC_SKIP": "dotz", "NCC_SKIP_ACK": "1"})
    assert res.returncode != 0
    assert "unknown kernel sections" in res.stderr


def test_ncc_skip_acknowledged_imports_with_banner():
    res = _import_with({"NCC_SKIP": "epilogue,rolls", "NCC_SKIP_ACK": "1"})
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ELIDED" in res.stderr


def test_auto_probe_rows_derivation(monkeypatch):
    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        auto_probe_rows,
    )

    # the shipped bench's layout: PB=56, 25 variants in 4 size classes
    # (224 groups), 87 energy slots
    kw = dict(n_var=25, n_classes=4, g_pad=300, n_slots_est=87)
    monkeypatch.setenv("SIR_VMEM_BYTES", str(128 * 1024 * 1024))
    n_v5e = auto_probe_rows(42, 42, 34, 34, **kw)
    # the measured v5e edge: N=1400 fits with headroom, N=1800 OOMs —
    # the derived budget must cover the former and not exceed the latter
    assert 1400 <= n_v5e <= 1800
    assert n_v5e % 8 == 0

    # a part with twice the VMEM must derive a deeper row budget
    monkeypatch.setenv("SIR_VMEM_BYTES", str(256 * 1024 * 1024))
    assert auto_probe_rows(42, 42, 34, 34, **kw) > n_v5e

    # floor: an impossibly small cap still returns a runnable batch
    monkeypatch.setenv("SIR_VMEM_BYTES", str(8 * 1024 * 1024))
    assert auto_probe_rows(42, 42, 34, 34, **kw) == 64


def test_epilogue_grid_pad_guard_and_routing():
    """build_epilogue_grid: pads smaller than the live distinct sizes must
    raise; filler rows replay the last real value; cells with no live slot
    (and filler-pad duplicates) route to the trash row n_slots."""
    import numpy as np
    import pytest

    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        build_epilogue_grid,
    )

    live = np.asarray([[10, 12], [10, 16], [14, 12]], np.int32)
    slot_hw = np.vstack([live, [[8, 8]]]).astype(np.int32)  # 1 filler row

    with pytest.raises(ValueError):
        build_epilogue_grid(slot_hw, n_h_pad=1, n_w_pad=2, n_live=3)

    hs, ws, cell = build_epilogue_grid(slot_hw, n_h_pad=3, n_w_pad=3, n_live=3)
    assert hs.tolist() == [10, 14, 14]   # pad replays the last height
    assert ws.tolist() == [12, 16, 16]
    cell = cell.reshape(3, 3)
    assert cell[0, 0] == 0 and cell[0, 1] == 1 and cell[1, 0] == 2
    # (14, 16) has no live slot; every pad-duplicate cell is trash too
    trash = len(slot_hw)
    assert cell[1, 1] == trash
    assert (cell[2, :] == trash).all() and (cell[:, 2] == trash).all()


def test_epilogue_grid_rejects_duplicate_live_rows():
    """Duplicate live (h, w) rows would leave earlier duplicates' slot rows
    unwritten (cell2slot keeps only the last) — the einv gather would read
    uninitialized VMEM scratch, so the builder must refuse (ADVICE r3)."""
    import numpy as np
    import pytest

    from shoeprint_image_retrieval_tpu.ops.pallas.ncc_kernel import (
        build_epilogue_grid,
    )

    dup = np.asarray([[10, 12], [10, 12], [14, 16]], np.int32)
    with pytest.raises(ValueError, match="duplicate"):
        build_epilogue_grid(dup)
    # filler duplicates past n_live stay legal
    slot_hw = np.asarray([[10, 12], [14, 16], [8, 8], [8, 8]], np.int32)
    build_epilogue_grid(slot_hw, n_live=2)


def test_sharded_use_epi_requires_epi_argument():
    """A use_epi sharded scorer called without its epi triple must raise a
    clear error, not an opaque '*(None)' TypeError (ADVICE r3)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from shoeprint_image_retrieval_tpu.ops.ncc_direct import (
        PackedVariants,
        VariantLayout,
        build_direct_cache,
        fold_template,
    )
    from shoeprint_image_retrieval_tpu.parallel.mesh import build_mesh
    from shoeprint_image_retrieval_tpu.parallel.sharded import (
        make_sharded_packed_scorer,
        shard_cache,
    )

    rng = np.random.default_rng(0)
    g_maps = jnp.asarray(rng.normal(size=(4, 3, 14, 14)).astype(np.float32))
    g_valid = jnp.asarray(np.full((4, 2), 14, np.int32))
    cache = build_direct_cache(g_maps, g_valid)
    mesh = build_mesh(2)
    sharded, g_true = shard_cache(cache, mesh)

    maps = jnp.asarray(rng.normal(size=(3, 10, 10)).astype(np.float32))
    valid = jnp.asarray([10, 10], jnp.int32)
    kernel_hw = (10, 10)
    kernels = fold_template(maps, valid, kernel_hw)[None]
    packed = PackedVariants(kernels, (valid - 4)[None].astype(jnp.int32))
    slot_hw = (valid - 4)[None].astype(jnp.int32)
    slot_map = jnp.zeros((1,), jnp.int32)

    scorer = make_sharded_packed_scorer(
        mesh, sharded, true_channels=3, layout=VariantLayout((1,), 1),
        g_true=g_true, use_pallas=True, interpret=True,
        kernel_hw=kernel_hw, use_epi=True,
    )
    with pytest.raises(ValueError, match="use_epi scorer requires epi"):
        scorer(packed, slot_hw, slot_map)

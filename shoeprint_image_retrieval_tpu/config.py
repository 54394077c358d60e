"""Config loading for the TPU shoeprint-retrieval framework.

Parses the same ``run.toml`` schema as the reference (reference:
src/shoeprint_image_retrieval/config.py:11-64 and run.toml:1-25), including
the ``""`` -> ``None`` normalization for ``comparison.rotations`` /
``comparison.scales`` (reference config.py:60-63), plus an *optional*
``[tpu]`` section with TPU-specific extensions. A reference run.toml loads
unchanged and gets all TPU defaults.
"""

from __future__ import annotations

import tomllib
from pathlib import Path
from typing import Literal, TypedDict

DatasetType = Literal["FID-300", "Impress", "WVU2019"]


class DatasetConfig(TypedDict, total=True):
    """Dataset section (reference config.py:11-20)."""

    dir: str
    type: DatasetType
    crop: list[float]
    n_processes: int
    n_clusters: int
    cluster_minimise_tolerance: float


class ModelConfig(TypedDict, total=True):
    """Model section (reference config.py:23-33)."""

    type: str
    clahe_clip_limit: float
    clahe_tile_grid_size: list[int]
    start_block: int
    end_block: int
    skip_blocks: list[int]
    minimum_dim: int
    maximum_dim: int


class ComparisonConfig(TypedDict, total=True):
    """Comparison section (reference config.py:36-41)."""

    n_processes: int
    rotations: list[int] | None
    scales: list[float] | None


class TpuConfig(TypedDict, total=True):
    """TPU-specific extensions (new; absent in the reference).

    Keys:
        mesh_shape: devices along the ``gallery`` sharding axis; 0 = all
            available devices.
        precision: ``"float32"`` (default) keeps reference-grade HIGHEST
            conv precision for extraction AND f32 scoring dots;
            ``"bfloat16"`` switches backbone convs to single-pass bf16
            multiplies (~2e-3 relative feature deviation, ~1.6x faster
            extraction convs) and the scoring kernel's dots to bf16 inputs
            (measured no faster on this part — see BASELINE.md).
        cache_dir: on-disk spill directory for the gallery feature cache
            ("" disables spilling). The reference gestured at this with its
            gitignored ``Memmaps/``/``*.npy`` entries (reference .gitignore:3-8)
            but shipped no cache code.
        variant_mode: ``"reference"`` reproduces the reference's transform
            variant set — originals + {originals ∪ rotations} × scales, i.e.
            rotated-but-unscaled variants are never scored (reference
            similarity.py:321-353 composition quirk); ``"full"`` scores the
            corrected full cross product {originals ∪ rotations} × ({1} ∪ scales).
            In BOTH modes the max-over-variants score is floored at 0.0,
            reproducing the reference's zeros-initialized accumulator that
            only overwrites on ``>`` (reference similarity.py:355-367): the
            floor is an accumulation-semantics property, independent of
            which variant set is scored, and the CPU oracle shares it —
            anti-correlated pairs whose best variant is negative score
            exactly 0.0 (tests/test_score_floor.py).
        extraction_batch: max images per batched feature-extraction step
            (default 32: conv GEMM M-rows scale with the batch — measured
            91/97/138 backbone img/s at batch 8/16/32 on 704 px canvases;
            chunks keep ONE compiled shape, so small clusters pad rather
            than recompile).
        ncc_backend: ``"auto"`` (fused Pallas kernel on TPU, XLA direct conv
            path on CPU), ``"pallas"``, ``"direct"``, or ``"fft"`` (the
            batched-FFT path, ops/ncc.py — useful on CPU-class hosts).
        profile_dir: when set, each cluster run is captured as a
            ``jax.profiler`` trace under this directory (the reference has
            no profiling at all — SURVEY.md section 5).
        probe_batch: probes scored per jitted scoring call; 0 = auto (size
            the batch so the variant stack fills the scoring kernel's MXU
            output axis with ~1400 rows, the scoped-VMEM feasibility edge).
        gallery_block: gallery prints per scoring pass; 0 = auto (derive
            the largest block whose scoring-graph HBM peak fits the device
            — ``ops.pallas.ncc_kernel.auto_gallery_block`` — so huge
            galleries block themselves instead of OOMing; galleries that
            fit in one shot stay unblocked). Blocks bound device memory
            for huge galleries (the 10k-print WVU-scale config): the
            direct cache is built and scored one block at a time, scores
            concatenated on host. ``SIR_HBM_BYTES`` overrides the detected
            HBM size.
        clahe_host: run CLAHE in the native C++ ingest path (bit-exact vs
            both cv2 and the device kernel) instead of on device. Default
            true: the device CLAHE's LUT gathers dominate extraction time
            on TPU (~75% of the step), while the host pass rides the ingest
            thread pool for free. Falls back to the device kernel when the
            native library or a uint8 gray/RGB batch isn't available.
        prewarm: compile this cluster's extraction + scoring executables on
            a background thread concurrently with ingest/extraction (and the
            NEXT cluster's during scoring). Stage shapes are derived from
            image headers alone; the dummy warmup work is one gallery block
            x one probe batch of zeros. The axon TPU service compiles
            server-side at first execution — outside the JAX persistent
            cache — so overlap is the only first-run lever; default True.
            Results are unaffected (the warmup runs the production code
            path on zero inputs and its outputs are discarded).
        cache_dtype: dtype of gallery feature maps at rest on the HOST for
            the blocked-gallery streaming path (tpu.gallery_block).
            ``"bfloat16"`` halves the host->device transfer each block pays;
            the device cache and all scoring stay f32. Rounds features to
            ~3e-3 relative, so near-tied ranks can flip vs the f32 path —
            outside the strict rankings-identical contract (BASELINE.md
            "rank stability"); default ``"float32"``.
        fusion_blocks: multi-layer summed-feature-map fusion scoring
            (driver config 3; reference scripts/summed_feature_maps.py:1-7
            is the single-layer per-channel sum this generalizes). A list
            of truncation blocks, e.g. ``[6, 4]``: each cluster is scored
            once per block at its planned scale and the score matrices are
            summed before ranking (score-level fusion — different blocks'
            correlation grids have different strides, so a pre-max map sum
            is not well defined across layers). Empty (default) = the
            reference's single-block scoring.
        rank_on_device: keep each cluster's score matrix ON DEVICE and
            compute true-match ranks there (ops/topk.ranks_on_device) — the
            host pulls Q int32 ranks instead of the O(Q*G) score matrix
            (the north star's "on-device top-k"; the reference argsorts on
            host, similarity.py:381). Identical ranks to the host path for
            untied true-match scores; under an EXACT tie the deterministic
            device convention applies (see DeviceScores). Ignored when
            combined with ``fusion_blocks`` (fusion sums host matrices) and
            by the "fft" backend. Default false (the host path is the
            reference-exact semantics).
        pruned_scoring: exact-preserving two-pass pruned scoring (rank-only
            mode). CMC needs only each query's TRUE-MATCH rank (reference
            parse_results.py:4-24 consumes ranks, similarity.py:378-386
            derives them from the score row), so scoring every (query,
            print) pair at full channel depth is wasted FLOPs for pairs
            that provably rank below the true match. Three passes: (0)
            exact true-match scores (each batch vs its own matched prints
            only); (1) a channel-prefix pass over all pairs whose score
            yields the sound upper bound ``(k*score_k + (C-k))/C`` (every
            per-channel NCC map is <= 1 by Cauchy-Schwarz); (2) pairs whose
            bound (+ ``prune_margin``) falls below the query's true-match
            score are pruned, survivors are re-scored EXACTLY at full
            channel depth and the rank is counted among them with the
            reference's tie convention. Rankings of the true match are
            exact by construction; the prune rate (and the speedup) depends
            on how sharply true matches score above the field. Produces
            ranks, not score matrices — incompatible with
            ``fusion_blocks``. Default false.
        prune_channels: channel-prefix depth k for pass 1 of
            ``pruned_scoring`` (0 = auto, C // 8). Smaller k makes pass 1
            cheaper but the bound looser (more survivors).
        prune_margin: safety slack added to the pruning bound to cover
            f32 backend score error (BASELINE.md rank-stability: MXU
            backends carry up to ~6e-4 absolute). Pairs within the margin
            of the threshold are kept, never dropped. Default 5e-3.
        pipeline_clusters: overlap cluster k's scoring with cluster k+1's
            ingest + extraction on a lookahead thread (the PP analog; the
            reference's run.py:17-24 serializes the full gallery
            re-extraction against every cluster's scoring). Ranks are
            unaffected — same code path, byte-identical features. Default
            true; disable when HBM is tight (the lookahead holds the next
            cluster's device-resident maps alongside the current scoring
            footprint).
    """

    mesh_shape: int
    precision: str
    cache_dir: str
    variant_mode: str
    extraction_batch: int
    ncc_backend: str
    profile_dir: str
    probe_batch: int
    gallery_block: int
    clahe_host: bool
    prewarm: bool
    cache_dtype: str
    fusion_blocks: list
    rank_on_device: bool
    pruned_scoring: bool
    prune_channels: int
    prune_margin: float
    pipeline_clusters: bool


class Config(TypedDict, total=True):
    """Full system config (reference config.py:44-48 + ``tpu`` extension)."""

    dataset: DatasetConfig
    model: ModelConfig
    comparison: ComparisonConfig
    tpu: TpuConfig


_TPU_DEFAULTS: TpuConfig = {
    "mesh_shape": 0,
    "precision": "float32",
    "cache_dir": "",
    "variant_mode": "reference",
    "extraction_batch": 32,
    "ncc_backend": "auto",
    "profile_dir": "",
    "probe_batch": 0,
    "gallery_block": 0,
    "clahe_host": True,
    "prewarm": True,
    "cache_dtype": "float32",
    "fusion_blocks": [],
    "rank_on_device": False,
    "pruned_scoring": False,
    "prune_channels": 0,
    "prune_margin": 5e-3,
    "pipeline_clusters": True,
}


def load_config(config_file: Path | str) -> Config:
    """Load a run.toml file with reference-compatible semantics.

    Reproduces reference config.py:51-64: plain TOML parse plus coercion of
    the empty string to ``None`` for ``comparison.rotations`` and
    ``comparison.scales``. Unknown keys in known sections are preserved;
    the ``[tpu]`` section is optional and defaulted.
    """
    with Path(config_file).open("rb") as fh:
        raw = tomllib.load(fh)

    comparison = raw.get("comparison", {})
    if comparison.get("rotations") == "":
        comparison["rotations"] = None
    if comparison.get("scales") == "":
        comparison["scales"] = None

    tpu = dict(_TPU_DEFAULTS)
    tpu.update(raw.get("tpu", {}))
    raw["tpu"] = tpu

    return raw  # type: ignore[return-value]

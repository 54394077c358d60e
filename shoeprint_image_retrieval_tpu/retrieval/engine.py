"""The retrieval pipeline: cluster-at-a-time, one XLA compile per stage.

TPU-first restructuring of the reference driver loop (reference run.py:17-34
+ similarity.py:129-375):

* ingest on host threads (data/loader.py) -> zero-padded uint8 canvases;
* jitted preprocessing: dynamic-extent CLAHE + normalization (ops/clahe.py,
  ops/preprocess.py);
* jitted batched masked extraction through the truncated backbone
  (models/*) — exact equal to the reference's per-image loop;
* gallery cache: demeaned-print FFTs + integral images built once per
  cluster, reused across every query and variant (ops/ncc.py);
* per query: a device-built variant stack (host-planned PIL-exact rotation
  gathers + resize matrices, ops/warp.py) scored by the batched NCC kernel;
  max over variants -> score row -> rank (metrics.py).

Shapes are static per cluster (canvas buckets) with per-image valid extents
traced — so each cluster costs a handful of compilations regardless of how
many distinct image sizes it contains.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.discovery import Dataset
from ..data.loader import load_images, pack_canvas
from ..data.planner import PlannerConfig, plan_clusters, read_header_sizes
from ..metrics import ranks_from_scores
from ..models.registry import get_backbone
from ..models.weights import load_or_init_params
from ..ops.clahe import clahe_batched_dynamic
from ..ops.ncc import EDGE_CROP
from ..ops.ncc_direct import (
    VariantGroup,
    build_direct_cache,
    fold_template,
    score_direct,
)
from ..ops.pallas.ncc_kernel import score_direct_pallas
from ..parallel.mesh import build_mesh
from ..parallel.sharded import make_sharded_direct_scorer, shard_cache
from ..ops.preprocess import normalize_batch
from ..ops.warp import pil_resize_size, resample_weights, rotate_index_map
from ..utils.tracing import profile_trace, stage_timer
from .gallery import GalleryFeatureCache


@dataclass
class ClusterOutput:
    ranks: np.ndarray
    matching_pairs: list[int]
    n_queries: int
    block: int
    scale: float


class Pipeline:
    """End-to-end retrieval for one config (the reference's run.py loop)."""

    def __init__(self, config: Config, weights_dir: str | None = "weights", verbose: bool = True):
        self.config = config
        self.verbose = verbose
        self.dataset = Dataset(config["dataset"]["dir"], config["dataset"]["type"])
        if verbose:
            print(self.dataset.summary())

        model_cfg = config["model"]
        self.spec = get_backbone(model_cfg["type"])
        self.weights_dir = weights_dir
        self._param_cache: dict[int, tuple] = {}
        self.gallery_cache = GalleryFeatureCache(config["tpu"]["cache_dir"] or None)

        planner_cfg = PlannerConfig(
            minimum_dim=model_cfg["minimum_dim"],
            maximum_dim=model_cfg["maximum_dim"],
            start_block=model_cfg["start_block"],
            end_block=model_cfg["end_block"],
            skip_blocks=tuple(model_cfg["skip_blocks"]),
            cluster_tolerance=config["dataset"]["cluster_minimise_tolerance"],
        )
        crop = config["dataset"]["crop"]
        q_sizes = read_header_sizes(self.dataset.query_dir, self.dataset.query_files)
        g_sizes = read_header_sizes(self.dataset.gallery_dir, self.dataset.gallery_files)
        self.plans = plan_clusters(
            q_sizes, self.dataset.query_files, g_sizes, crop,
            config["dataset"]["n_clusters"], planner_cfg,
        )
        if verbose:
            print(f"{len(self.plans)} clusters of image sizes found.")

    # ------------------------------------------------------------------
    def _model_for_block(self, block: int):
        if block not in self._param_cache:
            features = self.spec.build().truncate(block)
            params = load_or_init_params(features, self.config["model"]["type"], self.weights_dir)
            mcfg = self.config["model"]

            @jax.jit
            def step(p, u8, v):
                eq = clahe_batched_dynamic(
                    u8, v, mcfg["clahe_clip_limit"], tuple(mcfg["clahe_tile_grid_size"])
                )
                x = normalize_batch(eq, v, self.spec.mean, self.spec.std)
                return features.apply(p, x, v)

            self._param_cache[block] = (features, params, step)
        return self._param_cache[block]

    def _extract(self, step, params, images: Sequence[np.ndarray]):
        """Batched masked extraction -> (maps (B,C,Hf,Wf), valid (B,2)) numpy."""
        batch_u8, valid = pack_canvas(images)
        bs = max(1, self.config["tpu"]["extraction_batch"])
        outs, vouts = [], []
        for i in range(0, len(images), bs):
            chunk = batch_u8[i : i + bs]
            vchunk = valid[i : i + bs]
            pad = bs - len(chunk)  # pad final chunk to keep one compiled shape
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
                vchunk = np.concatenate([vchunk, np.ones((pad, 2), vchunk.dtype)])
            y, vy = step(params, jnp.asarray(chunk), jnp.asarray(vchunk))
            outs.append(np.asarray(y)[: len(images) - i if pad else bs])
            vouts.append(np.asarray(vy)[: len(images) - i if pad else bs])
        return np.concatenate(outs), np.concatenate(vouts)

    # ------------------------------------------------------------------
    def _variant_plan(self, q_valid: np.ndarray, feat_canvas: tuple[int, int]):
        """Host-side PIL-exact transform plans for every query's variants."""
        comp = self.config["comparison"]
        rotations = comp["rotations"]
        scales = comp["scales"]
        mode = self.config["tpu"]["variant_mode"]
        hc, wc = feat_canvas

        rots = list(rotations) if rotations else []
        scls = list(scales) if scales else []
        # template canvas must hold the largest scaled variant
        smax = max([1.0] + scls)
        tc = (max(hc, int(hc * smax)), max(wc, int(wc * smax)))

        n_q = len(q_valid)
        rot_idx = np.zeros((n_q, 1 + len(rots), hc * wc), np.int32)
        rot_ok = np.zeros((n_q, 1 + len(rots), hc, wc), bool)
        wv = np.zeros((n_q, max(1, len(scls)), tc[0], hc), np.float32)
        wh = np.zeros((n_q, max(1, len(scls)), tc[1], wc), np.float32)
        scale_hw = np.zeros((n_q, max(1, len(scls)), 2), np.int32)

        for qi, (h, w) in enumerate(np.asarray(q_valid)):
            h, w = int(h), int(w)
            for ri, deg in enumerate([0.0] + rots):
                idx, ok = rotate_index_map((h, w), deg, canvas_hw=(hc, wc))
                rot_idx[qi, ri] = idx.reshape(-1)
                rot_ok[qi, ri] = ok
            for si, s in enumerate(scls):
                oh, ow = pil_resize_size((h, w), s)
                wv[qi, si] = resample_weights(h, oh, "bicubic", canvas_in=hc, canvas_out=tc[0])
                wh[qi, si] = resample_weights(w, ow, "bicubic", canvas_in=wc, canvas_out=tc[1])
                scale_hw[qi, si] = (oh, ow)
        return rot_idx, rot_ok, wv, wh, scale_hw, tc, mode, len(rots), len(scls)

    # ------------------------------------------------------------------
    def _score_cluster(
        self,
        q_maps: np.ndarray,
        q_valid: np.ndarray,
        g_maps: np.ndarray,
        g_valid: np.ndarray,
    ) -> np.ndarray:
        """(Q, G) max-over-variant score matrix for one cluster.

        Uses the direct MXU-conv NCC path (ops/ncc_direct.py): per query, a
        device-built variant stack grouped by window size — the original
        [+ unscaled rotations in "full" mode] as one group and each scale as
        another — scored by one channel-scanned conv GEMM; max over variants.
        """
        true_c = q_maps.shape[1]
        hc, wc = q_maps.shape[2], q_maps.shape[3]
        rot_idx, rot_ok, wv, wh, scale_hw, tc, mode, n_rot, n_scl = self._variant_plan(
            q_valid, (hc, wc)
        )
        kernel_hw = (tc[0] - 2 * EDGE_CROP, tc[1] - 2 * EDGE_CROP)

        cache = build_direct_cache(jnp.asarray(g_maps), jnp.asarray(g_valid))

        # the fused Pallas kernel is the TPU fast path; the XLA direct path
        # serves CPU (tests / oracle regeneration) where Mosaic interpret
        # mode would be needlessly slow
        backend = self.config["tpu"].get("ncc_backend", "auto")
        use_pallas = backend == "pallas" or (
            backend == "auto" and jax.default_backend() not in ("cpu",)
        )
        # tpu.precision="bfloat16": bf16 correlation inputs, f32 accumulation
        # (~2x MXU at ~1e-3 relative score error; f32 default keeps the
        # rankings-identical contract)
        dtype = (
            jnp.bfloat16
            if self.config["tpu"].get("precision") == "bfloat16"
            else jnp.float32
        )
        scorer = partial(
            score_direct_pallas if use_pallas else score_direct,
            compute_dtype=dtype,
        )

        # multi-chip: shard the gallery cache over the mesh and score every
        # variant stack against the local shard, all-gathering score rows
        # over ICI (SURVEY.md section 2.4; tpu.mesh_shape, 0 = all devices)
        mesh_size = self.config["tpu"]["mesh_shape"] or len(jax.devices())
        mesh_size = min(mesh_size, len(jax.devices()))
        sharded_scorer = None
        if mesh_size > 1:
            mesh = build_mesh(mesh_size)
            sharded_cache, g_true = shard_cache(cache, mesh)
            sharded_scorer = make_sharded_direct_scorer(
                mesh, sharded_cache, true_channels=true_c, g_true=g_true
            )

        fold = jax.vmap(fold_template, in_axes=(0, None, None))

        # Queries are scored PROBE_BATCH at a time: each probe contributes
        # ~(1+R)(1+S) variants to the kernel's output-channel axis, and the
        # MXU wants that axis near 128 (e.g. 5 probes x 25 variants = 125).
        n_var = 1 + (1 + n_rot) * n_scl if n_scl else 1 + (n_rot if n_rot else 0)
        if mode == "full" and n_scl:
            n_var += n_rot
        pb = max(1, min(len(q_maps), max(1, 128 // max(1, n_var))))

        # cache is a jit *argument* (not a closure capture): jit would
        # constant-fold captured arrays via a device->host pull, and large
        # transfers hang over the axon TPU tunnel.
        @jax.jit
        def score_batch(cache_arg, maps, valid, ridx, rok, wvq, whq, shw):
            groups = []
            for p in range(pb):
                # rotated stack (R+1, C, hc, wc): gather + mask
                flat = maps[p].reshape(maps.shape[1], hc * wc)
                rot = jnp.take(flat, ridx[p], axis=1)  # (C, R+1, hc*wc)
                rot = jnp.moveaxis(rot, 0, 1).reshape(-1, maps.shape[1], hc, wc)
                rot = jnp.where(rok[p][:, None], rot, 0.0)

                include_rots_unscaled = mode == "full" or (n_rot and not n_scl)
                base = rot if include_rots_unscaled else rot[:1]
                groups.append(
                    VariantGroup(fold(base, valid[p], kernel_hw), valid[p] - 2 * EDGE_CROP)
                )
                if n_scl:
                    # scaled variants of each rotated map: two batched matmuls
                    scaled = jnp.einsum(
                        "soh,rchw,spw->rscop", wvq[p], rot, whq[p], precision="highest"
                    )  # (R+1, S, C, tc0, tc1)
                    for si in range(n_scl):
                        groups.append(
                            VariantGroup(
                                fold(scaled[:, si], shw[p, si], kernel_hw),
                                shw[p, si] - 2 * EDGE_CROP,
                            )
                        )
            if sharded_scorer is None:
                scores = scorer(cache_arg, groups, true_channels=true_c)
            else:
                scores = sharded_scorer(groups)
            g = scores.shape[1]
            return jnp.max(scores.reshape(pb, n_var, g), axis=1)  # (pb, G)

        def pad_batch(arr, lo):
            """Pad a probe batch to ``pb`` by repeating the last probe."""
            take = arr[lo : lo + pb]
            if len(take) < pb:
                take = np.concatenate(
                    [take, np.repeat(take[-1:], pb - len(take), axis=0)]
                )
            return jnp.asarray(take)

        rows = []
        for lo in range(0, len(q_maps), pb):
            out = np.asarray(
                score_batch(
                    cache,
                    pad_batch(q_maps, lo), pad_batch(q_valid, lo),
                    pad_batch(rot_idx, lo), pad_batch(rot_ok, lo),
                    pad_batch(wv, lo), pad_batch(wh, lo),
                    pad_batch(scale_hw, lo),
                )
            )
            rows.append(out[: min(pb, len(q_maps) - lo)])
            if self.verbose:
                done = min(lo + pb, len(q_maps))
                if done % 10 < pb or done == len(q_maps):
                    print(f"  scored {done}/{len(q_maps)} queries")
        return np.concatenate(rows)

    # ------------------------------------------------------------------
    def run_cluster(self, plan) -> ClusterOutput:
        crop = self.config["dataset"]["crop"]
        n_threads = self.config["dataset"]["n_processes"]
        gkey_probe = GalleryFeatureCache.key(
            self.config["model"]["type"], plan.block, plan.scale,
            self.dataset.gallery_files,
        )
        with stage_timer("ingest", self.verbose):
            q_files = sorted(plan.files)
            q_imgs = load_images(self.dataset.query_dir, q_files, plan.scale, crop, n_threads)
            g_imgs = (
                None
                if self.gallery_cache.get(gkey_probe) is not None
                else load_images(
                    self.dataset.gallery_dir, self.dataset.gallery_files,
                    plan.scale, crop, n_threads,
                )
            )
        _, params, step = self._model_for_block(plan.block)
        with stage_timer("extract-query", self.verbose):
            q_maps, q_valid = self._extract(step, params, q_imgs)
        with stage_timer("extract-gallery", self.verbose):
            # the reference re-extracts the whole gallery per cluster
            # (reference run.py:24); merged clusters and warm restarts hit
            # the (model, block, scale)-keyed cache instead
            gkey = GalleryFeatureCache.key(
                self.config["model"]["type"], plan.block, plan.scale,
                self.dataset.gallery_files,
            )
            cached = self.gallery_cache.get(gkey)
            if cached is None:
                g_maps, g_valid = self._extract(step, params, g_imgs)
                self.gallery_cache.put(gkey, g_maps, g_valid)
            else:
                g_maps, g_valid = cached
        with stage_timer("score", self.verbose):
            scores = self._score_cluster(q_maps, q_valid, g_maps, g_valid)
        pairs = self.dataset.matching_pairs(q_files)
        ranks = ranks_from_scores(scores, pairs)
        if self.verbose:
            for qi, rank in enumerate(ranks):
                print(f"Print {qi} true match ranked {rank}")
        return ClusterOutput(ranks, pairs, len(q_files), plan.block, plan.scale)

    def run(self):
        for plan in self.plans:
            if self.verbose:
                print(f"Cluster has {len(plan.files)} items.")
            with profile_trace(self.config["tpu"].get("profile_dir") or None):
                yield self.run_cluster(plan)

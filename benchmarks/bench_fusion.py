#!/usr/bin/env python3
"""Multi-layer summed-feature-map fusion scoring bench (driver config 3).

``tpu.fusion_blocks`` scores each cluster once per truncation block and sums
the score matrices (engine.run_cluster; the reference's
scripts/summed_feature_maps.py:1-7 is the single-layer per-channel form).
This bench measures the fused scoring cost on synthetic EfficientNetV2_M
feature shapes for the two shipped candidate blocks:

* block 6 (the reference's production default): 176 channels, stride 16
  (map sides ~38-46 at ~700 px scans);
* block 4: 80 channels, stride 8 (map sides ~76-92) — 4x the spatial area
  at ~0.45x the channels, so its NCC dot cost is ~1.8x block 6's.

Fusion cost is additive by construction (one full scoring pass per block);
the printed JSON reports the fused rate and each block's own rate so the
trade is explicit.

    python benchmarks/bench_fusion.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

QUICK = "--quick" in sys.argv


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_pipeline(rotations, scales, pb):
    from PIL import Image

    from shoeprint_image_retrieval_tpu.config import load_config
    from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline

    root = Path(tempfile.mkdtemp(prefix="bench_fusion_"))
    (root / "Gallery").mkdir()
    (root / "Query").mkdir()
    dummy = np.full((24, 24), 128, np.uint8)
    Image.fromarray(dummy).save(root / "Gallery" / "1_1.png")
    Image.fromarray(dummy).save(root / "Query" / "1_q0.png")
    cfg = root / "run.toml"
    cfg.write_text(f"""
[dataset]
dir = "{root}"
type = "Impress"
crop = [0.0, 0.0]
n_processes = 2
n_clusters = 1
cluster_minimise_tolerance = 0.05

[model]
type = "EfficientNetV2_M"
clahe_clip_limit = 2.0
clahe_tile_grid_size = [8, 8]
start_block = 6
end_block = 4
skip_blocks = [5]
minimum_dim = 8
maximum_dim = 800

[comparison]
n_processes = 2
rotations = {list(rotations)}
scales = {list(scales)}

[tpu]
mesh_shape = 1
prewarm = false
ncc_backend = "pallas"
probe_batch = {pb}
""")
    return Pipeline(load_config(cfg), weights_dir=None, verbose=False)


def make_maps(rng, n, c, lo, hi):
    sizes = np.stack(
        [rng.integers(lo, hi + 1, n), rng.integers(lo, hi + 1, n)], 1
    ).astype(np.int32)
    maps = np.zeros((n, c, hi, hi), np.float32)
    for i, (h, w) in enumerate(sizes):
        maps[i, :, :h, :w] = rng.normal(size=(c, h, w)).astype(np.float32)
    return maps, sizes


def main() -> None:
    import jax

    if QUICK:
        G, Q, PB = 16, 4, 2
        blocks = [  # (label, C, g_lo, g_hi, q_lo, q_hi)
            ("block6", 16, 18, 24, 14, 18),
            ("block4", 8, 30, 40, 24, 30),
        ]
        rotations, scales = [9.0], [1.04]
    else:
        G, Q, PB = 300, 56, int(os.environ.get("BENCH_PB", "56"))
        blocks = [
            ("block6", 176, 38, 46, 28, 36),
            ("block4", 80, 76, 92, 56, 72),
        ]
        rotations = [-15, -9, -3, 3, 9, 15, 180]
        scales = [1.02, 1.04, 1.08]

    log(f"devices: {jax.devices()}")
    pipe = make_pipeline(rotations, scales, PB)
    rng = np.random.default_rng(0)

    per_block = {}
    fused_scores = None
    fused_dt = 0.0
    for label, c, g_lo, g_hi, q_lo, q_hi in blocks:
        g_maps, g_sizes = make_maps(rng, G, c, g_lo, g_hi)
        q_maps, q_sizes = make_maps(rng, Q, c, q_lo, q_hi)
        t0 = time.perf_counter()
        pipe._score_cluster(q_maps, q_sizes, g_maps, g_sizes)
        log(f"{label}: compile+warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        s = pipe._score_cluster(q_maps, q_sizes, g_maps, g_sizes)
        dt = time.perf_counter() - t0
        per_block[label] = Q / dt
        fused_dt += dt
        fused_scores = s if fused_scores is None else fused_scores + s
        log(f"{label}: C={c} maps<= {g_hi}px -> {Q / dt:.2f} probes/s")

    assert fused_scores.shape == (Q, G)
    pps = Q / fused_dt
    log(f"fused ({'+'.join(per_block)}): {pps:.2f} probes/s")
    print(json.dumps({
        "metric": "probes_per_sec_fusion_two_block",
        "value": round(pps, 3),
        "unit": "probes/s",
        **{f"{k}_probes_per_sec": round(v, 3) for k, v in per_block.items()},
    }))


if __name__ == "__main__":
    main()

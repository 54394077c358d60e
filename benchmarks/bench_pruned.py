#!/usr/bin/env python3
"""Pruned-scoring prototype measurement (VERDICT r4 item 1).

Measures exact-preserving two-pass pruned scoring
(retrieval/pruned.pruned_ranks, engine flag ``tpu.pruned_scoring``) against
the full engine path on a G >= 1000 synthetic gallery, on whatever device
JAX resolves (the real chip under axon). Reports the prune rate, the
pair fraction actually scored, and probes/s for both paths — and asserts
rank identity between them (the mode's whole contract).

Two workloads:

* ``--workload planted`` — each query's feature maps are an exact
  sub-window of its matched print's maps, so the true-match score ~= 1.0
  (per-channel NCC hits 1 at the aligned full-overlap shift). This is the
  bound's favorable envelope: the field prunes whenever
  ``(k * s_k + C - k) / C < t - margin``.
* ``--workload random`` — i.i.d. normal maps: true-match scores sit at the
  field's level (~0.05-0.1), far below the ``(C - k)/C`` floor of the
  cap-1 bound, so the prune rate is ~0 and pruned mode COSTS ~(1 + k/C +
  pass-0) of the full path. This is the realistic regime — the honest
  negative result BASELINE.md round-5 records.

    python benchmarks/bench_pruned.py [--g 1024] [--q 56] [--k 22]
        [--workload planted|random] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_pipe(pb: int, rotations, scales):
    from PIL import Image

    from shoeprint_image_retrieval_tpu.config import load_config
    from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline

    root = Path(tempfile.mkdtemp(prefix="bench_pruned_"))
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=1024)
    ap.add_argument("--q", type=int, default=56)
    ap.add_argument("--k", type=int, default=0, help="prefix depth (0=C//8)")
    ap.add_argument("--workload", choices=("planted", "random"), default="planted")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
    from shoeprint_image_retrieval_tpu.retrieval.pruned import pruned_ranks

    if args.quick:
        G, C, Q = 32, 16, 6
        g_lo, g_hi, q_lo, q_hi = 18, 24, 14, 18
        pb = 4
        rotations, scales = [9, 180], [1.04]
    else:
        G, C, Q = args.g, 176, args.q
        g_lo, g_hi, q_lo, q_hi = 38, 46, 28, 36
        pb = min(int(os.environ.get("BENCH_PB", "56")), Q)
        rotations = [-15, -9, -3, 3, 9, 15, 180]
        scales = [1.02, 1.04, 1.08]

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    g_sizes = np.stack(
        [rng.integers(g_lo, g_hi + 1, G), rng.integers(g_lo, g_hi + 1, G)], 1
    ).astype(np.int32)
    gal = np.zeros((G, C, g_hi, g_hi), np.float32)
    for i, (h, w) in enumerate(g_sizes):
        gal[i, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)

    pairs = rng.permutation(G)[:Q].astype(np.int64)
    q_sizes = np.stack(
        [rng.integers(q_lo, q_hi + 1, Q), rng.integers(q_lo, q_hi + 1, Q)], 1
    ).astype(np.int32)
    qmaps = np.zeros((Q, C, q_hi, q_hi), np.float32)
    for qi in range(Q):
        h, w = int(q_sizes[qi, 0]), int(q_sizes[qi, 1])
        if args.workload == "planted":
            gh, gw = int(g_sizes[pairs[qi], 0]), int(g_sizes[pairs[qi], 1])
            h, w = min(h, gh), min(w, gw)
            q_sizes[qi] = (h, w)
            qmaps[qi, :, :h, :w] = gal[pairs[qi], :, :h, :w]
        else:
            qmaps[qi, :, :h, :w] = rng.normal(size=(C, h, w)).astype(np.float32)

    pipe = build_pipe(pb, rotations, scales)

    def score_fn(qm, qv, gm, gv):
        return np.asarray(pipe._score_cluster(
            np.ascontiguousarray(qm), np.asarray(qv),
            np.ascontiguousarray(gm), np.asarray(gv),
        ))

    def run_full():
        t0 = time.perf_counter()
        s = score_fn(qmaps, q_sizes, gal, g_sizes)
        return ranks_from_scores(s, pairs), time.perf_counter() - t0

    def run_pruned():
        t0 = time.perf_counter()
        r, st = pruned_ranks(
            score_fn, qmaps, q_sizes, gal, g_sizes, pairs, k=args.k
        )
        return r, st, time.perf_counter() - t0

    # compile warmup for every shape each path touches, then measure
    ranks_full, _ = run_full()
    ranks_full, dt_full = run_full()
    ranks_p, stats, _ = run_pruned()
    ranks_p, stats, dt_pruned = run_pruned()
    pipe.close()

    identical = ranks_p.tolist() == ranks_full.tolist()
    out = {
        "workload": args.workload,
        "g": G, "q": Q, "k": stats["k"],
        "prune_rate": round(stats["prune_rate"], 4),
        "pair_frac": round(stats["pair_frac"], 4),
        "pps_full": round(Q / dt_full, 3),
        "pps_pruned": round(Q / dt_pruned, 3),
        "speedup": round(dt_full / dt_pruned, 3),
        "ranks_identical": identical,
    }
    print(json.dumps(out))
    if not identical:
        bad = np.nonzero(ranks_p != ranks_full)[0]
        print(f"RANK MISMATCH at {bad.tolist()}: pruned="
              f"{ranks_p[bad].tolist()} full={ranks_full[bad].tolist()}",
              file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Feature-extraction throughput bench (the pipeline's other device stage).

The headline bench (bench.py) measures the scoring stage only; this one
measures the batched masked backbone extraction the engine runs per cluster
(engine._extract): CLAHE -> normalize -> truncated EfficientNetV2_M forward
on zero-padded canvases with per-image valid extents.

Workload: Impress-like ~700 px scans (the synthetic-Impress generator's
scale), canvas bucketed to 704x704, extraction_batch images per step —
the shipped run.toml configuration (EfficientNetV2_M, block 6, CLAHE 2.0
(8,8)). Gallery cache builds extract the full gallery once per (scale,
block), so images/s here bounds the cache build rate.

    python benchmarks/bench_extract.py [--batch 8] [--steps 4] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--canvas", type=int, default=704)
    ap.add_argument("--block", type=int, default=6)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.models.registry import get_backbone
    from shoeprint_image_retrieval_tpu.ops.clahe import clahe_batched_dynamic
    from shoeprint_image_retrieval_tpu.ops.preprocess import normalize_batch

    if args.quick:
        bs, steps, canvas, block = 2, 2, 128, 4
    else:
        bs, steps, canvas, block = args.batch, args.steps, args.canvas, args.block

    log(f"devices: {jax.devices()}")
    spec = get_backbone("EfficientNetV2_M")
    features = spec.build().truncate(block)
    params = features.init(jax.random.PRNGKey(0))

    @jax.jit
    def step(p, u8, v):
        eq = clahe_batched_dynamic(u8, v, 2.0, (8, 8))
        x = normalize_batch(eq, v, spec.mean, spec.std)
        return features.apply(p, x, v)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (bs, canvas, canvas), np.uint8)
    valid = np.stack(
        [rng.integers(canvas - 64, canvas + 1, bs),
         rng.integers(canvas - 64, canvas + 1, bs)], 1
    ).astype(np.int32)
    u8d, vd = jnp.asarray(u8), jnp.asarray(valid)

    t0 = time.perf_counter()
    maps, mv = step(params, u8d, vd)
    np.asarray(mv)  # round-trip real bytes (axon enqueue returns early)
    log(f"compile+warmup: {time.perf_counter() - t0:.2f}s "
        f"(canvas {canvas}, batch {bs}, block {block}, "
        f"maps {tuple(maps.shape)})")

    t0 = time.perf_counter()
    outs = [step(params, u8d, vd) for _ in range(steps)]
    np.asarray(outs[-1][0])
    dt = time.perf_counter() - t0
    ips = bs * steps / dt
    log(f"{bs * steps} images ({canvas}px canvas) in {dt:.2f}s "
        f"-> {ips:.2f} images/s")
    print(json.dumps({
        "metric": "extraction_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/s",
        "canvas": canvas,
        "batch": bs,
        "block": block,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Feature-extraction throughput bench (the pipeline's other device stage).

The headline bench (bench.py) measures the scoring stage only; this one
measures the batched masked backbone extraction the engine runs per cluster
(engine._extract) in both CLAHE configurations:

* ``device``: CLAHE -> normalize -> truncated backbone as ONE jitted step
  (tpu.clahe_host = false). The CLAHE LUT gathers dominate this step on TPU.
* ``host`` (engine default): native C++ CLAHE on the ingest threads
  (bit-exact vs cv2 and vs the device kernel), device step = normalize +
  backbone only.

All timings consume a scalar on device — pulling feature maps over the
axon tunnel would otherwise dominate and understate throughput (round-2
finding; the original version of this bench did exactly that).

    python benchmarks/bench_extract.py [--batch 32] [--steps 6] [--quick]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--canvas", type=int, default=704)
    ap.add_argument("--block", type=int, default=6)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.data import native_ingest
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
    def step_device_clahe(p, u8, v):
        eq = clahe_batched_dynamic(u8, v, 2.0, (8, 8))
        x = normalize_batch(eq, v, spec.mean, spec.std)
        maps, mv = features.apply(p, x, v)
        return jnp.sum(maps), mv

    @jax.jit
    def step_backbone(p, u8, v):
        x = normalize_batch(u8, v, spec.mean, spec.std)
        maps, mv = features.apply(p, x, v)
        return jnp.sum(maps), mv

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (bs, canvas, canvas), np.uint8)
    valid = np.stack(
        [rng.integers(canvas - 64, canvas + 1, bs),
         rng.integers(canvas - 64, canvas + 1, bs)], 1
    ).astype(np.int32)
    u8d, vd = jnp.asarray(u8), jnp.asarray(valid)

    def timed(fn, *a, reps=steps):
        np.asarray(fn(*a)[0])  # compile + warm (scalar round-trips)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        np.asarray(r[0])
        return (time.perf_counter() - t0) / reps

    t_dev = timed(step_device_clahe, params, u8d, vd)
    t_bb = timed(step_backbone, params, u8d, vd)
    log(f"device-CLAHE step: {t_dev * 1e3:.1f} ms/{bs} imgs "
        f"({bs / t_dev:.1f} img/s); backbone-only step: {t_bb * 1e3:.1f} ms "
        f"({bs / t_bb:.1f} img/s)")

    # host CLAHE (native C++), as the engine default runs it during ingest
    if native_ingest.available():
        imgs = [u8[i, : valid[i, 0], : valid[i, 1]] for i in range(bs)]
        native_ingest.clahe_batch(imgs, 2.0, (8, 8), 8)  # warm
        t0 = time.perf_counter()
        for _ in range(steps):
            native_ingest.clahe_batch(imgs, 2.0, (8, 8), 8)
        t_host = (time.perf_counter() - t0) / steps
        log(f"host CLAHE (native): {t_host * 1e3:.1f} ms/{bs} imgs")
        total = t_bb + t_host  # serial worst case; ingest threads overlap it
        ips = bs / total
        mode = "host_clahe"
    else:
        ips = bs / t_dev
        mode = "device_clahe"

    log(f"extraction ({mode}): {ips:.2f} images/s ({canvas}px canvas)")
    print(json.dumps({
        "metric": "extraction_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/s",
        "canvas": canvas,
        "batch": bs,
        "block": block,
        "mode": mode,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Build a realistic multi-cluster synthetic Impress-layout dataset.

The real Impress/WVU2019 datasets cannot be downloaded in this environment
(zero egress), so the end-to-end CMC baseline (BASELINE.md) runs on this
generator's output: laboratory-style ~700 px gallery "shoeprints" with
tread-like banded texture, and crime-scene-style queries that are noisy,
partially-occluded crops of their true match at two distinct size regimes
(forcing the planner into multiple clusters, exercising Algorithm 1 merge
logic and the per-cluster (scale, block) selection — reference
dataloader.py:300-419).

Layout matches the reference's Impress convention (reference
dataloader.py:39-43, 245-247): Dataset/{Gallery,Query}; query filename
``{gallery_id}_q{n}.png`` parses to its true match via
``int(f.split("_")[0])``.

    python scripts/make_synthetic_impress.py [out_dir] [--gallery N] [--queries N]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def tread_print(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """A shoeprint-like grayscale image: banded tread + blob noise + border."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    # tread bands at a random orientation/frequency mix
    for _ in range(int(rng.integers(2, 5))):
        theta = rng.uniform(0, np.pi)
        freq = rng.uniform(0.02, 0.09)
        phase = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(0.4, 1.0) * np.sin(
            2 * np.pi * freq * (np.cos(theta) * x + np.sin(theta) * y) + phase
        )
    # blob texture: smoothed uniform noise (separable box blurs)
    noise = rng.uniform(-1, 1, size=(h, w)).astype(np.float32)
    for _ in range(3):
        noise = (
            np.roll(noise, 1, 0) + np.roll(noise, -1, 0)
            + np.roll(noise, 1, 1) + np.roll(noise, -1, 1) + 4 * noise
        ) / 8.0
    img += 1.5 * noise
    # elliptical sole mask
    cy, cx = h / 2, w / 2
    mask = ((y - cy) / (0.48 * h)) ** 2 + ((x - cx) / (0.45 * w)) ** 2 <= 1.0
    img = np.where(mask, img, img.min())
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return (img * 255).astype(np.uint8)


def degrade(rng: np.random.Generator, crop: np.ndarray) -> np.ndarray:
    """Crime-scene degradation: noise + random occlusion strips."""
    out = crop.astype(np.int32)
    out += rng.integers(-25, 26, size=out.shape)
    for _ in range(int(rng.integers(1, 4))):
        if rng.random() < 0.5:
            r0 = int(rng.integers(0, out.shape[0]))
            out[r0 : r0 + int(rng.integers(3, 12))] = int(rng.integers(0, 255))
        else:
            c0 = int(rng.integers(0, out.shape[1]))
            out[:, c0 : c0 + int(rng.integers(3, 12))] = int(rng.integers(0, 255))
    return np.clip(out, 0, 255).astype(np.uint8)


def generate(out_dir, gallery: int = 120, queries: int = 30,
             seed: int = 20260816) -> None:
    """Write the seeded fixture under ``out_dir`` (run.py's quick-start
    auto-generation calls this on a fresh checkout)."""
    rng = np.random.default_rng(seed)
    root = Path(out_dir)
    (root / "Gallery").mkdir(parents=True, exist_ok=True)
    (root / "Query").mkdir(parents=True, exist_ok=True)

    prints = {}
    for gid in range(1, gallery + 1):
        h = int(rng.integers(640, 760))
        w = int(rng.integers(520, 620))
        img = tread_print(rng, h, w)
        Image.fromarray(img).save(root / "Gallery" / f"{gid}_1.jpg", quality=92)
        prints[gid] = img

    # two size regimes -> two planner clusters
    regimes = [(0.45, 0.55), (0.75, 0.9)]
    for qi in range(queries):
        gid = int(rng.integers(1, gallery + 1))
        src = prints[gid]
        lo, hi = regimes[qi % len(regimes)]
        ch = int(src.shape[0] * rng.uniform(lo, hi))
        cw = int(src.shape[1] * rng.uniform(lo, hi))
        y0 = int(rng.integers(0, src.shape[0] - ch + 1))
        x0 = int(rng.integers(0, src.shape[1] - cw + 1))
        crop = degrade(rng, src[y0 : y0 + ch, x0 : x0 + cw])
        Image.fromarray(crop).save(root / "Query" / f"{gid}_q{qi}.jpg", quality=92)

    print(f"wrote {gallery} gallery prints + {queries} queries under {root}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="datasets/SyntheticImpress/Dataset")
    ap.add_argument("--gallery", type=int, default=120)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--seed", type=int, default=20260816)
    args = ap.parse_args()
    generate(args.out, args.gallery, args.queries, args.seed)


if __name__ == "__main__":
    main()

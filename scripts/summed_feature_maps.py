#!/usr/bin/env python3
"""Visualize per-channel NCC correlation maps and their channel sum.

Runnable version of the reference's notebook fragment
(reference scripts/summed_feature_maps.py:1-7, which imports a nonexistent
module and undefined arrays): given a query and a gallery image, extract
feature maps, compute the per-channel normalized cross-correlation maps, and
plot a grid of individual channels next to the channel-summed map whose max
is the retrieval score.

Usage:
    python scripts/summed_feature_maps.py QUERY.png PRINT.png [out.png]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from shoeprint_image_retrieval_tpu.models.efficientnet import efficientnet_v2
    from shoeprint_image_retrieval_tpu.models.weights import load_or_init_params
    from shoeprint_image_retrieval_tpu.ops.clahe import clahe_u8
    from shoeprint_image_retrieval_tpu.ops.ncc import normxcorr_same
    from shoeprint_image_retrieval_tpu.ops.preprocess import normalize_batch
    from shoeprint_image_retrieval_tpu.models.registry import IMAGENET_MEAN, IMAGENET_STD

    query_path, print_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "summed_feature_maps.png"

    features = efficientnet_v2("M").truncate(6)
    params = load_or_init_params(features, "EfficientNetV2_M")

    def maps_of(path):
        img = np.asarray(Image.open(path).convert("L"))
        eq = clahe_u8(jnp.asarray(img))
        x = normalize_batch(
            eq[None], jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32),
            IMAGENET_MEAN, IMAGENET_STD,
        )
        y, v = features.apply(
            params, x, jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32)
        )
        return np.asarray(y)[0, :, : int(v[0, 0]), : int(v[0, 1])]

    q = maps_of(query_path)[:, 2:-2, 2:-2]
    p = maps_of(print_path)[:, 2:-2, 2:-2]

    n_show = 8
    corr = [np.asarray(normxcorr_same(jnp.asarray(q[c]), jnp.asarray(p[c])))
            for c in range(q.shape[0])]
    summed = np.sum(corr, axis=0)

    fig, axes = plt.subplots(1, n_show + 1, figsize=(3 * (n_show + 1), 3))
    for i in range(n_show):
        axes[i].imshow(corr[i], cmap="viridis")
        axes[i].set_title(f"channel {i}")
        axes[i].axis("off")
    axes[-1].imshow(summed, cmap="magma")
    axes[-1].set_title(f"summed (score={summed.max() / q.shape[0]:.4f})")
    axes[-1].axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

"""One-command real-data parity harness (``python run.py --parity``).

Runs the TPU pipeline AND the reference-semantics CPU oracle on the SAME
dataset and asserts rank identity per cluster — the rankings-identical
contract (SURVEY.md section 6 build target), checkable by the first user
who holds real FID-300 / Impress / WVU2019 data (reference
dataloader.py:97-107 layouts) and real pretrained weights, with zero glue
code:

1. export the torchvision checkpoints once on any machine with torch +
   download access: ``python scripts/export_torchvision_weights.py`` (one
   ``.npz`` per backbone into ``weights/``);
2. point ``run.toml`` ``[dataset] dir`` at the dataset;
3. ``python run.py --parity run.toml``.

The oracle side is maximally independent of the production path: per-image
cv2 CLAHE on host (the reference's network.py:108-111, 197-208 — including
the RGB LAB round trip), native-shape batch-1 extraction (no padding, no
masking — reference network.py:210-244), and the transliterated
FFT-normxcorr scoring + per-query argsort ranks of
:mod:`~shoeprint_image_retrieval_tpu.retrieval.oracle` (reference
similarity.py:26-108, 357-386). Shared with the TPU path: only the backbone
weights and the image loader (whose PIL bit-exactness is proven separately,
tests/test_native.py).

Exit status: 0 when every cluster's ranks match, 1 otherwise — both CMC
lines print either way.
"""

from __future__ import annotations

import numpy as np

from ..metrics import cmp_all
from . import oracle


def _oracle_clahe(img: np.ndarray, clip_limit: float, tile_grid) -> np.ndarray:
    """cv2 CLAHE exactly as the reference applies it (network.py:197-208):
    grayscale directly; RGB through the LAB L channel."""
    import cv2

    op = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=tuple(tile_grid))
    if img.ndim == 2:
        return op.apply(img)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    l_ch, a_ch, b_ch = cv2.split(lab)
    return cv2.cvtColor(cv2.merge((op.apply(l_ch), a_ch, b_ch)), cv2.COLOR_LAB2RGB)


def oracle_cluster_ranks(pipe, plan) -> tuple[np.ndarray, list[int]]:
    """Reference-semantics ranks for one cluster: ``(ranks, matching_pairs)``.

    Mirrors the reference's run.py:17-34 body on the CPU: load the query
    cluster + the full gallery at the cluster's scale, CLAHE + extract each
    image at its native shape, score with the oracle NCC sweep, rank by
    descending argsort.
    """
    import jax.numpy as jnp

    from ..data.loader import load_images
    from ..ops.preprocess import normalize_batch

    config = pipe.config
    crop = config["dataset"]["crop"]
    n_threads = config["dataset"]["n_processes"]
    q_files = sorted(plan.files)
    q_imgs = load_images(pipe.dataset.query_dir, q_files, plan.scale, crop, n_threads)
    g_imgs = load_images(
        pipe.dataset.gallery_dir, pipe.dataset.gallery_files, plan.scale,
        crop, n_threads,
    )
    features, params, _ = pipe._model_for_block(plan.block)
    clip = config["model"]["clahe_clip_limit"]
    grid = config["model"]["clahe_tile_grid_size"]

    def native_maps(img: np.ndarray) -> np.ndarray:
        eq = _oracle_clahe(img, clip, grid)
        hw = jnp.asarray([[eq.shape[0], eq.shape[1]]], jnp.int32)
        x = normalize_batch(jnp.asarray(eq)[None], hw, pipe.spec.mean, pipe.spec.std)
        y, v = features.apply(params, x, hw)
        y = np.asarray(y)[0]
        return y[:, : int(v[0, 0]), : int(v[0, 1])]

    marks = [native_maps(im) for im in q_imgs]
    prints = [native_maps(im) for im in g_imgs]
    scores = oracle.score_matrix(
        marks, prints,
        config["comparison"]["rotations"], config["comparison"]["scales"],
        config["tpu"]["variant_mode"],
    )
    pairs = pipe.dataset.matching_pairs(q_files)
    return oracle.rank_queries(scores, pairs), pairs


def run_parity(config) -> int:
    """TPU pipeline vs CPU oracle on one dataset; 0 = ranks identical."""
    from .engine import Pipeline

    pipe = Pipeline(config)
    tpu_ranks: list[int] = []
    orc_ranks: list[int] = []
    failures = 0
    try:
        for i, plan in enumerate(pipe.plans):
            print(f"Cluster has {len(plan.files)} items.")
            out = pipe.run_cluster(plan)
            want, _pairs = oracle_cluster_ranks(pipe, plan)
            got = np.asarray(out.ranks)
            tpu_ranks += got.tolist()
            orc_ranks += want.tolist()
            if got.tolist() == want.tolist():
                print(f"cluster {i}: PARITY OK ({len(got)} queries)")
            else:
                failures += 1
                bad = np.nonzero(got != want)[0]
                print(
                    f"cluster {i}: PARITY MISMATCH at query idx "
                    f"{bad.tolist()}: tpu={got[bad].tolist()} "
                    f"oracle={want[bad].tolist()}"
                )
    finally:
        pipe.close()
    g_total = len(pipe.dataset.gallery_files)
    q_total = len(pipe.dataset.query_files)
    print("TPU pipeline CMC:")
    cmp_all(tpu_ranks, total_shoeprints=g_total, total_shoemarks=q_total)
    print("CPU oracle  CMC:")
    cmp_all(orc_ranks, total_shoeprints=g_total, total_shoemarks=q_total)
    print("PARITY: " + ("ranks identical" if failures == 0 else
                        f"{failures} cluster(s) mismatched"))
    return 0 if failures == 0 else 1

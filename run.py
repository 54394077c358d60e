#!/usr/bin/env python3
"""Run shoeprint image retrieval (TPU-native pipeline).

Public surface mirrors the reference driver (reference run.py:1-34): reads
``run.toml`` (or a path given as the first CLI argument — a small extension;
the reference hardcodes the name), iterates size clusters, and prints one
``S1 .. S20`` line per cluster with global denominators.
"""

import sys
from pathlib import Path

from shoeprint_image_retrieval_tpu.config import load_config
from shoeprint_image_retrieval_tpu.metrics import cmp_all
from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline

_SYNTHETIC = "SyntheticImpress"


def _ensure_dataset(config) -> None:
    """First-run quick start: the shipped run.toml points at the committed
    synthetic-Impress fixture; generate it on demand so a fresh checkout's
    ``python run.py`` works end-to-end. Any OTHER missing dataset dir is a
    user error and gets a clear message instead of a deep traceback."""
    d = Path(config["dataset"]["dir"])
    if d.is_dir():
        return
    if _SYNTHETIC in d.parts:
        print(f"Dataset {d} not found - generating the synthetic Impress "
              "fixture (scripts/make_synthetic_impress.py)...")
        from scripts.make_synthetic_impress import generate

        generate(d)
        return
    raise SystemExit(
        f"Dataset directory {d} does not exist. Point [dataset].dir at a "
        "reference-layout dataset (Gallery/ + Query/, see "
        "datasets/create_dataset.sh), or keep the default SyntheticImpress "
        "path to auto-generate a fixture."
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--parity"]
    config = load_config(args[0] if args else "run.toml")
    _ensure_dataset(config)
    if "--parity" in sys.argv[1:]:
        # rankings-identical parity audit: TPU pipeline vs CPU oracle on the
        # same dataset, both CMC lines printed, exit 1 on any rank mismatch
        # (see retrieval/parity.py for the weights-loading story)
        from shoeprint_image_retrieval_tpu.retrieval.parity import run_parity

        raise SystemExit(run_parity(config))
    pipeline = Pipeline(config)
    for out in pipeline.run():
        print("Calculating ranks:")
        cmp_all(
            out.ranks.tolist(),
            total_shoeprints=len(pipeline.dataset.gallery_files),
            total_shoemarks=len(pipeline.dataset.query_files),
        )


if __name__ == "__main__":
    main()

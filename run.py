#!/usr/bin/env python3
"""Run shoeprint image retrieval (TPU-native pipeline).

Public surface mirrors the reference driver (reference run.py:1-34): reads
``run.toml`` (or a path given as the first CLI argument — a small extension;
the reference hardcodes the name), iterates size clusters, and prints one
``S1 .. S20`` line per cluster with global denominators.
"""

import sys

from shoeprint_image_retrieval_tpu.config import load_config
from shoeprint_image_retrieval_tpu.metrics import cmp_all
from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline


def main() -> None:
    config = load_config(sys.argv[1] if len(sys.argv) > 1 else "run.toml")
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

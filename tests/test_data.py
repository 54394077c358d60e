"""Data-layer tests: ID parsing, matching pairs, planning / Algorithm 1.

These are the semantics that decide *what* gets compared at *which*
(scale, block) — reference dataloader.py:97-107 (pairs), 244-250 (IDs),
255-419 (clustering + Algorithm 1).
"""

import csv

import numpy as np
import pytest
from PIL import Image

from shoeprint_image_retrieval_tpu.data.discovery import Dataset, parse_image_id
from shoeprint_image_retrieval_tpu.data.planner import (
    PlannerConfig,
    cluster_by_min_dim,
    find_best_scale,
    image_extremes,
    plan_clusters,
)


def test_parse_image_id_per_dataset():
    # reference dataloader.py:244-250
    assert parse_image_id("00123_1.png", "Impress") == 123
    assert parse_image_id("7.something_x.png", "Impress") == 7
    assert parse_image_id("042_probe_2.jpg", "WVU2019") == 42
    assert parse_image_id("00311.png", "FID-300") == 311


def _mk_dataset(root, gallery_names, query_names):
    (root / "Gallery").mkdir(parents=True)
    (root / "Query").mkdir()
    img = Image.fromarray(np.zeros((10, 10), np.uint8))
    for n in gallery_names:
        img.save(root / "Gallery" / n)
    for n in query_names:
        img.save(root / "Query" / n)


def test_matching_pairs_by_index(tmp_path):
    """Index of the matching gallery id in sorted gallery order (reference
    dataloader.py:98-99: many queries -> one print)."""
    _mk_dataset(tmp_path, ["1_1.png", "2_1.png", "3_1.png"],
                ["2_q0.png", "2_q1.png", "1_q0.png"])
    ds = Dataset(tmp_path, "Impress")
    assert ds.matching_pairs(["2_q0.png", "2_q1.png", "1_q0.png"]) == [1, 1, 0]


def test_matching_pairs_fid300_csv(tmp_path):
    """FID-300 maps through label_table.csv with 1-based gallery ids
    (reference dataloader.py:101-107)."""
    _mk_dataset(tmp_path, ["00001.png", "00002.png"], ["00005.png"])
    with (tmp_path / "label_table.csv").open("w", newline="") as fh:
        csv.writer(fh).writerows([[5, 2], [6, 1]])
    ds = Dataset(tmp_path, "FID-300")
    assert ds.matching_pairs(["00005.png"]) == [1]


def test_cluster_by_min_dim_deterministic():
    sizes = [(100, 300), (105, 280), (400, 90), (500, 600), (510, 620)]
    a = cluster_by_min_dim(sizes, 2, seed=0)
    b = cluster_by_min_dim(sizes, 2, seed=0)
    assert a == b
    # min-dims 100, 105, 90 together; 500, 510 together
    groups = sorted(tuple(sorted(g)) for g in a)
    assert groups == [(0, 1, 2), (3, 4)]


def test_image_extremes_correct_vs_reference_mode():
    sizes = [(100, 200), (300, 50)]  # (width, height)
    crop = (0.1, 0.2)
    # correct: heights cropped by 2*10%, widths by 2*20%
    largest, smallest = image_extremes(sizes, crop, "correct")
    # img1: w=100-40=60, h=200-40=160; img2: w=300-120=180, h=50-40=40
    assert largest == 180 and smallest == 40
    # reference mode swaps axes (reference dataloader.py:446) and skips the
    # smallest-update whenever largest updated (dataloader.py:458-464): here
    # every image updates largest, so smallest keeps the int-max sentinel —
    # exactly the reference's behavior
    r_large, r_small = image_extremes(sizes, crop, "reference")
    assert r_large == 240 and r_small == 2**31 - 1


CFG = PlannerConfig(minimum_dim=300, maximum_dim=800, start_block=6,
                    end_block=4, skip_blocks=(5,), cluster_tolerance=0.05)


def test_algorithm1_no_change_needed():
    assert find_best_scale(400, 700, CFG) == (1.0, 6)


def test_algorithm1_small_steps_block_down():
    # smallest 200 < 300: block 6 -> 4 (5 skipped), minimum halves to 150
    scale, block = find_best_scale(200, 700, CFG)
    assert (scale, block) == (1.0, 4)


def test_algorithm1_large_downscales():
    scale, block = find_best_scale(600, 1600, CFG)
    assert block == 6 and scale == pytest.approx(0.5)


def test_algorithm1_large_and_small_conflict():
    # downscale 800/1600=0.5 pushes smallest 400 -> 200 < 300: block drops
    scale, block = find_best_scale(400, 1600, CFG)
    assert block == 4 and scale == pytest.approx(0.5)


def test_plan_clusters_merges_within_tolerance(tmp_path):
    q_sizes = [(900, 900), (910, 910), (920, 920)]
    g_sizes = [(900, 900)]
    plans = plan_clusters(
        q_sizes, ["a.png", "b.png", "c.png"], g_sizes,
        (0.0, 0.0), 3, CFG,
    )
    # all scales within 0.05 of each other at the same block -> one plan
    assert len(plans) == 1
    assert sorted(plans[0].files) == ["a.png", "b.png", "c.png"]

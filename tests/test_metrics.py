"""Metric tests vs hand-computed cases and the reference formulas.

Oracles transliterate reference similarity.py:378-386 (rank) and
parse_results.py:4-35 (S-scores) per SURVEY.md section 4.
"""

import numpy as np

from shoeprint_image_retrieval_tpu.metrics import cmp, cmp_all, ranks_from_scores


def _reference_rank(similarities, matching_pairs, print_id):
    sorted_sims = np.flip(np.argsort(similarities))
    return int(np.where(sorted_sims == matching_pairs[print_id])[0][0] + 1)


def test_ranks_match_reference_oracle():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(17, 53)).astype(np.float32)
    pairs = rng.integers(0, 53, size=17).tolist()
    got = ranks_from_scores(scores, pairs)
    want = [_reference_rank(scores[q], pairs, q) for q in range(17)]
    assert got.tolist() == want
    assert got.dtype == np.int32


def test_rank_simple_case():
    scores = np.array([[0.1, 0.9, 0.5]])
    assert ranks_from_scores(scores, [1]).tolist() == [1]
    assert ranks_from_scores(scores, [2]).tolist() == [2]
    assert ranks_from_scores(scores, [0]).tolist() == [3]


def test_cmp_threshold_not_rounded():
    # p=1, 50 prints -> z = 0.5: rank 1 does NOT count (reference
    # parse_results.py:19-22 uses the raw fraction).
    assert cmp([1, 1, 1], 1, 50, 3) == 0.0
    # p=2, 50 prints -> z = 1.0: rank 1 counts.
    assert cmp([1, 2, 1], 2, 50, 3) == 2 / 3


def test_cmp_global_denominator():
    # The reference divides by global shoemark count even per-cluster
    # (reference run.py:30-34).
    assert cmp([1], 10, 100, 50) == 1 / 50


def test_cmp_all_prints_reference_format(capsys):
    out = cmp_all([1, 3, 60], 100, 3)
    line = capsys.readouterr().out.strip()
    assert line == "S1:33.33 S5:66.67 S10:66.67 S15:66.67 S20:66.67"
    assert abs(out[1] - 100 / 3) < 1e-9

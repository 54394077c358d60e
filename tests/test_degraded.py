"""Driver config 4: degraded crime-scene probes, rotation+translation sweep.

BASELINE.json configs[3]: "Degraded crime-scene probes with
rotation+translation sweep NCC scoring". The translation sweep is inherent
to NCC — every spatial shift of the probe against the print is scored and
max-reduced (reference similarity.py:55-59 scans all shifts via "same"-mode
convolution); the rotation sweep is the reference's transform-variant axis
(reference similarity.py:321-353). This module degrades probes the way
crime-scene marks degrade — translated (partial, off-center), rotated,
occluded, sensor-noisy, and compounded — and asserts the production
pipeline still ranks the true match first, identically across scoring
backends.

Shapes are tiny (1-core CPU host); features are seeded random-init VGG16
truncations, so the test proves the scoring sweep's recovery behavior, not
retrieval accuracy of pretrained features (see README accuracy caveat).
"""

import numpy as np
import pytest
from PIL import Image

from shoeprint_image_retrieval_tpu.config import load_config
from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline

RUN_TOML = """
[dataset]
dir = "{dir}"
type = "Impress"
crop = [0.0, 0.0]
n_processes = 2
n_clusters = 1
cluster_minimise_tolerance = 0.05

[model]
type = "VGG16"
clahe_clip_limit = 2.0
clahe_tile_grid_size = [4, 4]
start_block = 5
end_block = 3
skip_blocks = []
minimum_dim = 8
maximum_dim = 200

[comparison]
n_processes = 2
rotations = [9, 180]
scales = ""

[tpu]
extraction_batch = 4
mesh_shape = 1
{extra}
"""


@pytest.fixture(scope="module")
def degraded_dataset(tmp_path_factory):
    """Gallery of 8 prints; 4 probes, one per degradation mode.

    Probe construction (all crops of their true match, + noise):
    * probe 1 — TRANSLATED: off-center crop (the NCC shift scan must find
      the displaced overlap; reference similarity.py:55-59);
    * probe 2 — ROTATED: crop rotated -9 deg (recovered by the sweep's
      +9 deg variant; reference similarity.py:321-353);
    * probe 3 — OCCLUDED: ~25% of the crop blacked out (max-over-shifts is
      robust to a dead region as long as the live region correlates);
    * probe 4 — COMPOUND: translated AND occluded AND noisy.
    """
    root = tmp_path_factory.mktemp("degraded_ds")
    (root / "Gallery").mkdir()
    (root / "Query").mkdir()
    rng = np.random.default_rng(11)

    prints = {}
    for gi in range(8):
        h, w = int(rng.integers(62, 74)), int(rng.integers(58, 70))
        img = rng.integers(30, 220, size=(h, w), dtype=np.uint8)
        Image.fromarray(img).save(root / "Gallery" / f"{gi + 1}_1.png")
        prints[gi + 1] = img

    def noisy(a: np.ndarray) -> np.ndarray:
        n = rng.integers(-10, 11, size=a.shape)
        return np.clip(a.astype(int) + n, 0, 255).astype(np.uint8)

    # probe 1: translated — crop from an off-center corner window
    q = noisy(prints[1][14:56, 12:52].copy())
    Image.fromarray(q).save(root / "Query" / "1_q0.png")

    # probe 2: rotated -9 deg (NEAREST, 0-fill — the reference's feature-map
    # rotation convention; here applied to the image itself)
    src = Image.fromarray(prints[2][8:54, 6:50].copy())
    q = noisy(np.asarray(src.rotate(-9, resample=Image.Resampling.NEAREST)))
    Image.fromarray(q).save(root / "Query" / "2_q1.png")

    # probe 3: occluded — black out a ~25% block
    q = prints[3][6:50, 6:48].copy()
    q[4:26, 4:24] = 0
    Image.fromarray(noisy(q)).save(root / "Query" / "3_q2.png")

    # probe 4: compound — translated crop + occlusion + noise
    q = prints[4][16:58, 14:54].copy()
    q[20:40, 22:38] = 0
    Image.fromarray(noisy(q)).save(root / "Query" / "4_q3.png")

    return root


def _run(dataset, tmp_path, extra: str) -> np.ndarray:
    tmp_path.mkdir(parents=True, exist_ok=True)
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset), extra=extra))
    pipe = Pipeline(load_config(cfg_path), weights_dir=None, verbose=False)
    return np.concatenate([o.ranks for o in pipe.run()])


def test_degraded_probes_rank_first(degraded_dataset, tmp_path):
    """Every degradation mode's true match ranks 1 of 8 (config 4)."""
    ranks = _run(degraded_dataset, tmp_path, 'ncc_backend = "direct"')
    assert ranks.shape == (4,)
    np.testing.assert_array_equal(ranks, np.ones(4, np.int32))


def test_degraded_backends_identical(degraded_dataset, tmp_path):
    """The fused Pallas production backend ranks the degraded probes
    identically to the XLA direct backend (rankings-identical contract
    under every degradation mode)."""
    direct = _run(degraded_dataset, tmp_path / "a", 'ncc_backend = "direct"')
    pallas = _run(degraded_dataset, tmp_path / "b", 'ncc_backend = "pallas"')
    np.testing.assert_array_equal(pallas, direct)

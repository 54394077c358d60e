"""Config loader tests: reference-compatible parsing (reference config.py:51-64)."""

from pathlib import Path

from shoeprint_image_retrieval_tpu.config import load_config

REFERENCE_STYLE_TOML = """
[dataset]
dir = "./datasets/Data/Impress/Dataset/"
type = "Impress"
crop = [0.1,0.2]
n_processes = 24
n_clusters = 10
cluster_minimise_tolerance = 0.05

[model]
type = "EfficientNetV2_M"
clahe_clip_limit = 2.0
clahe_tile_grid_size = [8,8]
start_block = 6
end_block = 4
skip_blocks = [5]
minimum_dim = 300
maximum_dim = 800

[comparison]
n_processes = 30
rotations =  [-15, -9, -3, 3, 9, 15, 180]
scales = [1.02, 1.04, 1.08]
"""


def _write(tmp_path: Path, text: str) -> Path:
    p = tmp_path / "run.toml"
    p.write_text(text)
    return p


def test_reference_toml_loads_unchanged(tmp_path):
    cfg = load_config(_write(tmp_path, REFERENCE_STYLE_TOML))
    assert cfg["dataset"]["type"] == "Impress"
    assert cfg["dataset"]["crop"] == [0.1, 0.2]
    assert cfg["model"]["type"] == "EfficientNetV2_M"
    assert cfg["model"]["skip_blocks"] == [5]
    assert cfg["comparison"]["rotations"] == [-15, -9, -3, 3, 9, 15, 180]
    assert cfg["comparison"]["scales"] == [1.02, 1.04, 1.08]
    # TPU section defaulted for reference-style files
    assert cfg["tpu"]["precision"] == "float32"
    assert cfg["tpu"]["variant_mode"] == "reference"


def test_empty_string_coerces_to_none(tmp_path):
    """Reference config.py:60-63: "" means no rotations/scales."""
    text = REFERENCE_STYLE_TOML.replace(
        "rotations =  [-15, -9, -3, 3, 9, 15, 180]", 'rotations = ""'
    ).replace("scales = [1.02, 1.04, 1.08]", 'scales = ""')
    cfg = load_config(_write(tmp_path, text))
    assert cfg["comparison"]["rotations"] is None
    assert cfg["comparison"]["scales"] is None


def test_tpu_section_overrides(tmp_path):
    text = REFERENCE_STYLE_TOML + "\n[tpu]\nmesh_shape = 8\nvariant_mode = \"full\"\n"
    cfg = load_config(_write(tmp_path, text))
    assert cfg["tpu"]["mesh_shape"] == 8
    assert cfg["tpu"]["variant_mode"] == "full"
    assert cfg["tpu"]["precision"] == "float32"  # default preserved

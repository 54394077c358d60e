"""Smoke tests for the research visualization scripts.

The reference ships these as broken notebook fragments (reference
scripts/summed_feature_maps.py imports a nonexistent module; reference
scripts/conv_animation.py references undefined arrays) — the rewrites must
actually run end to end and produce their artifact.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device is enough + faster
    # generous bound: the summed-maps script compiles a small backbone and
    # takes ~5 min alone on this 1-core machine — under full-suite CPU
    # contention it can take 2-3x that
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1500,
    )


@pytest.mark.slow
def test_summed_feature_maps_script(tmp_path):
    rng = np.random.default_rng(3)
    for name in ("q.png", "p.png"):
        Image.fromarray(
            rng.integers(0, 256, size=(160, 144), dtype=np.uint8)
        ).save(tmp_path / name)
    out = tmp_path / "maps.png"
    res = _run(
        [str(REPO / "scripts" / "summed_feature_maps.py"),
         str(tmp_path / "q.png"), str(tmp_path / "p.png"), str(out)],
        cwd=tmp_path,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0


def test_conv_animation_script(tmp_path):
    out = tmp_path / "anim.gif"
    res = _run(
        [str(REPO / "scripts" / "conv_animation.py"), str(out)], cwd=tmp_path
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0

"""Backbone parameter loading: converted torchvision checkpoints or seeded init.

The reference downloads pretrained torchvision weights at model-build time
(reference network.py:121-182). This environment has no egress, so weights
resolve in order:

1. ``{weights_dir}/{model_type}.npz`` or ``.pth`` — a torchvision
   ``state_dict`` exported offline, mapped by :mod:`.convert`;
2. deterministic random init (seeded by model name) with a loud warning —
   the pipeline stays runnable and rankings stay reproducible, but accuracy
   is meaningless until real weights are supplied.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import jax

from .convert import convert, load_state_dict
from .efficientnet import Features
from .registry import get_backbone


def build_model(
    model_type: str,
    block: int,
    weights_dir: str | Path | None = "weights",
) -> tuple[Features, dict]:
    """Build a truncated backbone + params (reference Model.__init__ analog,
    network.py:93-195: select by string, truncate ``features[:block]``)."""
    spec = get_backbone(model_type)
    features = spec.build().truncate(block)
    params = load_or_init_params(features, model_type, weights_dir)
    return features, params


def load_or_init_params(
    features: Features,
    model_type: str,
    weights_dir: str | Path | None = "weights",
) -> dict:
    if weights_dir is not None:
        for suffix in (".npz", ".pth", ".pt"):
            path = Path(weights_dir) / f"{model_type}{suffix}"
            if path.exists():
                sd = load_state_dict(path)
                return convert(features, sd, truncated=True)
    print(
        f"[shoeprint-tpu] WARNING: no checkpoint for {model_type} under "
        f"{weights_dir!r}; using seeded random init (retrieval accuracy will "
        "be meaningless until torchvision weights are exported there).",
        file=sys.stderr,
    )
    seed = int.from_bytes(hashlib.sha256(model_type.encode()).digest()[:4], "little")
    return features.init(jax.random.PRNGKey(seed))

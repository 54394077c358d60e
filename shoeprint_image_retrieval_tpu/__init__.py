"""shoeprint_image_retrieval_tpu — a TPU-native (JAX/XLA/Pallas) shoeprint retrieval framework.

A ground-up TPU-first rebuild of the capabilities of the reference
``struan-robertson/shoeprint-image-retrieval`` pipeline:

* host ingest (decode / crop / Lanczos resize) feeding a jitted preprocessing
  pipeline (CLAHE, normalize),
* frozen ImageNet-style CNN backbones truncated at an intermediate block,
  executed as batched, bucket-padded XLA convolutions with exact validity-mask
  propagation (so batched extraction is numerically equivalent to the
  reference's one-image-at-a-time extraction),
* a single batched-FFT normalized-cross-correlation ranking kernel with
  dynamic valid extents (one XLA compilation serves every query shape in a
  cluster), an HBM-resident gallery feature/FFT cache, and
* gallery-axis sharding over a ``jax.sharding.Mesh`` with score all-gathers
  over ICI.

Public CLI surface mirrors the reference: ``python run.py`` driven by
``run.toml`` (reference: run.py:1-34, run.toml:1-25).
"""

__version__ = "0.1.0"

from .config import Config, load_config  # noqa: F401
from .metrics import cmp, cmp_all  # noqa: F401

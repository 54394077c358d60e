"""Gallery feature cache: per-(model, block, scale) features, RAM + disk.

The reference re-extracts the ENTIRE gallery's features for every cluster at
that cluster's scale (reference run.py:23-24) — its gitignore shows the
author cached feature maps to disk out-of-tree (``/Memmaps/``, ``*.npy``,
reference .gitignore:3-8) but shipped no cache code. This module is that
missing subsystem:

* in-process: features for each (model_type, block, scale) are kept after
  first extraction, so merged clusters and repeated runs of the same plan
  never recompute;
* on disk (optional ``tpu.cache_dir``): spilled as ``.npz`` — a warm start
  reloads instead of re-running the backbone, which is also the
  checkpoint/resume story for long gallery builds (SURVEY.md section 5).

Keys include a content fingerprint of the gallery file list so a changed
gallery invalidates stale entries instead of silently serving them.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Sequence

import numpy as np


class GalleryFeatureCache:
    def __init__(self, cache_dir: str | Path | None = None):
        self.cache_dir = Path(cache_dir) if cache_dir else None
        if self.cache_dir:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._ram: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    @staticmethod
    def key(
        model_type: str,
        block: int,
        scale: float,
        gallery_files: Sequence[str],
        *,
        gallery_dir: str | Path | None = None,
        params: object = None,
    ) -> str:
        """Cache key. ``gallery_dir`` adds a per-file (size, mtime) stat
        fingerprint so regenerated images with unchanged NAMES (e.g. the
        synthetic fixture re-generated with a different seed) invalidate
        stale features instead of silently serving them; ``params`` folds
        in any preprocessing settings that change the features (crop,
        CLAHE, precision)."""
        h = hashlib.sha256()
        for f in gallery_files:
            h.update(f.encode())
            if gallery_dir is not None:
                st = (Path(gallery_dir) / f).stat()
                h.update(f":{st.st_size}:{st.st_mtime_ns}".encode())
            h.update(b"\n")
        if params is not None:
            h.update(repr(params).encode())
        listing = h.hexdigest()[:12]
        return f"{model_type}_b{block}_s{scale:.6f}_{listing}"

    def get(self, key: str) -> tuple[np.ndarray, np.ndarray] | None:
        if key in self._ram:
            return self._ram[key]
        if self.cache_dir:
            path = self.cache_dir / f"{key}.npz"
            if path.exists():
                with np.load(path) as z:
                    entry = (z["maps"], z["valid"])
                self._ram[key] = entry
                return entry
        return None

    def put(self, key: str, maps: np.ndarray, valid: np.ndarray) -> None:
        # normalize to host: a device-resident map set (engine
        # _device_maps_budget) must not pin HBM across clusters via the RAM
        # cache — the hit path re-uploads per cluster, the miss path (fresh
        # extraction -> scoring) stays device-resident end to end
        maps = np.asarray(maps)
        valid = np.asarray(valid)
        self._ram[key] = (maps, valid)
        if self.cache_dir:
            tmp = self.cache_dir / f"{key}.tmp.npz"  # np.savez appends .npz
            np.savez(tmp, maps=maps, valid=valid)
            tmp.rename(self.cache_dir / f"{key}.npz")  # atomic publish

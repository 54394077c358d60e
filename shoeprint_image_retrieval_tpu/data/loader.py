"""Host image ingest: decode, crop, Lanczos resize, canvas packing.

The reference forks ``n_processes`` OS processes that fill Manager lists
(with a chunking bug and a shared-list corruption workaround — reference
dataloader.py:115-253, SURVEY.md section 2.1). Here ingest is a thread pool
(PIL decode releases the GIL; one process, no shared-memory races — the race
class the reference's run.toml comments complain about simply cannot occur)
feeding zero-padded uint8 canvases + valid sizes straight into the jitted
device pipeline (CLAHE -> normalize -> CNN).

Per-image semantics match the reference exactly: crop box
``floor(h*crop[0]) / floor(w*crop[1])`` per edge, resize to
``(int(w*scale), int(h*scale))`` with PIL LANCZOS (reference
dataloader.py:218-237). Decode errors raise with the offending filename
instead of corrupting shared state (SURVEY.md section 5: failure detection).
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Sequence

import numpy as np
from PIL import Image


def load_one(
    path: Path, scale: float, crop: Sequence[float]
) -> np.ndarray:
    """Decode + crop + LANCZOS-resize one image to uint8 (reference
    dataloader.py:212-237 semantics)."""
    try:
        with Image.open(path) as im:
            crop_h = math.floor(im.height * crop[0])
            crop_w = math.floor(im.width * crop[1])
            im = im.crop((crop_w, crop_h, im.width - crop_w, im.height - crop_h))
            new_w = int(im.width * scale)
            new_h = int(im.height * scale)
            im = im.resize((new_w, new_h), Image.Resampling.LANCZOS)
            return np.asarray(im)
    except Exception as exc:  # surface failures at ingest, never corrupt state
        raise RuntimeError(f"failed to ingest image {path}: {exc}") from exc


def load_images(
    directory: Path | str,
    files: Sequence[str],
    scale: float,
    crop: Sequence[float],
    n_threads: int = 8,
    use_native: bool = True,
) -> list[np.ndarray]:
    """Parallel ingest preserving ``files`` order.

    When the native C++ ingest library is available (data/native_ingest.py)
    and the images are grayscale uint8, decode happens on PIL threads but the
    crop + Lanczos resize math runs as one native threaded batch call —
    bit-exact vs PIL (tests/test_native.py).
    """
    directory = Path(directory)
    from . import native_ingest

    def plan(h: int, w: int) -> tuple[tuple[int, int], tuple[int, int]]:
        """Reference crop/resize arithmetic from source dims
        (reference dataloader.py:218-237)."""
        ch = math.floor(h * crop[0])
        cw = math.floor(w * crop[1])
        return (ch, cw), (int((h - 2 * ch) * scale), int((w - 2 * cw) * scale))

    if use_native and native_ingest.decode_available():
        # FULL-native tier: header-only reads here, then ONE C call does
        # fopen + decode + crop + Lanczos resize across native threads —
        # Python never enters the pixel path (multi-chip ingest scale-out;
        # the reference forks 24 PIL processes instead, dataloader.py:135-172)
        hdr = []
        for f in files:
            with Image.open(directory / f) as im:
                hdr.append((im.height, im.width))
        plans = [plan(h, w) for h, w in hdr]
        out = native_ingest.ingest_files(
            [directory / f for f in files], hdr,
            [p[0] for p in plans], [p[1] for p in plans], n_threads,
        )
        if out is not None:
            return out
        # any unsupported file (color, 16-bit, exotic container) falls the
        # whole batch back to PIL below — format zoo stays supported

    if use_native and native_ingest.available():
        with ThreadPoolExecutor(max_workers=max(1, n_threads)) as pool:
            decoded = list(pool.map(lambda f: np.asarray(Image.open(directory / f)), files))
        if all(d.dtype == np.uint8 and d.ndim == 2 for d in decoded):
            crops, outs = [], []
            for d in decoded:
                (ch, cw), o = plan(d.shape[0], d.shape[1])
                crops.append((ch, cw))
                outs.append(o)
            return native_ingest.crop_resize_batch(decoded, crops, outs, n_threads)

    with ThreadPoolExecutor(max_workers=max(1, n_threads)) as pool:
        return list(pool.map(lambda f: load_one(directory / f, scale, crop), files))


def canvas_bucket(
    hw_list: Sequence[tuple[int, int]], round_to: int = 64
) -> tuple[int, int]:
    """The shape bucket for a set of (h, w) sizes: max per side, rounded up
    to ``round_to``. THE single definition of the bucketing rule — the
    engine's compile-signature prediction (prewarm) and the streamed ingest
    path derive canvases from image headers with this same function, so
    predicted and actual jit signatures cannot drift."""
    return (
        -(-max(h for h, _ in hw_list) // round_to) * round_to,
        -(-max(w for _, w in hw_list) // round_to) * round_to,
    )


def pack_canvas(
    images: Sequence[np.ndarray], canvas_hw: tuple[int, int] | None = None,
    round_to: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad images onto one canvas -> (batch u8, valid (B,2) int32).

    The canvas is the shape bucket that lets one XLA compilation serve the
    whole cluster (SURVEY.md section 7 design stance). Canvas sides round up
    to ``round_to`` so different clusters / the gallery land on the SAME
    bucket far more often — every extraction compile through the axon AOT
    service costs minutes, and masked extraction makes padding free
    (batched == native-shape extraction is proven in test_models.py).
    """
    if canvas_hw is None:
        canvas_hw = canvas_bucket([im.shape[:2] for im in images], round_to)
    extra = images[0].shape[2:]  # () for gray, (3,) for RGB
    batch = np.zeros((len(images), *canvas_hw, *extra), np.uint8)
    valid = np.zeros((len(images), 2), np.int32)
    for i, im in enumerate(images):
        batch[i, : im.shape[0], : im.shape[1]] = im
        valid[i] = im.shape[:2]
    return batch, valid

"""CLAHE vs OpenCV oracle (reference network.py:108-111, 197-208).

The grayscale path must be bit-exact vs cv2 — CLAHE feeds the CNN, and the
SURVEY hard-parts list (section 7) flags mismatched tile/border conventions
as a rankings risk.
"""

import cv2
import numpy as np
import pytest

from shoeprint_image_retrieval_tpu.ops.clahe import clahe_image, clahe_u8


@pytest.mark.parametrize("shape", [(64, 64), (50, 70), (37, 53), (8, 8), (100, 33)])
@pytest.mark.parametrize("clip", [2.0, 4.0, 40.0])
def test_grayscale_bit_exact_vs_cv2(shape, clip):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(img)
    got = np.asarray(clahe_u8(img, clip_limit=clip, tile_grid_size=(8, 8)))
    np.testing.assert_array_equal(got, ref)


def test_structured_image_bit_exact():
    """Low-entropy image (big flat areas + gradient) — stresses clip paths."""
    y, x = np.mgrid[0:60, 0:80]
    img = ((x + y) % 256).astype(np.uint8)
    img[10:30, 10:40] = 200  # flat block -> heavy clipping in those tiles
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    got = np.asarray(clahe_u8(img))
    np.testing.assert_array_equal(got, ref)


def test_nondefault_tile_grid():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(45, 61), dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(4, 6)).apply(img)
    got = np.asarray(clahe_u8(img, clip_limit=3.0, tile_grid_size=(4, 6)))
    np.testing.assert_array_equal(got, ref)


def test_batched_matches_loop():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(3, 40, 40), dtype=np.uint8)
    got = np.asarray(clahe_u8(imgs))
    for i in range(3):
        np.testing.assert_array_equal(got[i], np.asarray(clahe_u8(imgs[i])))


def test_rgb_path_close_to_cv2():
    """RGB goes via LAB; OpenCV uses fixed-point LAB tables so we assert
    closeness, not equality (datasets are grayscale; documented divergence)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    l_ch, a_ch, b_ch = cv2.split(lab)
    l_eq = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(l_ch)
    ref = cv2.cvtColor(cv2.merge((l_eq, a_ch, b_ch)), cv2.COLOR_LAB2RGB)
    got = np.asarray(clahe_image(img))
    assert got.shape == ref.shape
    diff = np.abs(got.astype(int) - ref.astype(int))
    # Our float LAB is within +-1 of cv2's fixed-point tables, but CLAHE's
    # LUT slope amplifies that on a small tail of pixels. Grayscale (the
    # datasets' actual format) is bit-exact; RGB is documented as close.
    assert np.mean(diff) < 3.0
    assert np.median(diff) <= 1.0


def test_batched_dynamic_matches_cv2_per_image():
    """One compiled CLAHE serves every image size in a cluster, bit-exact."""
    import jax.numpy as jnp

    from shoeprint_image_retrieval_tpu.ops.clahe import clahe_batched_dynamic

    rng = np.random.default_rng(4)
    sizes = [(60, 80), (50, 70), (64, 64), (33, 47)]
    canvas = np.zeros((len(sizes), 64, 80), np.uint8)
    valid = np.zeros((len(sizes), 2), np.int32)
    for i, (h, w) in enumerate(sizes):
        canvas[i, :h, :w] = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        valid[i] = (h, w)
    got = np.asarray(clahe_batched_dynamic(jnp.asarray(canvas), jnp.asarray(valid)))
    for i, (h, w) in enumerate(sizes):
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(canvas[i, :h, :w])
        np.testing.assert_array_equal(got[i, :h, :w], ref)
        assert (got[i, h:, :] == 0).all() and (got[i, :, w:] == 0).all()

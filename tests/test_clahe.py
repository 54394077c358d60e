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


def test_rgb_to_lab_bit_exact_vs_cv2():
    """Our LAB reproduces cv2's 8-bit fixed-point RGB2Lab_b exactly
    (exhaustively verified over all 2^24 inputs offline; sampled here)."""
    from shoeprint_image_retrieval_tpu.ops.clahe import rgb_to_lab_u8

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(rgb_to_lab_u8(img)), cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    )
    # boundary-heavy structured sweep: all (r, g) pairs at fixed b
    rr, gg = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    img = np.stack([rr, gg, np.full_like(rr, 91)], -1).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(rgb_to_lab_u8(img)), cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    )


def test_lab_to_rgb_bit_exact_vs_cv2():
    """Our inverse reproduces cv2's Lab2RGBinteger exactly (exhaustively
    verified over all 2^24 inputs offline; sampled here)."""
    from shoeprint_image_retrieval_tpu.ops.clahe import lab_u8_to_rgb

    rng = np.random.default_rng(6)
    lab = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(lab_u8_to_rgb(lab)), cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    )
    ll, aa = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    lab = np.stack([ll, aa, np.full_like(ll, 61)], -1).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(lab_u8_to_rgb(lab)), cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    )


def test_rgb_path_bit_exact_vs_cv2():
    """Full RGB CLAHE path (LAB roundtrip + L-channel CLAHE) == cv2's,
    reproducing the reference's _clahe RGB branch (network.py:199-206)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    l_ch, a_ch, b_ch = cv2.split(lab)
    l_eq = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(l_ch)
    ref = cv2.cvtColor(cv2.merge((l_eq, a_ch, b_ch)), cv2.COLOR_LAB2RGB)
    got = np.asarray(clahe_image(img))
    np.testing.assert_array_equal(got, ref)


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

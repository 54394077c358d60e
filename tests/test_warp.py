"""PIL-exactness tests for the transform-sweep ops (reference similarity.py:264-274).

The reference's variant sweep calls PIL per channel: ``rotate(deg)``
(NEAREST/same-canvas/0-fill) and ``resize`` (BICUBIC). Rankings can only be
reproduced if our gather/matmul versions match PIL, so these tests assert
*exact* pixel equality for rotation plans and tight float tolerance for
resampling (PIL accumulates in C doubles; we matmul in f32).
"""

import numpy as np
import pytest
from PIL import Image

from shoeprint_image_retrieval_tpu.ops.warp import (
    apply_index_map,
    apply_separable_resample,
    pil_resize_size,
    resample_weights,
    rotate_index_map,
)

RUN_TOML_ROTATIONS = [-15, -9, -3, 3, 9, 15, 180]


@pytest.mark.parametrize("deg", RUN_TOML_ROTATIONS + [0, 90, 270, 45.5, 359])
@pytest.mark.parametrize("hw", [(13, 17), (16, 16), (9, 24)])
def test_rotate_matches_pil_exactly(deg, hw):
    rng = np.random.default_rng(7)
    img = rng.normal(size=hw).astype(np.float32)
    want = np.asarray(Image.fromarray(img).rotate(deg))

    idx, valid = rotate_index_map(hw, deg)
    got = np.asarray(apply_index_map(np.asarray(img)[None], idx, valid))[0]
    np.testing.assert_array_equal(got, want)


def test_rotate_on_padded_canvas():
    rng = np.random.default_rng(8)
    img = rng.normal(size=(10, 12)).astype(np.float32)
    want = np.asarray(Image.fromarray(img).rotate(9))
    canvas = np.zeros((16, 16), np.float32)
    canvas[:10, :12] = img
    idx, valid = rotate_index_map((10, 12), 9, canvas_hw=(16, 16))
    got = np.asarray(apply_index_map(canvas[None], idx, valid))[0]
    np.testing.assert_array_equal(got[:10, :12], want)
    assert (got[10:, :] == 0).all() and (got[:, 12:] == 0).all()


@pytest.mark.parametrize("scale", [1.02, 1.04, 1.08, 0.8, 1.5, 2.0])
@pytest.mark.parametrize("hw", [(11, 15), (20, 20)])
def test_bicubic_resize_matches_pil(scale, hw):
    rng = np.random.default_rng(9)
    img = rng.normal(size=hw).astype(np.float32)
    oh, ow = pil_resize_size(hw, scale)
    want = np.asarray(Image.fromarray(img).resize((ow, oh)))  # default BICUBIC

    wv = resample_weights(hw[0], oh, "bicubic")
    wh = resample_weights(hw[1], ow, "bicubic")
    got = np.asarray(apply_separable_resample(np.asarray(img)[None], wv, wh))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("in_out", [(200, 73), (50, 100), (37, 37), (64, 48)])
def test_lanczos_resize_matches_pil(in_out):
    """Lanczos3 is the dataloader's image-resize filter (reference
    dataloader.py:234-237)."""
    n_in, n_out = in_out
    rng = np.random.default_rng(10)
    img = rng.normal(size=(n_in, 24)).astype(np.float32)
    want = np.asarray(
        Image.fromarray(img).resize((24, n_out), Image.Resampling.LANCZOS)
    )
    wv = resample_weights(n_in, n_out, "lanczos")
    wh = resample_weights(24, 24, "lanczos")
    got = np.asarray(apply_separable_resample(np.asarray(img)[None], wv, wh))[0]
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_resize_weights_padded_compose_exactly():
    rng = np.random.default_rng(11)
    img = rng.normal(size=(10, 14)).astype(np.float32)
    oh, ow = pil_resize_size((10, 14), 1.08)
    plain_v = resample_weights(10, oh)
    plain_h = resample_weights(14, ow)
    pad_v = resample_weights(10, oh, canvas_in=16, canvas_out=20)
    pad_h = resample_weights(14, ow, canvas_in=18, canvas_out=22)
    canvas = np.zeros((1, 16, 18), np.float32)
    canvas[0, :10, :14] = img
    got_pad = np.asarray(apply_separable_resample(canvas, pad_v, pad_h))
    got = np.asarray(apply_separable_resample(img[None], plain_v, plain_h))
    # mathematically exact; tiny fp drift allowed for XLA accumulation order
    np.testing.assert_allclose(got_pad[0, :oh, :ow], got[0], rtol=1e-6, atol=1e-6)
    assert (got_pad[0, oh:, :] == 0).all() and (got_pad[0, :, ow:] == 0).all()

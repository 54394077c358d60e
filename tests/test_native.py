"""Native C++ ingest vs PIL: bit-exactness of the crop + Lanczos3 path.

The reference does this per image inside forked Python workers with PIL
(reference dataloader.py:212-237); the native library must reproduce PIL's
8-bit fixed-point two-pass resampling exactly.
"""

import math

import numpy as np
import pytest
from PIL import Image

from shoeprint_image_retrieval_tpu.data import native_ingest

pytestmark = pytest.mark.skipif(
    not native_ingest.available(), reason="no g++ / native build failed"
)


def _pil_reference(img, crop_ratio, scale):
    im = Image.fromarray(img)
    ch = math.floor(im.height * crop_ratio[0])
    cw = math.floor(im.width * crop_ratio[1])
    im = im.crop((cw, ch, im.width - cw, im.height - ch))
    out = im.resize((int(im.width * scale), int(im.height * scale)),
                    Image.Resampling.LANCZOS)
    return np.asarray(out), (ch, cw)


@pytest.mark.parametrize("scale", [0.37, 0.5, 0.93, 1.0, 1.3])
@pytest.mark.parametrize("shape", [(120, 90), (77, 133), (64, 64)])
def test_crop_resize_bit_exact_vs_pil(shape, scale):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    crop_ratio = (0.1, 0.2)
    want, (ch, cw) = _pil_reference(img, crop_ratio, scale)

    got = native_ingest.crop_resize_batch(
        [img], [(ch, cw)], [want.shape], n_threads=1
    )[0]
    np.testing.assert_array_equal(got, want)


def test_batch_threads_match_pil():
    rng = np.random.default_rng(1)
    imgs, crops, outs, wants = [], [], [], []
    for _ in range(12):
        h, w = int(rng.integers(50, 140)), int(rng.integers(50, 140))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        scale = float(rng.uniform(0.4, 1.2))
        want, (ch, cw) = _pil_reference(img, (0.05, 0.1), scale)
        imgs.append(img)
        crops.append((ch, cw))
        outs.append(want.shape)
        wants.append(want)
    got = native_ingest.crop_resize_batch(imgs, crops, outs, n_threads=4)
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_loader_native_path_matches_pil_path(tmp_path):
    """load_images with and without the native fast path agree exactly."""
    from shoeprint_image_retrieval_tpu.data.loader import load_images

    rng = np.random.default_rng(2)
    for i in range(4):
        h, w = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        Image.fromarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)).save(
            tmp_path / f"{i}.png"
        )
    files = sorted(p.name for p in tmp_path.iterdir())
    a = load_images(tmp_path, files, 0.7, (0.1, 0.2), 2, use_native=True)
    b = load_images(tmp_path, files, 0.7, (0.1, 0.2), 2, use_native=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_native_clahe_bit_exact_vs_cv2():
    """C++ CLAHE == cv2.createCLAHE(...).apply on random sizes/clips/grids."""
    import cv2

    rng = np.random.default_rng(3)
    imgs, params, wants = [], [], []
    for _ in range(10):
        h, w = int(rng.integers(16, 300)), int(rng.integers(16, 300))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if rng.random() < 0.4:
            img[: h // 2, : w // 2] = 200  # flat block -> heavy clipping
        clip = float(rng.choice([1.0, 2.0, 4.0, 40.0]))
        tx, ty = int(rng.integers(2, 10)), int(rng.integers(2, 10))
        imgs.append(img)
        params.append((clip, (tx, ty)))
        wants.append(
            cv2.createCLAHE(clipLimit=clip, tileGridSize=(tx, ty)).apply(img)
        )
    for img, (clip, grid), want in zip(imgs, params, wants):
        got = native_ingest.clahe_batch([img], clip, grid, n_threads=2)[0]
        np.testing.assert_array_equal(got, want)


def test_native_clahe_matches_device_kernel():
    """C++ CLAHE == the jnp device kernel (both are cv2-bit-exact, so the
    engine may substitute one for the other freely — tpu.clahe_host)."""
    from shoeprint_image_retrieval_tpu.ops.clahe import clahe_u8

    rng = np.random.default_rng(4)
    batch = [
        rng.integers(0, 256, size=(int(rng.integers(30, 90)), int(rng.integers(30, 90))),
                     dtype=np.uint8)
        for _ in range(6)
    ]
    got = native_ingest.clahe_batch(batch, 2.0, (8, 8), n_threads=3)
    for g, img in zip(got, batch):
        np.testing.assert_array_equal(g, np.asarray(clahe_u8(img, 2.0, (8, 8))))


def test_native_rgb_clahe_matches_cv2_and_jnp():
    """C++ RGB CLAHE (integer LAB both ways) == cv2 RGB->LAB->CLAHE(L)->RGB
    == the jnp path (ops/clahe.clahe_image) — reference network.py:199-206."""
    import cv2

    from shoeprint_image_retrieval_tpu.ops.clahe import clahe_image

    rng = np.random.default_rng(5)
    for _ in range(4):
        h, w = int(rng.integers(20, 120)), int(rng.integers(20, 120))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        clip = float(rng.choice([1.0, 2.0, 4.0]))
        tx, ty = int(rng.integers(2, 9)), int(rng.integers(2, 9))

        lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.createCLAHE(clipLimit=clip, tileGridSize=(tx, ty)).apply(
            lab[..., 0]
        )
        want = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)

        got = native_ingest.clahe_batch([img], clip, (tx, ty), n_threads=2)[0]
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            got, np.asarray(clahe_image(img, clip, (tx, ty)))
        )


def test_native_clahe_refuses_images_smaller_than_tile_grid():
    """Images below one pixel per tile would diverge from cv2 (multi-
    reflection); the wrapper refuses them (ADVICE r2: ingest.cc:155)."""
    img = np.zeros((5, 40), np.uint8)
    with pytest.raises(ValueError, match="tile grid"):
        native_ingest.clahe_batch([img], 2.0, (8, 8), n_threads=1)


def test_native_decode_ingest_bit_exact_vs_pil(tmp_path):
    """Full-native ingest tier (decode + crop + Lanczos in one C call,
    VERDICT r3 item 6): bit-exact vs PIL's decode -> crop -> resize for
    both PNG (lossless) and JPEG (PIL bundles the same libjpeg family the
    system library provides; equality is asserted, so a divergent system
    codec fails loudly here rather than silently shifting rankings)."""
    from PIL import Image

    from shoeprint_image_retrieval_tpu.data import native_ingest
    from shoeprint_image_retrieval_tpu.data.loader import load_images, load_one

    if not native_ingest.decode_available():
        pytest.skip("native codecs unavailable (no libjpeg/libpng)")

    rng = np.random.default_rng(11)
    files = []
    for i in range(6):
        h, w = int(rng.integers(50, 160)), int(rng.integers(50, 160))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        f = f"im{i}.png" if i % 2 == 0 else f"im{i}.jpg"
        Image.fromarray(img).save(tmp_path / f, quality=90)
        files.append(f)

    scale, crop = 0.73, (0.05, 0.08)
    native = load_images(tmp_path, files, scale, crop, 2, use_native=True)
    pil = [load_one(tmp_path / f, scale, crop) for f in files]
    for f, a, b in zip(files, native, pil):
        assert a.shape == b.shape, f
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_native_decode_falls_back_on_unsupported(tmp_path):
    """A batch containing any file the native decoder cannot handle (RGB,
    16-bit) falls back wholesale to PIL — format support never narrows."""
    from PIL import Image

    from shoeprint_image_retrieval_tpu.data import native_ingest
    from shoeprint_image_retrieval_tpu.data.loader import load_images

    if not native_ingest.decode_available():
        pytest.skip("native codecs unavailable")

    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 256, (60, 50), dtype=np.uint8)).save(
        tmp_path / "gray.png"
    )
    Image.fromarray(rng.integers(0, 256, (60, 50, 3), dtype=np.uint8)).save(
        tmp_path / "rgb.png"
    )
    out = load_images(tmp_path, ["gray.png", "rgb.png"], 1.0, (0.0, 0.0), 2)
    assert out[0].ndim == 2 and out[1].ndim == 3


def test_native_decode_rejects_sub8bit_png(tmp_path):
    """Sub-8-bit gray PNGs are UNSUPPORTED in the native decoder (ADVICE r4):
    libpng's 1/2/4-bit expansion bit-replicates to 0..255 while PIL decodes
    1-bit files to mode '1' (bool 0/1) — pixel data must not depend on which
    tier decoded the file, so such inputs always take the PIL-defined path."""
    from PIL import Image

    from shoeprint_image_retrieval_tpu.data import native_ingest
    from shoeprint_image_retrieval_tpu.data.loader import load_images, load_one

    if not native_ingest.decode_available():
        pytest.skip("native codecs unavailable")

    rng = np.random.default_rng(7)
    bits = (rng.integers(0, 2, (40, 40)) * 255).astype(np.uint8)
    Image.fromarray(bits).convert("1").save(tmp_path / "onebit.png")

    # the native tier must refuse (None), routing through PIL
    assert native_ingest.ingest_files(
        [str(tmp_path / "onebit.png")], [(40, 40)], [(0, 0)], [(40, 40)], 1
    ) is None
    out = load_images(tmp_path, ["onebit.png"], 1.0, (0.0, 0.0), 1)
    ref = load_one(tmp_path / "onebit.png", 1.0, (0.0, 0.0))
    np.testing.assert_array_equal(out[0], ref)


def test_decode_self_check_gates_native_tier(monkeypatch):
    """decode_available() runs a one-time decoder parity probe (ADVICE r4):
    a system libjpeg whose IDCT disagrees with PIL's must disable the native
    decode tier wholesale rather than silently shifting pixel data."""
    from shoeprint_image_retrieval_tpu.data import native_ingest

    if not native_ingest.available():
        pytest.skip("native library unavailable")

    # the real self-check on this host must pass (bit-exact codecs)
    monkeypatch.setattr(native_ingest, "_decode_ok", None)
    lib_ok = native_ingest._load() is not None and bool(
        native_ingest._load().sir_has_codecs()
    )
    if lib_ok:
        assert native_ingest.decode_available() is True

    # a failing probe disables the tier (and ingest_files honors the gate)
    monkeypatch.setattr(native_ingest, "_decode_self_check", lambda lib: False)
    monkeypatch.setattr(native_ingest, "_decode_ok", None)
    assert native_ingest.decode_available() is False
    if lib_ok:
        assert native_ingest.ingest_files(
            ["/nonexistent.jpg"], [(8, 8)], [(0, 0)], [(8, 8)], 1
        ) is None

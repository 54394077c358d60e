"""CLAHE (contrast-limited adaptive histogram equalization) on TPU.

The reference preprocesses every image with OpenCV's CLAHE before the CNN
(reference network.py:108-111, 197-208: ``cv2.createCLAHE(clipLimit,
tileGridSize)``; grayscale images use ``clahe.apply`` directly, RGB goes
through LAB). Replicated here as a jitted jnp pipeline so preprocessing can
run batched on device instead of per-image on the host.

Algorithm (matching OpenCV's implementation, validated bit-exact against
cv2 in tests/test_clahe.py for the grayscale path):

1. extend the image to a multiple of the tile grid with reflect-101 border;
2. 256-bin histogram per tile (computed as a one-hot sum — a matmul-shaped
   reduction XLA maps well);
3. clip each bin at ``max(1, int(clip_limit * tile_area / 256))``, spread the
   clipped excess evenly (integer batch + the first ``excess % 256`` bins at
   stride ``max(256 // residual, 1)`` get one extra);
4. LUT per tile: ``round_half_even(cumsum(hist) * 255 / tile_area)`` in f32;
5. per-pixel bilinear interpolation between the four neighboring tile LUTs
   at the pixel's own intensity, rounded half-to-even.

The RGB path converts to LAB with OpenCV's own 8-bit fixed-point integer
algorithms (reproduced below, verified equal to cv2 over every 2^24 input),
applies CLAHE to L, converts back — so RGB inputs are bit-exact too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to_tiles(img: jnp.ndarray, tiles_y: int, tiles_x: int):
    """Reflect-101 extension replicating OpenCV's border computation.

    OpenCV quirk (replicated deliberately): when the size is not exactly
    divisible on *both* axes it pads every axis by ``tiles - size % tiles``
    with no zero guard — so an axis that DOES divide evenly still receives a
    full extra tile of reflected padding, enlarging its tile size by one.
    Only a fully divisible image skips padding. Verified bit-exact vs cv2.
    """
    h, w = img.shape[-2], img.shape[-1]
    if h % tiles_y == 0 and w % tiles_x == 0:
        return img, h // tiles_y, w // tiles_x
    pad_h = tiles_y - (h % tiles_y)
    pad_w = tiles_x - (w % tiles_x)
    pads = [(0, 0)] * (img.ndim - 2) + [(0, pad_h), (0, pad_w)]
    return jnp.pad(img, pads, mode="reflect"), (h + pad_h) // tiles_y, (w + pad_w) // tiles_x


def _tile_histograms(ext: jnp.ndarray, tiles_y: int, tiles_x: int, th: int, tw: int):
    """(..., tilesY, tilesX, 256) int32 histograms via one-hot reduction."""
    t = ext.reshape(*ext.shape[:-2], tiles_y, th, tiles_x, tw)
    t = jnp.swapaxes(t, -3, -2)  # (..., tilesY, tilesX, th, tw)
    onehot = jax.nn.one_hot(t.astype(jnp.int32), 256, dtype=jnp.int32)
    return onehot.sum(axis=(-3, -2))


def _clip_redistribute(hist: jnp.ndarray, clip_limit: int):
    """OpenCV clip + excess redistribution, fully vectorized over tiles."""
    clipped = jnp.minimum(hist, clip_limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    batch = excess // 256
    residual = excess - batch * 256  # in [0, 255]
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bins = jnp.arange(256)
    bump = (bins % step == 0) & (bins // step < residual)
    return clipped + batch + bump.astype(jnp.int32)


def _build_luts(hist: jnp.ndarray, tile_area: int):
    scale = jnp.float32(255.0 / tile_area)
    cums = jnp.cumsum(hist, axis=-1).astype(jnp.float32)
    return jnp.clip(jnp.round(cums * scale), 0, 255)


def clahe_u8(
    img: jnp.ndarray,
    clip_limit: float = 2.0,
    tile_grid_size: tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """CLAHE for a (H, W) or (B, H, W) uint8 image. Returns uint8."""
    tiles_x, tiles_y = tile_grid_size  # cv2 takes (width, height)
    ext, th, tw = _pad_to_tiles(img, tiles_y, tiles_x)
    tile_area = th * tw
    clip = max(int(clip_limit * tile_area / 256.0), 1)

    hist = _tile_histograms(ext, tiles_y, tiles_x, th, tw)
    hist = _clip_redistribute(hist, clip)
    luts = _build_luts(hist, tile_area)  # (..., tilesY, tilesX, 256) f32

    h, w = img.shape[-2], img.shape[-1]
    txf = jnp.arange(w, dtype=jnp.float32) * jnp.float32(1.0 / tw) - 0.5
    tyf = jnp.arange(h, dtype=jnp.float32) * jnp.float32(1.0 / th) - 0.5
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    xa = txf - tx1
    ya = tyf - ty1
    tx1c = jnp.clip(tx1, 0, tiles_x - 1)
    tx2c = jnp.clip(tx1 + 1, 0, tiles_x - 1)
    ty1c = jnp.clip(ty1, 0, tiles_y - 1)
    ty2c = jnp.clip(ty1 + 1, 0, tiles_y - 1)

    v = img.astype(jnp.int32)

    def lut_at(tyi, txi):
        # (..., H, W) gather: LUT of tile (tyi[y], txi[x]) at value v[..., y, x]
        t = luts[..., tyi, :, :][..., :, txi, :]  # (..., H, W, 256)
        return jnp.take_along_axis(t, v[..., None], axis=-1)[..., 0]

    ya1 = (1.0 - ya)[:, None]
    yaw = ya[:, None]
    res = (
        (lut_at(ty1c, tx1c) * (1.0 - xa) + lut_at(ty1c, tx2c) * xa) * ya1
        + (lut_at(ty2c, tx1c) * (1.0 - xa) + lut_at(ty2c, tx2c) * xa) * yaw
    )
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)


def clahe_batched_dynamic(
    imgs: jnp.ndarray,
    valid_hw: jnp.ndarray,
    clip_limit: float = 2.0,
    tile_grid_size: tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """CLAHE over a padded batch with *per-sample* image sizes.

    The batched-extraction pipeline pads every image of a cluster onto one
    canvas; CLAHE's tile geometry, clip limit and LUT scale all depend on the
    *native* size, so they are computed here from traced per-sample
    ``valid_hw`` — one XLA compilation serves every image size in a cluster.
    Produces the same result as :func:`clahe_u8` on each native-size image
    (OpenCV-bit-exact), with zeros outside each valid region.

    Args:
        imgs: ``(B, Hc, Wc)`` uint8, anything beyond valid is ignored.
        valid_hw: ``(B, 2)`` int32 native sizes.
    """
    tiles_x, tiles_y = tile_grid_size
    b, hc, wc = imgs.shape
    he, we = hc + tiles_y, wc + tiles_x  # extended canvas upper bound

    h = valid_hw[:, 0][:, None, None]
    w = valid_hw[:, 1][:, None, None]
    divisible = (valid_hw[:, 0] % tiles_y == 0) & (valid_hw[:, 1] % tiles_x == 0)
    pad_h = jnp.where(divisible, 0, tiles_y - valid_hw[:, 0] % tiles_y)
    pad_w = jnp.where(divisible, 0, tiles_x - valid_hw[:, 1] % tiles_x)
    eh = (valid_hw[:, 0] + pad_h)[:, None, None]  # extended sizes
    ew = (valid_hw[:, 1] + pad_w)[:, None, None]
    th = (eh // tiles_y).astype(jnp.int32)
    tw = (ew // tiles_x).astype(jnp.int32)
    area = (th * tw).astype(jnp.float32)
    clip = jnp.maximum(
        jnp.floor(clip_limit * area / 256.0).astype(jnp.int32), 1
    )  # (B,1,1)

    # Build the reflect-101-extended image by gathering source coordinates.
    ys = jnp.arange(he)[None, :, None]
    xs = jnp.arange(we)[None, None, :]
    ry = jnp.where(ys < h, ys, 2 * (h - 1) - ys)
    rx = jnp.where(xs < w, xs, 2 * (w - 1) - xs)
    ry = jnp.clip(ry, 0, hc - 1).astype(jnp.int32)
    rx = jnp.clip(rx, 0, wc - 1).astype(jnp.int32)
    rows = jnp.take_along_axis(imgs, jnp.broadcast_to(ry, (b, he, wc)), axis=1)
    ext = jnp.take_along_axis(rows, jnp.broadcast_to(rx, (b, he, we)), axis=2)

    # Per-sample histograms: segment-sum into (tilesY*tilesX*256,) bins.
    ty = jnp.minimum(ys // th, tiles_y - 1)
    tx = jnp.minimum(xs // tw, tiles_x - 1)
    in_ext = (ys < eh) & (xs < ew)
    n_seg = tiles_y * tiles_x * 256
    seg = (ty * tiles_x + tx) * 256 + ext.astype(jnp.int32)
    seg = jnp.where(in_ext, seg, n_seg)  # out-of-range -> dropped

    def one_hist(s):
        return jax.ops.segment_sum(
            jnp.ones_like(s.reshape(-1), jnp.int32),
            s.reshape(-1),
            num_segments=n_seg + 1,
        )[:-1]

    hist = jax.vmap(one_hist)(seg).reshape(b, tiles_y, tiles_x, 256)

    hist = _clip_redistribute(hist, clip[..., None])
    scale = (255.0 / area)[..., None]  # (B,1,1,1)
    luts = jnp.clip(jnp.round(jnp.cumsum(hist, axis=-1).astype(jnp.float32) * scale), 0, 255)

    # Bilinear LUT interpolation at native coordinates.
    yy = jnp.arange(hc)[None, :, None].astype(jnp.float32)
    xx = jnp.arange(wc)[None, None, :].astype(jnp.float32)
    tyf = yy * (1.0 / th.astype(jnp.float32)) - 0.5
    txf = xx * (1.0 / tw.astype(jnp.float32)) - 0.5
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = tyf - ty1
    xa = txf - tx1
    ty1c = jnp.clip(ty1, 0, tiles_y - 1)
    ty2c = jnp.clip(ty1 + 1, 0, tiles_y - 1)
    tx1c = jnp.clip(tx1, 0, tiles_x - 1)
    tx2c = jnp.clip(tx1 + 1, 0, tiles_x - 1)

    v = imgs.astype(jnp.int32)
    flat_luts = luts.reshape(b, tiles_y * tiles_x * 256)

    def lut_at(tyi, txi):
        idx = (tyi * tiles_x + txi) * 256 + v
        return jnp.take_along_axis(flat_luts, idx.reshape(b, -1), axis=1).reshape(b, hc, wc)

    res = (
        (lut_at(ty1c, tx1c) * (1.0 - xa) + lut_at(ty1c, tx2c) * xa) * (1.0 - ya)
        + (lut_at(ty2c, tx1c) * (1.0 - xa) + lut_at(ty2c, tx2c) * xa) * ya
    )
    out = jnp.clip(jnp.round(res), 0, 255)
    in_valid = (jnp.arange(hc)[None, :, None] < h) & (jnp.arange(wc)[None, None, :] < w)
    return jnp.where(in_valid, out, 0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# RGB <-> LAB, bit-exact vs OpenCV's 8-bit fixed-point paths (for the
# reference's RGB branch, network.py:199-206). OpenCV converts 8U images with
# integer table arithmetic (color_lab.cpp RGB2Lab_b / Lab2RGBinteger), NOT the
# float CIE formulas — both directions below reproduce those integer
# algorithms and were verified equal to cv2 over ALL 2^24 inputs
# (tests/test_clahe.py spot-checks; the exhaustive sweep was run offline).
# ---------------------------------------------------------------------------

_LAB_SHIFT = 12          # xyz fixed-point shift
_GAMMA_SHIFT = 3
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT
_LAB_BASE = 1 << 14      # Lab2RGBinteger BASE
_LAB_MIN_AB = -8145      # abToXZ table origin
_INV_GAMMA_SIZE = 1 << 12
_D65 = (0.950456, 1.0, 1.088754)
_SRGB2XYZ = (0.412453, 0.357580, 0.180423,
             0.212671, 0.715160, 0.072169,
             0.019334, 0.119193, 0.950227)
_XYZ2SRGB = (3.240479, -1.537150, -0.498535,
             -0.969256, 1.875992, 0.041556,
             0.055648, -0.204043, 1.057311)


def _cvround(x):
    import numpy as np

    return np.rint(x).astype(np.int64)


def _descale(x, n: int):
    return (x + (1 << (n - 1))) >> n


@functools.lru_cache(maxsize=1)
def _rgb2lab_tables():
    """OpenCV RGB2Lab_b tables: sRGB gamma (x8 fixed point), cbrt, coeffs.

    Entries 49/628 of the cbrt table are nudged to match cv2's softfloat
    table generation (f64 rounding lands on the other side of the half).
    """
    import numpy as np

    i = np.arange(256) / 255.0
    g = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma_tab = _cvround(255 * (1 << _GAMMA_SHIFT) * g)

    n = 256 * 3 // 2 * (1 << _GAMMA_SHIFT)
    xi = np.arange(n, dtype=np.float64) / (255.0 * (1 << _GAMMA_SHIFT))
    f = np.where(xi < 216.0 / 24389.0, xi * (841.0 / 108.0) + 16.0 / 116.0,
                 np.cbrt(xi))
    cbrt_tab = _cvround((1 << _LAB_SHIFT2) * f)
    cbrt_tab[49] -= 1
    cbrt_tab[628] += 1

    coeffs = np.array(
        [_cvround(np.float64(1 << _LAB_SHIFT) * _SRGB2XYZ[r * 3 + c] / _D65[r])
         for r in range(3) for c in range(3)]
    )
    return gamma_tab, cbrt_tab, coeffs


@functools.lru_cache(maxsize=1)
def _lab2rgb_tables():
    """OpenCV Lab2RGBinteger tables: L->(y, ify), ab->xz, coeffs, inv gamma."""
    import numpy as np

    base = _LAB_BASE
    y_tab = np.zeros(256, np.int64)
    ify_tab = np.zeros(256, np.int64)
    for i in range(256):
        if i <= 20:  # L*100/255 <= 8: the CIE linear region
            y_tab[i] = round(i * base * 100 / 903.3 / 255)
            ify_tab[i] = round(base * (7.787 * (i * 100 / 903.3 / 255) + 16 / 116))
        else:
            fy = (i * 100 / 255 + 16) / 116
            ify_tab[i] = round(base * fy)
            y_tab[i] = round(base * fy**3)

    n_t = base * 9 // 4
    idx = np.arange(_LAB_MIN_AB, _LAB_MIN_AB + n_t, dtype=np.int64)

    def cdiv(a, b):  # C integer division (truncates toward zero)
        q = np.abs(a) // b
        return np.where(a < 0, -q, q)

    lin = cdiv(idx * 108, 841) - ((base * 16 // 116) * 108 // 841)
    cube = cdiv(cdiv(idx * idx, base) * idx, base)
    ab_tab = np.where(idx <= 3390, lin, cube)  # 3390 ~ BASE*6/29

    coeffs = np.array(
        [_cvround(np.float64(1 << _LAB_SHIFT) * _XYZ2SRGB[r * 3 + c] * _D65[c])
         for r in range(3) for c in range(3)]
    )
    u = np.arange(_INV_GAMMA_SIZE, dtype=np.float64) / _INV_GAMMA_SIZE
    ginv = np.where(u <= 0.0031308, 12.92 * u,
                    1.055 * np.maximum(u, 0) ** (1 / 2.4) - 0.055)
    inv_gamma_tab = np.clip(_cvround(255.0 * ginv), 0, 255)
    return y_tab, ify_tab, ab_tab, coeffs, inv_gamma_tab


def rgb_to_lab_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> LAB exactly as ``cv2.cvtColor(..., COLOR_RGB2LAB)``.

    Integer algorithm of OpenCV's RGB2Lab_b: gamma-expand through a
    256-entry x2040 table, XYZ at 2^12 fixed point (coefficients folded with
    the D65 whitepoint), f(t) through a 3072-entry cbrt table at 2^15, then
    L/a/b by integer descale. int32 throughout (products fit: 2040*4433*3).
    """
    gamma_tab, cbrt_tab, coeffs = _rgb2lab_tables()
    gt = jnp.asarray(gamma_tab, jnp.int32)
    ct = jnp.asarray(cbrt_tab, jnp.int32)
    c = [int(v) for v in coeffs]

    rgbi = rgb.astype(jnp.int32)
    r = jnp.take(gt, rgbi[..., 0])
    g = jnp.take(gt, rgbi[..., 1])
    b = jnp.take(gt, rgbi[..., 2])
    fx = jnp.take(ct, _descale(r * c[0] + g * c[1] + b * c[2], _LAB_SHIFT))
    fy = jnp.take(ct, _descale(r * c[3] + g * c[4] + b * c[5], _LAB_SHIFT))
    fz = jnp.take(ct, _descale(r * c[6] + g * c[7] + b * c[8], _LAB_SHIFT))
    l_scale = (116 * 255 + 50) // 100
    l_shift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    l_val = _descale(l_scale * fy + l_shift, _LAB_SHIFT2)
    a_val = _descale(500 * (fx - fy) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    b_val = _descale(200 * (fy - fz) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    lab = jnp.stack([l_val, a_val, b_val], axis=-1)
    return jnp.clip(lab, 0, 255).astype(jnp.uint8)


def lab_u8_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """uint8 LAB -> RGB exactly as ``cv2.cvtColor(..., COLOR_LAB2RGB)``.

    Integer algorithm of OpenCV's Lab2RGBinteger: L through a 256-entry
    (y, ify) table at 2^14, a/b folded into ifx/ifz by fixed-point
    multiplies, x/z through the integer-division abToXZ table, 3x3 integer
    matrix (coefficients folded with D65) descaled to a 4096-entry inverse
    sRGB gamma table. int32 suffices: |coeff*xyz| < 2^27.
    """
    y_tab, ify_tab, ab_tab, coeffs, inv_gamma_tab = _lab2rgb_tables()
    yt = jnp.asarray(y_tab, jnp.int32)
    ift = jnp.asarray(ify_tab, jnp.int32)
    abt = jnp.asarray(ab_tab, jnp.int32)
    igt = jnp.asarray(inv_gamma_tab, jnp.uint8)
    c = [int(v) for v in coeffs]
    base = _LAB_BASE
    n_t = base * 9 // 4

    li = lab[..., 0].astype(jnp.int32)
    ai = lab[..., 1].astype(jnp.int32)
    bi = lab[..., 2].astype(jnp.int32)
    y = jnp.take(yt, li)
    ify = jnp.take(ift, li)
    adiv = ((5 * ai * 53687 + (1 << 7)) >> 13) - 128 * base // 500
    bdiv = ((bi * 41943 + (1 << 4)) >> 9) - (128 * base // 200) + 1
    x = jnp.take(abt, jnp.clip(ify + adiv - _LAB_MIN_AB, 0, n_t - 1))
    z = jnp.take(abt, jnp.clip(ify - bdiv - _LAB_MIN_AB, 0, n_t - 1))
    shift = _LAB_SHIFT + 2  # descale from 2^26 to the 4096-entry gamma domain
    ro = jnp.clip(_descale(c[0] * x + c[1] * y + c[2] * z, shift), 0, _INV_GAMMA_SIZE - 1)
    go = jnp.clip(_descale(c[3] * x + c[4] * y + c[5] * z, shift), 0, _INV_GAMMA_SIZE - 1)
    bo = jnp.clip(_descale(c[6] * x + c[7] * y + c[8] * z, shift), 0, _INV_GAMMA_SIZE - 1)
    return jnp.stack(
        [jnp.take(igt, ro), jnp.take(igt, go), jnp.take(igt, bo)], axis=-1
    )


def clahe_image(
    img: jnp.ndarray,
    clip_limit: float = 2.0,
    tile_grid_size: tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """Reference `_clahe` semantics: grayscale direct, RGB via LAB L channel
    (reference network.py:197-208)."""
    if img.ndim == 2 or img.shape[-1] != 3:
        return clahe_u8(img, clip_limit, tile_grid_size)
    lab = rgb_to_lab_u8(img)
    l_eq = clahe_u8(lab[..., 0], clip_limit, tile_grid_size)
    lab = lab.at[..., 0].set(l_eq)
    return lab_u8_to_rgb(lab)

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

The RGB path converts to LAB (float math, D65 — OpenCV's 8-bit LAB uses
fixed-point tables, so RGB inputs are close-but-not-bit-exact; the
datasets' shoeprint scans are grayscale), applies CLAHE to L, converts back.
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
# RGB <-> LAB (float math; for the reference's RGB branch, network.py:199-206)
# ---------------------------------------------------------------------------

def _srgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    r = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = jnp.asarray(
        [[0.412453, 0.357580, 0.180423],
         [0.212671, 0.715160, 0.072169],
         [0.019334, 0.119193, 0.950227]], jnp.float32)
    return jnp.einsum("ij,...j->...i", m, r)


def rgb_to_lab_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB -> OpenCV-scaled LAB (L,a,b in [0,255] uint8 convention)."""
    xyz = _srgb_to_xyz(rgb.astype(jnp.float32) / 255.0)
    xn = xyz / jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    f = jnp.where(xn > 0.008856, jnp.cbrt(xn), 7.787 * xn + 16.0 / 116.0)
    l_val = jnp.where(xn[..., 1] > 0.008856,
                      116.0 * f[..., 1] - 16.0, 903.3 * xn[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1]) + 128.0
    b = 200.0 * (f[..., 1] - f[..., 2]) + 128.0
    lab = jnp.stack([l_val * 255.0 / 100.0, a, b], axis=-1)
    return jnp.clip(jnp.round(lab), 0, 255).astype(jnp.uint8)


def lab_u8_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    l_val = lab[..., 0].astype(jnp.float32) * 100.0 / 255.0
    a = lab[..., 1].astype(jnp.float32) - 128.0
    b = lab[..., 2].astype(jnp.float32) - 128.0
    fy = (l_val + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def inv_f(t):
        t3 = t * t * t
        return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    xyz = jnp.stack([inv_f(fx), inv_f(fy), inv_f(fz)], axis=-1)
    xyz = xyz * jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    m = jnp.asarray(
        [[3.240479, -1.537150, -0.498535],
         [-0.969256, 1.875992, 0.041556],
         [0.055648, -0.204043, 1.057311]], jnp.float32)
    lin = jnp.einsum("ij,...j->...i", m, xyz)
    srgb = jnp.where(lin > 0.0031308, 1.055 * lin ** (1 / 2.4) - 0.055, 12.92 * lin)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.uint8)


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

// Native host-ingest kernels: PIL-exact crop + Lanczos3 resize for uint8
// grayscale images, with a std::thread batch API.
//
// The reference's ingest forks Python processes that run PIL's C resampling
// per image (reference dataloader.py:115-253). This library provides the
// same per-image math — Pillow's two-pass (horizontal then vertical)
// separable resampling with its 8-bit fixed-point coefficient pipeline
// (PRECISION_BITS = 22, round-half-away normalization, clip8) and Lanczos3
// window — as a single shared object the Python loader calls via ctypes,
// so a whole cluster's ingest is one native batch call instead of a
// process pool. Bit-exactness vs PIL is asserted in tests/test_native.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libingest.so ingest.cc -lpthread

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's 8bpc fixed point

double lanczos3(double x) {
  auto sinc = [](double v) {
    if (v == 0.0) return 1.0;
    const double p = M_PI * v;
    return std::sin(p) / p;
  };
  if (x < -3.0 || x > 3.0) return 0.0;
  return sinc(x) * sinc(x / 3.0);
}

// Pillow precompute_coeffs: per output pixel, the support window
// [xmin, xmin+n) and normalized double taps.
int precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                      std::vector<double>& taps) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 3.0 * filterscale;
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.resize(2 * out_size);
  taps.resize(static_cast<size_t>(ksize) * out_size);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &taps[static_cast<size_t>(xx) * ksize];
    double total = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double w = lanczos3((x + xmin - center + 0.5) * ss);
      k[x] = w;
      total += w;
    }
    if (total != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= total;
    }
    for (int x = xmax; x < ksize; ++x) k[x] = 0.0;
    bounds[2 * xx] = xmin;
    bounds[2 * xx + 1] = xmax;
  }
  return ksize;
}

// Pillow normalize_coeffs_8bpc: round-half-away-from-zero to fixed point.
void fixed_coeffs(const std::vector<double>& taps, std::vector<int>& out) {
  out.resize(taps.size());
  for (size_t i = 0; i < taps.size(); ++i) {
    const double v = taps[i] * (1 << kPrecisionBits);
    out[i] = static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
  }
}

inline uint8_t clip8(int64_t v) {
  const int64_t shifted = v >> kPrecisionBits;
  if (shifted < 0) return 0;
  if (shifted > 255) return 255;
  return static_cast<uint8_t>(shifted);
}

// One image: crop box (floor ratios applied by the caller) then two-pass
// resize, horizontal first (Pillow's pass order), uint8 intermediate.
void resize_one(const uint8_t* src, int src_h, int src_w, int src_stride,
                uint8_t* dst, int dst_h, int dst_w) {
  std::vector<int> hb, vb;
  std::vector<double> hd, vd;
  const int hk = precompute_coeffs(src_w, dst_w, hb, hd);
  const int vk = precompute_coeffs(src_h, dst_h, vb, vd);
  std::vector<int> hc, vc;
  fixed_coeffs(hd, hc);
  fixed_coeffs(vd, vc);

  std::vector<uint8_t> temp(static_cast<size_t>(src_h) * dst_w);
  for (int y = 0; y < src_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * src_stride;
    uint8_t* trow = temp.data() + static_cast<size_t>(y) * dst_w;
    for (int xx = 0; xx < dst_w; ++xx) {
      const int xmin = hb[2 * xx], xmax = hb[2 * xx + 1];
      const int* k = &hc[static_cast<size_t>(xx) * hk];
      int64_t ss = 1 << (kPrecisionBits - 1);
      for (int x = 0; x < xmax; ++x) ss += static_cast<int64_t>(row[xmin + x]) * k[x];
      trow[xx] = clip8(ss);
    }
  }
  for (int yy = 0; yy < dst_h; ++yy) {
    const int ymin = vb[2 * yy], ymax = vb[2 * yy + 1];
    const int* k = &vc[static_cast<size_t>(yy) * vk];
    uint8_t* drow = dst + static_cast<size_t>(yy) * dst_w;
    for (int xx = 0; xx < dst_w; ++xx) {
      int64_t ss = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y)
        ss += static_cast<int64_t>(temp[static_cast<size_t>(ymin + y) * dst_w + xx]) * k[y];
      drow[xx] = clip8(ss);
    }
  }
}

// ---------------------------------------------------------------------------
// CLAHE (contrast-limited adaptive histogram equalization), OpenCV-exact.
//
// Same algorithm as ops/clahe.py (grayscale, bit-exact vs cv2 incl. the
// unguarded-border extension quirk): reflect-101 extension to the tile
// grid, per-tile 256-bin histogram, clip + excess redistribution, LUT =
// round-half-even(cumsum * 255/area), per-pixel bilinear interpolation of
// the four neighboring tile LUTs at the pixel's own intensity. Float math
// is float32 to mirror both cv2 and the jnp kernel; round-half-even via
// nearbyintf under the default FE_TONEAREST mode.
//
// Precondition for the cv2-bit-exactness claim: h >= tiles_y and
// w >= tiles_x (at least one pixel per tile). Below that the extension
// pad exceeds dim-1 and the single reflect-101 index below clamps to 0
// where cv2 multi-reflects; the Python wrapper (data/native_ingest.py)
// refuses such inputs and the engine routes them to the device kernel
// (which uses the same clamp, keeping both in-repo paths consistent).
// ---------------------------------------------------------------------------

void clahe_one(const uint8_t* src, int h, int w, float clip_limit,
               int tiles_y, int tiles_x, uint8_t* dst) {
  // OpenCV border quirk: any indivisible axis pads BOTH axes by
  // tiles - size % tiles (a fully divisible axis gets a whole extra tile).
  int pad_h = 0, pad_w = 0;
  if (h % tiles_y != 0 || w % tiles_x != 0) {
    pad_h = tiles_y - (h % tiles_y);
    pad_w = tiles_x - (w % tiles_x);
  }
  const int eh = h + pad_h, ew = w + pad_w;
  const int th = eh / tiles_y, tw = ew / tiles_x;
  const int area = th * tw;
  const int clip = std::max(1, static_cast<int>(clip_limit * area / 256.0));

  // per-tile histograms over the reflect-101-extended image
  std::vector<int> hist(static_cast<size_t>(tiles_y) * tiles_x * 256, 0);
  for (int y = 0; y < eh; ++y) {
    int ry = y < h ? y : 2 * (h - 1) - y;
    if (ry < 0) ry = 0;
    const uint8_t* row = src + static_cast<size_t>(ry) * w;
    const int ty = std::min(y / th, tiles_y - 1);
    int* hrow = hist.data() + static_cast<size_t>(ty) * tiles_x * 256;
    for (int x = 0; x < ew; ++x) {
      int rx = x < w ? x : 2 * (w - 1) - x;
      if (rx < 0) rx = 0;
      const int tx = std::min(x / tw, tiles_x - 1);
      ++hrow[tx * 256 + row[rx]];
    }
  }

  // clip + redistribute, then build LUTs (round half to even, as cv2)
  std::vector<uint8_t> luts(static_cast<size_t>(tiles_y) * tiles_x * 256);
  const float scale = 255.0f / static_cast<float>(area);
  for (int t = 0; t < tiles_y * tiles_x; ++t) {
    int* hh = hist.data() + static_cast<size_t>(t) * 256;
    int excess = 0;
    for (int v = 0; v < 256; ++v) {
      if (hh[v] > clip) {
        excess += hh[v] - clip;
        hh[v] = clip;
      }
    }
    const int batch = excess / 256;
    const int residual = excess - batch * 256;
    const int step = residual > 0 ? std::max(256 / residual, 1) : 256;
    for (int v = 0; v < 256; ++v) {
      hh[v] += batch;
      if (residual > 0 && v % step == 0 && v / step < residual) ++hh[v];
    }
    uint8_t* lut = luts.data() + static_cast<size_t>(t) * 256;
    int cum = 0;
    for (int v = 0; v < 256; ++v) {
      cum += hh[v];
      const float r = nearbyintf(static_cast<float>(cum) * scale);
      lut[v] = static_cast<uint8_t>(r < 0.0f ? 0.0f : (r > 255.0f ? 255.0f : r));
    }
  }

  // bilinear LUT interpolation at native coordinates (f32, as the jnp path)
  const float inv_th = 1.0f / static_cast<float>(th);
  const float inv_tw = 1.0f / static_cast<float>(tw);
  std::vector<int> tx1c(w), tx2c(w);
  std::vector<float> xa(w);
  for (int x = 0; x < w; ++x) {
    const float txf = static_cast<float>(x) * inv_tw - 0.5f;
    const int tx1 = static_cast<int>(std::floor(txf));
    xa[x] = txf - static_cast<float>(tx1);
    tx1c[x] = std::min(std::max(tx1, 0), tiles_x - 1);
    tx2c[x] = std::min(std::max(tx1 + 1, 0), tiles_x - 1);
  }
  for (int y = 0; y < h; ++y) {
    const float tyf = static_cast<float>(y) * inv_th - 0.5f;
    const int ty1 = static_cast<int>(std::floor(tyf));
    const float ya = tyf - static_cast<float>(ty1);
    const int ty1c = std::min(std::max(ty1, 0), tiles_y - 1);
    const int ty2c = std::min(std::max(ty1 + 1, 0), tiles_y - 1);
    const uint8_t* srow = src + static_cast<size_t>(y) * w;
    uint8_t* drow = dst + static_cast<size_t>(y) * w;
    const uint8_t* l1 = luts.data() + static_cast<size_t>(ty1c) * tiles_x * 256;
    const uint8_t* l2 = luts.data() + static_cast<size_t>(ty2c) * tiles_x * 256;
    for (int x = 0; x < w; ++x) {
      const int v = srow[x];
      const float top = static_cast<float>(l1[tx1c[x] * 256 + v]) * (1.0f - xa[x]) +
                        static_cast<float>(l1[tx2c[x] * 256 + v]) * xa[x];
      const float bot = static_cast<float>(l2[tx1c[x] * 256 + v]) * (1.0f - xa[x]) +
                        static_cast<float>(l2[tx2c[x] * 256 + v]) * xa[x];
      const float r = nearbyintf(top * (1.0f - ya) + bot * ya);
      drow[x] = static_cast<uint8_t>(r < 0.0f ? 0.0f : (r > 255.0f ? 255.0f : r));
    }
  }
}

// ---------------------------------------------------------------------------
// RGB <-> LAB, OpenCV 8-bit fixed-point integer algorithms (RGB2Lab_b /
// Lab2RGBinteger) — the same tables and arithmetic as ops/clahe.py's jnp
// port (verified equal to cv2 over all 2^24 inputs there); this native copy
// is validated against the jnp port in tests/test_native.py. Used for the
// reference's RGB branch (reference network.py:199-206: RGB -> LAB, CLAHE
// on L, LAB -> RGB).
// ---------------------------------------------------------------------------

constexpr int kLabShift = 12;
constexpr int kGammaShift = 3;
constexpr int kLabShift2 = kLabShift + kGammaShift;
constexpr int kLabBase = 1 << 14;
constexpr int kLabMinAb = -8145;
constexpr int kInvGammaSize = 1 << 12;
constexpr int kCbrtSize = 256 * 3 / 2 * (1 << kGammaShift);
constexpr int kAbSize = kLabBase * 9 / 4;

constexpr double kD65[3] = {0.950456, 1.0, 1.088754};
constexpr double kSRGB2XYZ[9] = {0.412453, 0.357580, 0.180423,
                                 0.212671, 0.715160, 0.072169,
                                 0.019334, 0.119193, 0.950227};
constexpr double kXYZ2SRGB[9] = {3.240479,  -1.537150, -0.498535,
                                 -0.969256, 1.875992,  0.041556,
                                 0.055648,  -0.204043, 1.057311};

struct LabTables {
  int32_t gamma_tab[256];
  int32_t cbrt_tab[kCbrtSize];
  int32_t fwd_coeffs[9];
  int32_t y_tab[256];
  int32_t ify_tab[256];
  std::vector<int32_t> ab_tab;  // kAbSize entries
  int32_t inv_coeffs[9];
  uint8_t inv_gamma_tab[kInvGammaSize];
};

// round half to even, matching np.rint / cv2's softfloat table generation
inline int64_t rint64(double x) { return static_cast<int64_t>(nearbyint(x)); }

const LabTables& lab_tables() {
  static LabTables t = [] {
    LabTables tt;
    tt.ab_tab.resize(kAbSize);
    for (int i = 0; i < 256; ++i) {
      const double v = i / 255.0;
      const double g =
          v <= 0.04045 ? v / 12.92 : std::pow((v + 0.055) / 1.055, 2.4);
      tt.gamma_tab[i] = static_cast<int32_t>(rint64(255.0 * (1 << kGammaShift) * g));
    }
    for (int i = 0; i < kCbrtSize; ++i) {
      const double x = i / (255.0 * (1 << kGammaShift));
      const double f = x < 216.0 / 24389.0 ? x * (841.0 / 108.0) + 16.0 / 116.0
                                           : std::cbrt(x);
      tt.cbrt_tab[i] = static_cast<int32_t>(rint64((1 << kLabShift2) * f));
    }
    // two entries where f64 rounding lands on the other side of the half
    // vs cv2's softfloat generation (same nudge as ops/clahe.py)
    tt.cbrt_tab[49] -= 1;
    tt.cbrt_tab[628] += 1;
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        tt.fwd_coeffs[r * 3 + c] = static_cast<int32_t>(
            rint64(double(1 << kLabShift) * kSRGB2XYZ[r * 3 + c] / kD65[r]));

    for (int i = 0; i < 256; ++i) {
      if (i <= 20) {  // L*100/255 <= 8: the CIE linear region
        tt.y_tab[i] = static_cast<int32_t>(rint64(i * double(kLabBase) * 100.0 / 903.3 / 255.0));
        tt.ify_tab[i] = static_cast<int32_t>(
            rint64(kLabBase * (7.787 * (i * 100.0 / 903.3 / 255.0) + 16.0 / 116.0)));
      } else {
        const double fy = (i * 100.0 / 255.0 + 16.0) / 116.0;
        tt.ify_tab[i] = static_cast<int32_t>(rint64(kLabBase * fy));
        tt.y_tab[i] = static_cast<int32_t>(rint64(kLabBase * fy * fy * fy));
      }
    }
    for (int j = 0; j < kAbSize; ++j) {
      const int64_t idx = kLabMinAb + j;  // C division truncates toward zero
      const int64_t lin =
          idx * 108 / 841 - (int64_t(kLabBase) * 16 / 116 * 108 / 841);
      const int64_t cube = idx * idx / kLabBase * idx / kLabBase;
      tt.ab_tab[j] = static_cast<int32_t>(idx <= 3390 ? lin : cube);
    }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        tt.inv_coeffs[r * 3 + c] = static_cast<int32_t>(
            rint64(double(1 << kLabShift) * kXYZ2SRGB[r * 3 + c] * kD65[c]));
    for (int i = 0; i < kInvGammaSize; ++i) {
      const double u = i / double(kInvGammaSize);
      const double g = u <= 0.0031308
                           ? 12.92 * u
                           : 1.055 * std::pow(u, 1.0 / 2.4) - 0.055;
      int64_t v = rint64(255.0 * g);
      tt.inv_gamma_tab[i] =
          static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    return tt;
  }();
  return t;
}

inline int32_t descale(int32_t x, int n) { return (x + (1 << (n - 1))) >> n; }

// CLAHE an interleaved (h, w, 3) uint8 RGB image via the LAB L channel,
// reference network.py:199-206 semantics. Scratch: three h*w planes.
void clahe_rgb_one(const uint8_t* src, int h, int w, float clip_limit,
                   int tiles_y, int tiles_x, uint8_t* dst) {
  const LabTables& t = lab_tables();
  const size_t npx = static_cast<size_t>(h) * w;
  std::vector<uint8_t> l_plane(npx), a_plane(npx), b_plane(npx);

  const int32_t* fc = t.fwd_coeffs;
  const int32_t l_scale = (116 * 255 + 50) / 100;
  const int32_t l_shift = -((16 * 255 * (1 << kLabShift2) + 50) / 100);
  for (size_t i = 0; i < npx; ++i) {
    const int32_t r = t.gamma_tab[src[3 * i]];
    const int32_t g = t.gamma_tab[src[3 * i + 1]];
    const int32_t b = t.gamma_tab[src[3 * i + 2]];
    const int32_t fx = t.cbrt_tab[descale(r * fc[0] + g * fc[1] + b * fc[2], kLabShift)];
    const int32_t fy = t.cbrt_tab[descale(r * fc[3] + g * fc[4] + b * fc[5], kLabShift)];
    const int32_t fz = t.cbrt_tab[descale(r * fc[6] + g * fc[7] + b * fc[8], kLabShift)];
    int32_t lv = descale(l_scale * fy + l_shift, kLabShift2);
    int32_t av = descale(500 * (fx - fy) + 128 * (1 << kLabShift2), kLabShift2);
    int32_t bv = descale(200 * (fy - fz) + 128 * (1 << kLabShift2), kLabShift2);
    l_plane[i] = static_cast<uint8_t>(lv < 0 ? 0 : (lv > 255 ? 255 : lv));
    a_plane[i] = static_cast<uint8_t>(av < 0 ? 0 : (av > 255 ? 255 : av));
    b_plane[i] = static_cast<uint8_t>(bv < 0 ? 0 : (bv > 255 ? 255 : bv));
  }

  std::vector<uint8_t> l_eq(npx);
  clahe_one(l_plane.data(), h, w, clip_limit, tiles_y, tiles_x, l_eq.data());

  const int32_t* ic = t.inv_coeffs;
  const int shift = kLabShift + 2;  // descale 2^26 -> 4096-entry gamma domain
  for (size_t i = 0; i < npx; ++i) {
    const int32_t li = l_eq[i];
    const int32_t ai = a_plane[i];
    const int32_t bi = b_plane[i];
    const int32_t y = t.y_tab[li];
    const int32_t ify = t.ify_tab[li];
    const int32_t adiv = ((5 * ai * 53687 + (1 << 7)) >> 13) - 128 * kLabBase / 500;
    const int32_t bdiv = ((bi * 41943 + (1 << 4)) >> 9) - (128 * kLabBase / 200) + 1;
    auto clampi = [](int32_t v, int32_t lo, int32_t hi) {
      return v < lo ? lo : (v > hi ? hi : v);
    };
    const int32_t x = t.ab_tab[clampi(ify + adiv - kLabMinAb, 0, kAbSize - 1)];
    const int32_t z = t.ab_tab[clampi(ify - bdiv - kLabMinAb, 0, kAbSize - 1)];
    const int32_t ro = clampi(descale(ic[0] * x + ic[1] * y + ic[2] * z, shift), 0, kInvGammaSize - 1);
    const int32_t go = clampi(descale(ic[3] * x + ic[4] * y + ic[5] * z, shift), 0, kInvGammaSize - 1);
    const int32_t bo = clampi(descale(ic[6] * x + ic[7] * y + ic[8] * z, shift), 0, kInvGammaSize - 1);
    dst[3 * i] = t.inv_gamma_tab[ro];
    dst[3 * i + 1] = t.inv_gamma_tab[go];
    dst[3 * i + 2] = t.inv_gamma_tab[bo];
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// Native image decode (JPEG via libjpeg, PNG via libpng) — 8-bit grayscale.
//
// The reference's scalable ingest is a 24-process PIL decode pool (reference
// dataloader.py:135-172); round 3's thread-pool PIL decode (~10 ms/img on
// this host) capped gallery cache builds near 100 img/s — enough for one
// chip but not for a v5e-8's data-parallel extraction. This path removes
// Python from the ingest loop entirely: one `ingest_files` call does
// fopen -> decode -> crop -> Lanczos resize per file across std::threads,
// writing straight into caller-provided (numpy) buffers. Grayscale 8-bit
// JPEG/PNG only — anything else reports a per-file status and the Python
// loader falls back to PIL for the batch (format zoo stays supported).
//
// Compiled only when the system has libjpeg/libpng dev headers
// (-DSIR_HAVE_CODECS -ljpeg -lpng); data/native_ingest.py probes and
// rebuilds without them otherwise.
// ---------------------------------------------------------------------------

#ifdef SIR_HAVE_CODECS

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

// status: 0 ok, 1 = decode error, 2 = unsupported (non-gray / non-8-bit)
int decode_gray_jpeg(const uint8_t* data, size_t len,
                     std::vector<uint8_t>& out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.num_components != 1 || cinfo.data_precision != 8) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  out.resize(static_cast<size_t>(*h) * *w);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.data() + static_cast<size_t>(cinfo.output_scanline) * *w;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  auto* s = reinterpret_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + count > s->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, s->data + s->pos, count);
  s->pos += count;
}

int decode_gray_png(const uint8_t* data, size_t len,
                    std::vector<uint8_t>& out, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  PngReadState state{data, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  const int color = png_get_color_type(png, info);
  const int depth = png_get_bit_depth(png, info);
  // depth < 8 is UNSUPPORTED (not expanded): libpng's bit-replication would
  // disagree with PIL's mode-'1' bool decode for 1-bit inputs, making pixel
  // data depend on which tier decoded the file. Unsupported routes the whole
  // file set through the single PIL-defined path (data/native_ingest.py).
  if (color != PNG_COLOR_TYPE_GRAY || depth != 8) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  png_set_interlace_handling(png);
  png_read_update_info(png, info);
  *h = static_cast<int>(png_get_image_height(png, info));
  *w = static_cast<int>(png_get_image_width(png, info));
  out.resize(static_cast<size_t>(*h) * *w);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = out.data() + static_cast<size_t>(y) * *w;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// fopen + decode + crop + resize one file into dst. Returns 0 on success.
int ingest_one_file(const char* path, int exp_h, int exp_w, int crop_h,
                    int crop_w, int dst_h, int dst_w, uint8_t* dst) {
  std::FILE* fh = std::fopen(path, "rb");
  if (!fh) return 1;
  std::fseek(fh, 0, SEEK_END);
  const long fsize = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  if (fsize <= 8) {
    std::fclose(fh);
    return 1;
  }
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  const size_t got = std::fread(data.data(), 1, data.size(), fh);
  std::fclose(fh);
  if (got != data.size()) return 1;

  std::vector<uint8_t> gray;
  int h = 0, w = 0;
  int rc;
  if (data[0] == 0xFF && data[1] == 0xD8) {
    rc = decode_gray_jpeg(data.data(), data.size(), gray, &h, &w);
  } else if (data[0] == 0x89 && data[1] == 0x50) {
    rc = decode_gray_png(data.data(), data.size(), gray, &h, &w);
  } else {
    return 2;  // unsupported container
  }
  if (rc != 0) return rc;
  // decoded dims must match the caller's header read (dst was sized by it)
  if (h != exp_h || w != exp_w) return 1;
  const uint8_t* cropped =
      gray.data() + static_cast<size_t>(crop_h) * w + crop_w;
  resize_one(cropped, h - 2 * crop_h, w - 2 * crop_w, w, dst, dst_h, dst_w);
  return 0;
}

}  // namespace

#endif  // SIR_HAVE_CODECS

extern "C" {

// 1 when this build can decode JPEG/PNG natively (ingest_files available).
int sir_has_codecs(void) {
#ifdef SIR_HAVE_CODECS
  return 1;
#else
  return 0;
#endif
}

#ifdef SIR_HAVE_CODECS
// Full-native batch ingest: per file, fopen -> decode (8-bit gray JPEG/PNG)
// -> crop -> PIL-exact Lanczos resize into dst[i] (dst_h*dst_w bytes),
// thread-strided. src_hw carries the caller's header-read dims; crop_hw the
// floored per-edge crop counts; per-file status written to status[i]
// (0 ok, 1 decode error, 2 unsupported format). Returns the count of
// non-zero statuses so the caller can fall back wholesale.
int ingest_files(const char** paths, const int* src_hw, const int* crop_hw,
                 const int* dst_hw, uint8_t** dsts, int* status, int n,
                 int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        status[i] = ingest_one_file(
            paths[i], src_hw[2 * i], src_hw[2 * i + 1], crop_hw[2 * i],
            crop_hw[2 * i + 1], dst_hw[2 * i], dst_hw[2 * i + 1], dsts[i]);
      }
    });
  }
  for (auto& w : workers) w.join();
  int bad = 0;
  for (int i = 0; i < n; ++i) bad += status[i] != 0;
  return bad;
}
#endif  // SIR_HAVE_CODECS

// Crop + resize one grayscale image. crop_* are pixel counts already
// floored by the caller (PIL crop-box semantics, reference
// dataloader.py:218-228); dst must hold dst_h * dst_w bytes.
void ingest_crop_resize(const uint8_t* src, int src_h, int src_w,
                        int crop_h, int crop_w, int dst_h, int dst_w,
                        uint8_t* dst) {
  const uint8_t* cropped = src + static_cast<size_t>(crop_h) * src_w + crop_w;
  resize_one(cropped, src_h - 2 * crop_h, src_w - 2 * crop_w, src_w,
             dst, dst_h, dst_w);
}

// Batch API: arrays-of-pointers, one worker thread per chunk.
void ingest_batch(const uint8_t** srcs, const int* src_hw, const int* crop_hw,
                  const int* dst_hw, uint8_t** dsts, int n, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        ingest_crop_resize(srcs[i], src_hw[2 * i], src_hw[2 * i + 1],
                           crop_hw[2 * i], crop_hw[2 * i + 1],
                           dst_hw[2 * i], dst_hw[2 * i + 1], dsts[i]);
      }
    });
  }
  for (auto& w : workers) w.join();
}

// CLAHE one grayscale image (cv2.createCLAHE(clip, (tiles_x, tiles_y))
// .apply semantics, bit-exact — tests/test_native.py).
void clahe_gray(const uint8_t* src, int h, int w, float clip_limit,
                int tiles_y, int tiles_x, uint8_t* dst) {
  clahe_one(src, h, w, clip_limit, tiles_y, tiles_x, dst);
}

// Batch CLAHE: per-image sizes in hw (h0, w0, h1, w1, ...), thread-strided.
void clahe_batch(const uint8_t** srcs, const int* hw, float clip_limit,
                 int tiles_y, int tiles_x, uint8_t** dsts, int n,
                 int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        clahe_one(srcs[i], hw[2 * i], hw[2 * i + 1], clip_limit, tiles_y,
                  tiles_x, dsts[i]);
      }
    });
  }
  for (auto& w : workers) w.join();
}

// Batch CLAHE for interleaved (h, w, 3) uint8 RGB images: RGB -> LAB
// (OpenCV integer fixed-point), CLAHE on L, LAB -> RGB (reference
// network.py:199-206 semantics, matching ops/clahe.py's clahe_image).
void clahe_rgb_batch(const uint8_t** srcs, const int* hw, float clip_limit,
                     int tiles_y, int tiles_x, uint8_t** dsts, int n,
                     int n_threads) {
  lab_tables();  // build once before the threads race
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += n_threads) {
        clahe_rgb_one(srcs[i], hw[2 * i], hw[2 * i + 1], clip_limit, tiles_y,
                      tiles_x, dsts[i]);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"

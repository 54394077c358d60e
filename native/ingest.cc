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

}  // namespace

extern "C" {

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

}  // extern "C"

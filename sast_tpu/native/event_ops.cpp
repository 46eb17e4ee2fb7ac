// Native host-side event-stream ops for the sast_tpu input pipeline.
//
// C++ equivalents of the reference's native-backed host hot loops:
// - stacked_histogram: the per-window event scatter-add that the reference
//   runs through torch put_ (CUDA) / numpy add.at
//   (/root/reference/data/utils/representations.py:111-116)
// - mixed_density_stack: signed polarity stack with log-spaced bins + channel
//   cumsum (representations.py:205-215)
// - monotonize_time: the numba-jitted timestamp correction
//   (/root/reference/scripts/genx/preprocess_dataset.py:159-168)
// - downsample2x_nearest_u8: nearest-exact 2x spatial downsample used for the
//   gen4 _ds2 variant (preprocess_dataset.py:463-473)
//
// Compiled on demand (see native/__init__.py) and called through ctypes;
// every entry point has a numpy fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Events are given as int32 arrays (x, y, p) and int64 timestamps, sorted by
// time. Output: uint8 histogram of shape (2 * bins, H, W), C order.
void stacked_histogram(const int32_t* x, const int32_t* y, const int32_t* p,
                       const int64_t* t, int64_t n_events, int32_t bins,
                       int32_t height, int32_t width, int32_t count_cutoff,
                       uint8_t* out) {
  const int64_t plane = (int64_t)height * width;
  const int64_t total = 2LL * bins * plane;
  std::memset(out, 0, total);
  if (n_events == 0) return;

  const int64_t t0 = t[0];
  const int64_t t1 = t[n_events - 1];
  const double denom = (double)std::max<int64_t>(t1 - t0, 1);
  const double bins_f = (double)bins;
  const uint8_t cutoff = (uint8_t)std::min(count_cutoff, 255);

  for (int64_t i = 0; i < n_events; ++i) {
    double tn = (double)(t[i] - t0) / denom * bins_f;
    int32_t bi = (int32_t)tn;  // floor for non-negative
    if (bi > bins - 1) bi = bins - 1;
    const int64_t idx =
        ((int64_t)p[i] * bins + bi) * plane + (int64_t)y[i] * width + x[i];
    uint8_t v = out[idx];
    if (v < cutoff) out[idx] = v + 1;
  }
}

// Output: int8 stack of shape (bins, H, W) after reverse channel cumsum.
void mixed_density_stack(const int32_t* x, const int32_t* y, const int32_t* p,
                         const int64_t* t, int64_t n_events, int32_t bins,
                         int32_t height, int32_t width, int32_t count_cutoff,
                         int8_t* out) {
  const int64_t plane = (int64_t)height * width;
  const int64_t total = (int64_t)bins * plane;
  // accumulate in int32 to avoid overflow before the final clamp
  int32_t* acc = new int32_t[total]();

  if (n_events > 0) {
    const int64_t t0 = t[0];
    const int64_t t1 = t[n_events - 1];
    const double denom = (double)std::max<int64_t>(t1 - t0, 1);
    const double log_half = std::log(0.5);
    for (int64_t i = 0; i < n_events; ++i) {
      double tn = (double)(t[i] - t0) / denom;
      tn = std::min(std::max(tn, 1e-6), 1.0 - 1e-6);
      double bf = bins - std::log(tn) / log_half;
      if (bf < 0) bf = 0;
      int32_t bi = (int32_t)bf;
      if (bi > bins - 1) bi = bins - 1;
      const int64_t idx = (int64_t)bi * plane + (int64_t)y[i] * width + x[i];
      acc[idx] += 2 * p[i] - 1;
    }
  }
  // channel cumsum: channel c accumulates bins <= c
  for (int32_t c = 1; c < bins; ++c) {
    const int64_t off = (int64_t)c * plane;
    const int64_t prev = off - plane;
    for (int64_t j = 0; j < plane; ++j) acc[off + j] += acc[prev + j];
  }
  const int32_t lo = count_cutoff > 0 ? -count_cutoff : -128;
  const int32_t hi = count_cutoff > 0 ? count_cutoff : 127;
  for (int64_t j = 0; j < total; ++j)
    out[j] = (int8_t)std::min(std::max(acc[j], lo), hi);
  delete[] acc;
}

// In-place non-decreasing timestamp correction.
void monotonize_time(int64_t* t, int64_t n) {
  int64_t last = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (t[i] < last)
      t[i] = last;
    else
      last = t[i];
  }
}

// (C, H, W) uint8 -> (C, H/2, W/2), nearest-exact (src = floor((d+0.5)*2)).
void downsample2x_nearest_u8(const uint8_t* in, int32_t channels,
                             int32_t height, int32_t width, uint8_t* out) {
  const int32_t oh = height / 2, ow = width / 2;
  for (int32_t c = 0; c < channels; ++c) {
    const uint8_t* ip = in + (int64_t)c * height * width;
    uint8_t* op = out + (int64_t)c * oh * ow;
    for (int32_t i = 0; i < oh; ++i) {
      const int32_t si = std::min(2 * i + 1, height - 1);
      const uint8_t* row = ip + (int64_t)si * width;
      for (int32_t j = 0; j < ow; ++j) {
        op[(int64_t)i * ow + j] = row[std::min(2 * j + 1, width - 1)];
      }
    }
  }
}

// (T, C, H, W) uint8 -> (T, H, W, C): the loader's NCHW-on-disk to
// NHWC-on-device layout change. The w-major inner walk keeps exactly C
// source cache lines live (each 64-byte line serves 64 consecutive w), so
// the copy runs at memory bandwidth instead of numpy's strided-copy rate.
void transpose_tchw_to_thwc(const uint8_t* in, int32_t T, int32_t C,
                            int32_t H, int32_t W, uint8_t* out) {
  const int64_t HW = (int64_t)H * W;
  for (int32_t t = 0; t < T; ++t) {
    const uint8_t* src = in + (int64_t)t * C * HW;
    uint8_t* dst = out + (int64_t)t * HW * C;
    for (int32_t h = 0; h < H; ++h) {
      const uint8_t* srow = src + (int64_t)h * W;
      uint8_t* drow = dst + (int64_t)h * W * C;
      for (int32_t w = 0; w < W; ++w) {
        const uint8_t* s = srow + w;
        uint8_t* d = drow + (int64_t)w * C;
        for (int32_t c = 0; c < C; ++c) d[c] = s[(int64_t)c * HW];
      }
    }
  }
}

}  // extern "C"

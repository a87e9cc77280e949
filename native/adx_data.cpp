// adx_data: native host-side data-path kernels for the TPU framework.
//
// The reference's data pipeline leans on OpenCV's C++ core for its one hot
// host op -- cv2.INTER_AREA resize of rendered frames
// (/root/reference/edm2/gym_dataloader.py:61, 400x600 -> 256x256 per frame)
// -- and on torch DataLoader worker processes for parallelism. This library
// is the TPU build's native equivalent: fused area-resize + [-1,1]
// normalization over whole clips, OpenMP-parallel across frames, called
// from Python via ctypes (zero-copy on numpy buffers). It removes both the
// OpenCV dependency and the per-frame Python dispatch overhead from the
// training input path.
//
// Exact INTER_AREA semantics for downscaling: each destination pixel is the
// average of the source box [y*sy,(y+1)*sy) x [x*sx,(x+1)*sx) with
// fractional edge weights.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Span {
  int begin;           // first source index
  int count;           // number of source taps
  float w_first, w_last;  // fractional weights of the edge taps
  float inv_area;
};

// Precompute the 1-D fractional box for each destination index.
static std::vector<Span> make_spans(int src, int dst) {
  std::vector<Span> spans(dst);
  const double scale = static_cast<double>(src) / dst;
  for (int i = 0; i < dst; ++i) {
    const double lo = i * scale, hi = (i + 1) * scale;
    int b = static_cast<int>(lo);
    int e = static_cast<int>(std::ceil(hi));
    e = std::min(e, src);
    Span s;
    s.begin = b;
    s.count = e - b;
    s.w_first = static_cast<float>(std::min(static_cast<double>(b + 1), hi) - lo);
    s.w_last = (s.count > 1)
                   ? static_cast<float>(hi - (e - 1))
                   : 0.0f;  // single-tap: w_first already covers it
    s.inv_area = static_cast<float>(1.0 / (hi - lo));
    spans[i] = s;
  }
  return spans;
}

static inline float tap_weight(const Span& s, int j) {
  if (j == 0) return s.w_first;
  if (j == s.count - 1) return s.w_last;
  return 1.0f;
}

// Area-resize one HWC uint8 frame into a float HWC buffer (no normalize).
static void resize_area_one(const uint8_t* src, int sh, int sw, int c,
                            float* dst, int dh, int dw,
                            const std::vector<Span>& ys,
                            const std::vector<Span>& xs,
                            float scale, float offset) {
  std::vector<float> row_acc(static_cast<size_t>(sw) * c);
  for (int oy = 0; oy < dh; ++oy) {
    const Span& sy = ys[oy];
    // vertical reduction into row_acc
    std::fill(row_acc.begin(), row_acc.end(), 0.0f);
    for (int j = 0; j < sy.count; ++j) {
      const float wy = tap_weight(sy, j);
      const uint8_t* srow =
          src + (static_cast<size_t>(sy.begin + j) * sw) * c;
      for (int i = 0; i < sw * c; ++i) row_acc[i] += wy * srow[i];
    }
    // horizontal reduction
    float* drow = dst + (static_cast<size_t>(oy) * dw) * c;
    for (int ox = 0; ox < dw; ++ox) {
      const Span& sx = xs[ox];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int j = 0; j < sx.count; ++j)
          acc += tap_weight(sx, j) * row_acc[(sx.begin + j) * c + ch];
        drow[ox * c + ch] =
            acc * sx.inv_area * sy.inv_area * scale + offset;
      }
    }
  }
}

}  // namespace

extern "C" {

// Resize a batch of uint8 HWC frames with INTER_AREA semantics.
// src: (n, sh, sw, c) uint8; dst: (n, dh, dw, c) float32.
// scale/offset: affine applied to the averaged [0,255] value
//   (identity: scale=1, offset=0; [-1,1] pixels: scale=1/127.5, offset=-1).
void adx_resize_area_batch(const uint8_t* src, int n, int sh, int sw, int c,
                           float* dst, int dh, int dw, float scale,
                           float offset) {
  const auto ys = make_spans(sh, dh);
  const auto xs = make_spans(sw, dw);
  const size_t in_stride = static_cast<size_t>(sh) * sw * c;
  const size_t out_stride = static_cast<size_t>(dh) * dw * c;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int f = 0; f < n; ++f) {
    resize_area_one(src + f * in_stride, sh, sw, c, dst + f * out_stride, dh,
                    dw, ys, xs, scale, offset);
  }
}

// Plain uint8 -> float32 affine convert (no resize), OpenMP-parallel.
void adx_u8_to_f32(const uint8_t* src, int64_t count, float* dst, float scale,
                   float offset) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < count; ++i)
    dst[i] = src[i] * scale + offset;
}

// float32 [-1,1] -> uint8 [0,255] with clamp (decode/display path).
void adx_f32_to_u8(const float* src, int64_t count, uint8_t* dst, float scale,
                   float offset) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < count; ++i) {
    float v = src[i] * scale + offset;
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    dst[i] = static_cast<uint8_t>(v + 0.5f);
  }
}

int adx_version() { return 1; }

}  // extern "C"

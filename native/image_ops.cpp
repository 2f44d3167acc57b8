// Native host-side image preprocessing for the TPU input pipeline.
//
// Replaces the hot per-image host work of the reference's vendored
// multiprocessing DataLoader (anomaly/lib/utils/data/dataloader.py +
// PIL resize + torchvision normalize) with threaded C++:
//   - PIL-parity separable triangle-filter (BILINEAR) resampling, fused
//     with uint8 -> float32 conversion and ImageNet mean/std normalization
//     (one pass, no intermediate float image);
//   - PIL-parity NEAREST resampling for label maps;
//   - multi-threaded across rows (std::thread, no external deps).
//
// PIL resampling semantics reproduced (Pillow Resample.c): for each output
// pixel, center = (i + 0.5) * scale; filter support = filterscale when
// downscaling (scale > 1) else 1; triangle weights normalized to sum 1;
// horizontal pass then vertical pass (Pillow does horizontal first on the
// already-vertical-resampled image — order does not change the result for
// separable filters up to fp rounding).
//
// C ABI for ctypes binding (see ../open_world_semantic_segmentation_tpu/
// data/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Weights {
  // for each output index: contributions over [bounds[i], bounds[i]+ksize)
  std::vector<int> bounds;
  std::vector<double> coeffs;  // ksize per output index
  int ksize = 0;
};

Weights triangle_weights(int in_size, int out_size) {
  Weights w;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support
  w.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  w.bounds.resize(out_size);
  w.coeffs.assign(static_cast<size_t>(out_size) * w.ksize, 0.0);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &w.coeffs[static_cast<size_t>(i) * w.ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double val = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (val < 0) val = 0;
      k[x] = val;
      ww += val;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    }
    for (int x = xmax; x < w.ksize; ++x) k[x] = 0.0;
    w.bounds[i] = xmin;
  }
  return w;
}

void parallel_for(int n, const std::function<void(int, int)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = std::max(1u, std::min(hw, 16u));
  if (n < 64) nthreads = 1;
  std::vector<std::thread> threads;
  int chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int lo = t * chunk;
    int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// uint8 HWC (sh, sw, 3) -> float32 HWC (dh, dw, 3), PIL-BILINEAR resampled,
// normalized ((x/255 - mean) / std).
void resize_bilinear_normalize_u8(const uint8_t* src, int sh, int sw,
                                  float* dst, int dh, int dw,
                                  const float* mean, const float* std3) {
  Weights wx = triangle_weights(sw, dw);
  Weights wy = triangle_weights(sh, dh);

  // horizontal pass: (sh, sw, 3) u8 -> (sh, dw, 3) float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  parallel_for(sh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
      float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
      for (int x = 0; x < dw; ++x) {
        const double* k = &wx.coeffs[static_cast<size_t>(x) * wx.ksize];
        int x0 = wx.bounds[x];
        double acc0 = 0, acc1 = 0, acc2 = 0;
        for (int i = 0; i < wx.ksize; ++i) {
          double c = k[i];
          if (c == 0.0) continue;
          const uint8_t* p = srow + static_cast<size_t>(x0 + i) * 3;
          acc0 += c * p[0];
          acc1 += c * p[1];
          acc2 += c * p[2];
        }
        trow[x * 3 + 0] = static_cast<float>(acc0);
        trow[x * 3 + 1] = static_cast<float>(acc1);
        trow[x * 3 + 2] = static_cast<float>(acc2);
      }
    }
  });

  // vertical pass + fused normalize
  float inv255 = 1.0f / 255.0f;
  parallel_for(dh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const double* k = &wy.coeffs[static_cast<size_t>(y) * wy.ksize];
      int y0 = wy.bounds[y];
      float* drow = dst + static_cast<size_t>(y) * dw * 3;
      for (int x = 0; x < dw; ++x) {
        double acc0 = 0, acc1 = 0, acc2 = 0;
        for (int i = 0; i < wy.ksize; ++i) {
          double c = k[i];
          if (c == 0.0) continue;
          const float* p =
              tmp.data() + (static_cast<size_t>(y0 + i) * dw + x) * 3;
          acc0 += c * p[0];
          acc1 += c * p[1];
          acc2 += c * p[2];
        }
        drow[x * 3 + 0] =
            (static_cast<float>(acc0) * inv255 - mean[0]) / std3[0];
        drow[x * 3 + 1] =
            (static_cast<float>(acc1) * inv255 - mean[1]) / std3[1];
        drow[x * 3 + 2] =
            (static_cast<float>(acc2) * inv255 - mean[2]) / std3[2];
      }
    }
  });
}

// uint8 HW (sh, sw) label map -> int32 HW (dh, dw), PIL-NEAREST + offset.
// PIL nearest: src index = floor(dst * scale + scale * 0.5) implemented as
// affine transform center sampling: x_src = (x + 0.5) * scale, truncated.
void resize_nearest_label(const uint8_t* src, int sh, int sw, int32_t* dst,
                          int dh, int dw, int32_t offset) {
  double sx = static_cast<double>(sw) / dw;
  double sy = static_cast<double>(sh) / dh;
  parallel_for(dh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      int ys = std::min(static_cast<int>((y + 0.5) * sy), sh - 1);
      const uint8_t* srow = src + static_cast<size_t>(ys) * sw;
      int32_t* drow = dst + static_cast<size_t>(y) * dw;
      for (int x = 0; x < dw; ++x) {
        int xs = std::min(static_cast<int>((x + 0.5) * sx), sw - 1);
        drow[x] = static_cast<int32_t>(srow[xs]) + offset;
      }
    }
  });
}

// normalize-only path (no resize): uint8 HWC -> float32 HWC
void normalize_u8(const uint8_t* src, int h, int w, float* dst,
                  const float* mean, const float* std3) {
  float inv255 = 1.0f / 255.0f;
  parallel_for(h, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * w * 3;
      float* drow = dst + static_cast<size_t>(y) * w * 3;
      for (int x = 0; x < w * 3; x += 3) {
        drow[x + 0] = (srow[x + 0] * inv255 - mean[0]) / std3[0];
        drow[x + 1] = (srow[x + 1] * inv255 - mean[1]) / std3[1];
        drow[x + 2] = (srow[x + 2] * inv255 - mean[2]) / std3[2];
      }
    }
  });
}

}  // extern "C"

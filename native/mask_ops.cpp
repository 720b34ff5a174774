// Host-side mask preprocessing kernels (C++, multithreaded).
//
// The training input pipeline converts per-frame SAM2 masks into latent-grid
// teacher routing targets every step (reference util/utils.py:871-936 +
// train.py:1167-1193).  In Python this is the slowest host-side stage of
// batch prep; here it is a std::thread-parallel C library consumed via
// ctypes (bindyouravatar_tpu/utils/masks.py), with a numpy fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

// Trilinear sample of src[T,H,W] at continuous (ft, fy, fx) given in
// "align_corners=False" convention (matches jax.image.resize linear).
inline float sample(const float* src, int t, int h, int w,
                    float ft, float fy, float fx) {
  auto clampi = [](int v, int lo, int hi) { return std::min(std::max(v, lo), hi); };
  int t0 = clampi((int)std::floor(ft), 0, t - 1);
  int y0 = clampi((int)std::floor(fy), 0, h - 1);
  int x0 = clampi((int)std::floor(fx), 0, w - 1);
  int t1 = clampi(t0 + 1, 0, t - 1);
  int y1 = clampi(y0 + 1, 0, h - 1);
  int x1 = clampi(x0 + 1, 0, w - 1);
  float dt = ft - t0, dy = fy - y0, dx = fx - x0;
  dt = std::min(std::max(dt, 0.0f), 1.0f);
  dy = std::min(std::max(dy, 0.0f), 1.0f);
  dx = std::min(std::max(dx, 0.0f), 1.0f);

  auto at = [&](int tt, int yy, int xx) {
    return src[(size_t)tt * h * w + (size_t)yy * w + xx];
  };
  float c00 = lerp(at(t0, y0, x0), at(t0, y0, x1), dx);
  float c01 = lerp(at(t0, y1, x0), at(t0, y1, x1), dx);
  float c10 = lerp(at(t1, y0, x0), at(t1, y0, x1), dx);
  float c11 = lerp(at(t1, y1, x0), at(t1, y1, x1), dx);
  float c0 = lerp(c00, c01, dy);
  float c1 = lerp(c10, c11, dy);
  return lerp(c0, c1, dt);
}

void parallel_for(int n, const std::function<void(int, int)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = std::max(1u, std::min(hw, (unsigned)n));
  std::vector<std::thread> threads;
  int chunk = (n + nthreads - 1) / nthreads;
  for (int i = 0; i < nthreads; ++i) {
    int lo = i * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// src [T,H,W] float -> dst [OT,OH,OW] float, trilinear.
void bya_resize_trilinear(const float* src, int t, int h, int w,
                          float* dst, int ot, int oh, int ow) {
  float st = (float)t / ot, sy = (float)h / oh, sx = (float)w / ow;
  parallel_for(ot, [&](int lo, int hi) {
    for (int k = lo; k < hi; ++k) {
      float ft = (k + 0.5f) * st - 0.5f;
      for (int y = 0; y < oh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        float* row = dst + (size_t)k * oh * ow + (size_t)y * ow;
        for (int x = 0; x < ow; ++x) {
          float fx = (x + 0.5f) * sx - 0.5f;
          row[x] = sample(src, t, h, w, ft, fy, fx);
        }
      }
    }
  });
}

// Two pixel-space masks [T,H,W] -> latent index mask [OT*OH*OW]
// (-1 background / 0 id1 / 1 id2, id2 wins) + one-hot routing
// [OT*OH*OW, 2] with temporal OR-reduce + repeat (the teacher target).
void bya_masks_to_teacher(const float* m1, const float* m2,
                          int t, int h, int w,
                          int ot, int oh, int ow,
                          int64_t* index_mask,   // [ot*oh*ow]
                          float* teacher) {      // [ot*oh*ow, 2]
  size_t n = (size_t)ot * oh * ow;
  std::vector<float> r1(n), r2(n);
  bya_resize_trilinear(m1, t, h, w, r1.data(), ot, oh, ow);
  bya_resize_trilinear(m2, t, h, w, r2.data(), ot, oh, ow);

  size_t plane = (size_t)oh * ow;
  for (size_t i = 0; i < n; ++i) {
    int64_t v = -1;
    if (r1[i] > 0.5f) v = 0;
    if (r2[i] > 0.5f) v = 1;
    index_mask[i] = v;
  }
  // temporal OR per spatial cell, then broadcast over frames
  std::vector<float> or0(plane, 0.f), or1(plane, 0.f);
  for (int k = 0; k < ot; ++k) {
    const int64_t* im = index_mask + (size_t)k * plane;
    for (size_t i = 0; i < plane; ++i) {
      if (im[i] == 0) or0[i] = 1.f;
      if (im[i] == 1) or1[i] = 1.f;
    }
  }
  for (int k = 0; k < ot; ++k) {
    float* out = teacher + (size_t)k * plane * 2;
    for (size_t i = 0; i < plane; ++i) {
      out[i * 2 + 0] = or0[i];
      out[i * 2 + 1] = or1[i];
    }
  }
}

}  // extern "C"

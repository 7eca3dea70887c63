// flux2-tpu native image ops.
//
// The TPU-native equivalent of the reference's CoreGraphics pixel path
// (Flux2Pipeline.swift:2254-2468, ChainHelpers mask rasterization): exact,
// fast host-side image resampling and format conversion feeding the VAE and
// the chain mask geometry. Built as a plain C shared library and bound via
// ctypes (no pybind11 dependency); every entry point has a numpy fallback
// in flux2_tpu/utils/native.py.
//
// Build: make -C native   (or g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Area-average (box) resample of a single-channel f32 plane.
// Exact mean over the source cell covered by each destination pixel —
// the semantics the latent-grid mask rasterization needs.
void area_resize_f32(const float* src, int sh, int sw,
                     float* dst, int dh, int dw) {
  for (int i = 0; i < dh; ++i) {
    int y0 = (int)((long long)i * sh / dh);
    int y1 = (int)(((long long)i + 1) * sh / dh);
    if (y1 <= y0) y1 = y0 + 1;
    for (int j = 0; j < dw; ++j) {
      int x0 = (int)((long long)j * sw / dw);
      int x1 = (int)(((long long)j + 1) * sw / dw);
      if (x1 <= x0) x1 = x0 + 1;
      double acc = 0.0;
      for (int y = y0; y < y1; ++y) {
        const float* row = src + (size_t)y * sw;
        for (int x = x0; x < x1; ++x) acc += row[x];
      }
      dst[(size_t)i * dw + j] = (float)(acc / ((double)(y1 - y0) * (x1 - x0)));
    }
  }
}

// Bilinear resample of an interleaved [H, W, C] f32 image (half-pixel
// centers, clamped edges). Used for up/down-scaling reference images when
// PIL is unavailable; matches torch/PIL align_corners=False convention.
void resize_bilinear_f32(const float* src, int sh, int sw, int c,
                         float* dst, int dh, int dw) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  for (int i = 0; i < dh; ++i) {
    float fy = (i + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(y0 + 1, sh - 1);
    for (int j = 0; j < dw; ++j) {
      float fx = (j + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(x0 + 1, sw - 1);
      const float* p00 = src + ((size_t)y0c * sw + x0c) * c;
      const float* p01 = src + ((size_t)y0c * sw + x1c) * c;
      const float* p10 = src + ((size_t)y1c * sw + x0c) * c;
      const float* p11 = src + ((size_t)y1c * sw + x1c) * c;
      float* out = dst + ((size_t)i * dw + j) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        out[k] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

// uint8 [0,255] -> f32 [0,1]
void u8_to_f32(const uint8_t* src, float* dst, long long n) {
  const float inv = 1.0f / 255.0f;
  for (long long i = 0; i < n; ++i) dst[i] = src[i] * inv;
}

// f32 [0,1] -> uint8 [0,255] with round-half-away and clamping
void f32_to_u8(const float* src, uint8_t* dst, long long n) {
  for (long long i = 0; i < n; ++i) {
    float v = src[i] * 255.0f + 0.5f;
    dst[i] = (uint8_t)std::min(std::max(v, 0.0f), 255.0f);
  }
}

// Per-pixel soft-mask composite: out = m*gen + (1-m)*orig (interleaved C).
void soft_composite_f32(const float* orig, const float* gen, const float* mask,
                        float* dst, int h, int w, int c) {
  for (size_t i = 0; i < (size_t)h * w; ++i) {
    float m = mask[i];
    for (int k = 0; k < c; ++k) {
      size_t idx = i * c + k;
      dst[idx] = m * gen[idx] + (1.0f - m) * orig[idx];
    }
  }
}

}  // extern "C"

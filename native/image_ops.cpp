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

// Manhattan (L1) distance transform via two-pass 4-neighbour chamfer with
// unit weights — exact for L1, which matches the cross structuring element
// the iterated-erosion reference path uses (chains/subject_mask._dilate).
// `src` > 0.5 marks sources (distance 0). Out-of-image counts as
// non-source (infinite distance).
static void l1_distance(const float* src, int h, int w, float* d) {
  const float INF = 1e9f;
  for (long long i = 0; i < (long long)h * w; ++i) d[i] = src[i] > 0.5f ? 0.0f : INF;
  // forward: up, left
  for (int i = 0; i < h; ++i) {
    float* row = d + (size_t)i * w;
    const float* up = i > 0 ? d + (size_t)(i - 1) * w : nullptr;
    for (int j = 0; j < w; ++j) {
      float v = row[j];
      if (up && up[j] + 1 < v) v = up[j] + 1;
      if (j > 0 && row[j - 1] + 1 < v) v = row[j - 1] + 1;
      row[j] = v;
    }
  }
  // backward: down, right
  for (int i = h - 1; i >= 0; --i) {
    float* row = d + (size_t)i * w;
    const float* dn = i + 1 < h ? d + (size_t)(i + 1) * w : nullptr;
    for (int j = w - 1; j >= 0; --j) {
      float v = row[j];
      if (dn && dn[j] + 1 < v) v = dn[j] + 1;
      if (j + 1 < w && row[j + 1] + 1 < v) v = row[j + 1] + 1;
      row[j] = v;
    }
  }
}

// Binary dilation (cross element iterated `dilation` times = L1 ball)
// followed by a linear
// inward edge ramp of `ramp` layers: layer depth d in [1, ramp] gets value
// d/(ramp+1); deeper pixels get 1. Exactly the reference subject-mask
// post-processing (Flux2SubjectMask dilate+ramp; see chains/subject_mask.py
// numpy fallback), but O(H*W) via two distance transforms instead of
// O(radius*H*W) iterated erosions. `tmp` must hold 2*h*w floats.
void dilate_ramp_f32(const float* mask, int h, int w,
                     int dilation, int ramp, float* tmp, float* out) {
  float* dist_fg = tmp;            // distance to nearest foreground pixel
  float* depth = tmp + (size_t)h * w;  // distance to nearest background
  l1_distance(mask, h, w, dist_fg);
  // dilated foreground = within `dilation` of a source; background marker
  // inverts it (out-of-image stays "far": matches the edge-replicate
  // padding of the numpy path, which never erodes from the image border).
  for (long long i = 0; i < (long long)h * w; ++i)
    out[i] = dist_fg[i] <= (float)dilation ? 0.0f : 1.0f;  // 0=fg, 1=bg marker
  l1_distance(out, h, w, depth);  // depth inside the dilated region
  const float denom = (float)(ramp + 1);
  for (long long i = 0; i < (long long)h * w; ++i) {
    if (out[i] > 0.5f) { out[i] = 0.0f; continue; }  // background
    float v = ramp > 0 ? depth[i] / denom : 1.0f;
    out[i] = v < 1.0f ? v : 1.0f;
  }
}

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

// Native host-side data ops for the input pipeline.
//
// The reference's training bottleneck was its pure-Python/OpenCV host
// augmentation path (SURVEY.md §7 "host input pipeline throughput"). These
// are the hot inner loops — image resize, LUT mapping, uint8->float32
// normalization/packing — implemented with OpenMP so the loader threads can
// saturate host cores while the TPU computes. Exposed through a plain C ABI
// consumed via ctypes (datasets/native_backend.py); no pybind11 needed.
//
// Build: make -C modular_semantic_segmentation_tpu/native

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Bilinear resize for uint8 HWC images (C contiguous, any channel count).
// Matches OpenCV INTER_LINEAR pixel-center convention:
//   src_x = (dst_x + 0.5) * scale - 0.5
void resize_bilinear_u8(const uint8_t* src, int src_h, int src_w, int ch,
                        uint8_t* dst, int dst_h, int dst_w,
                        double scale_y, double scale_x) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    float fy = static_cast<float>((y + 0.5) * scale_y - 0.5);
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), src_h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), src_h - 1);
    for (int x = 0; x < dst_w; ++x) {
      float fx = static_cast<float>((x + 0.5) * scale_x - 0.5);
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), src_w - 1);
      int x1c = std::min(std::max(x0 + 1, 0), src_w - 1);
      const uint8_t* p00 = src + (static_cast<int64_t>(y0c) * src_w + x0c) * ch;
      const uint8_t* p01 = src + (static_cast<int64_t>(y0c) * src_w + x1c) * ch;
      const uint8_t* p10 = src + (static_cast<int64_t>(y1c) * src_w + x0c) * ch;
      const uint8_t* p11 = src + (static_cast<int64_t>(y1c) * src_w + x1c) * ch;
      uint8_t* out = dst + (static_cast<int64_t>(y) * dst_w + x) * ch;
      for (int c = 0; c < ch; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float val = top + wy * (bot - top);
        out[c] = static_cast<uint8_t>(val + 0.5f);
      }
    }
  }
}

// Nearest-neighbour resize for any element size (labels, depth).
// OpenCV INTER_NEAREST convention: src_x = floor(dst_x * scale).
void resize_nearest(const void* src_v, int src_h, int src_w, int ch,
                    int elem_size, void* dst_v, int dst_h, int dst_w,
                    double scale_y, double scale_x) {
  const char* src = static_cast<const char*>(src_v);
  char* dst = static_cast<char*>(dst_v);
  const int px = ch * elem_size;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    int sy = std::min(static_cast<int>(std::floor(y * scale_y)), src_h - 1);
    for (int x = 0; x < dst_w; ++x) {
      int sx = std::min(static_cast<int>(std::floor(x * scale_x)), src_w - 1);
      std::memcpy(dst + (static_cast<int64_t>(y) * dst_w + x) * px,
                  src + (static_cast<int64_t>(sy) * src_w + sx) * px, px);
    }
  }
}

// 256-entry LUT over a uint8 buffer (gamma correction).
void apply_lut_u8(const uint8_t* src, int64_t n, const uint8_t* lut,
                  uint8_t* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// Fused uint8 -> float32 conversion with scale+offset (normalization),
// the per-batch packing hot loop.
void pack_normalize_f32(const uint8_t* src, int64_t n, float scale,
                        float offset, float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale + offset;
}

}  // extern "C"

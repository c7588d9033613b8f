// Native host-side sample factory: the C++ runtime component of the data
// pipeline (the TPU-world counterpart of the reference's native layer — its
// only C++/CUDA was the dead InPlace-ABN extension; here native code earns
// its keep on the host decode/augment path that feeds the chips).
//
// Fuses the per-channel target chain of Data/dataset.py:397-476 into one
// OpenMP-parallel call with EXACT semantics:
//   raw pixel-coded mask
//     -> per-channel binary masks (leaf LUT / parent = union of descendants)
//     -> half-pixel bilinear resize to (S, S)      [cv2.INTER_LINEAR parity]
//     -> optional horizontal flip
//     -> optional nearest-neighbor inverse affine  [torchvision TF.affine
//        parity; channel 0 fills with its max, others with -1]
//     -> re-binarize at 0.5
//     -> optional ternary restrictive encoding (1 / 0 inside parent / -1)
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Built by
// runtime/Makefile into libsample_factory.so; the Python loader falls back to
// the pure-numpy path when the library is absent (tests compare both).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Half-pixel bilinear sample of a float image (matches cv2.INTER_LINEAR /
// torch interpolate align_corners=False).
inline float bilinear_at(const float* img, int h, int w, float sy, float sx) {
  sy = std::min(std::max(sy, 0.0f), (float)(h - 1));
  sx = std::min(std::max(sx, 0.0f), (float)(w - 1));
  int y0 = (int)sy, x0 = (int)sx;
  int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
  float fy = sy - y0, fx = sx - x0;
  float a = img[y0 * w + x0], b = img[y0 * w + x1];
  float c = img[y1 * w + x0], d = img[y1 * w + x1];
  return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) +
         d * fy * fx;
}

}  // namespace

extern "C" {

// Build one sample's target tensor.
//   mask:        (h, w) uint8 pixel-coded label image
//   out:         (S, S, n_channels) float32, channel-last
//   channel_nvals / channel_vals: per-channel pixel-value sets (parents carry
//                their descendant leaves' values), flattened
//   parent_channel: per-channel index of the direct parent channel, -1 = root
//                (roots also mark flat mode when all are -1 w/ hier=0)
//   hier:        apply ternary encoding iff != 0
//   do_hflip:    apply horizontal flip
//   affine:      6-double row-major forward matrix [a b tx; c d ty] mapping
//                input->output coords (inverted internally), or null
// Returns 0 on success.
int rhss_make_target(const uint8_t* mask, int h, int w, int S,
                     const int32_t* channel_nvals,
                     const int32_t* channel_vals, int n_channels,
                     const int32_t* parent_channel, int hier, int do_hflip,
                     const double* affine, float* out) {
  // per-channel binary masks at native resolution
  std::vector<float> native((size_t)n_channels * h * w);
  std::vector<int> val_off(n_channels + 1, 0);
  for (int c = 0; c < n_channels; ++c)
    val_off[c + 1] = val_off[c] + channel_nvals[c];

  // 256-entry membership LUT per channel (bitset over channels <= 32 here;
  // use bytes for generality)
  std::vector<uint8_t> lut((size_t)n_channels * 256, 0);
  for (int c = 0; c < n_channels; ++c)
    for (int k = val_off[c]; k < val_off[c + 1]; ++k)
      lut[(size_t)c * 256 + (channel_vals[k] & 0xff)] = 1;

#pragma omp parallel for schedule(static)
  for (int c = 0; c < n_channels; ++c) {
    const uint8_t* l = &lut[(size_t)c * 256];
    float* dst = &native[(size_t)c * h * w];
    for (int i = 0; i < h * w; ++i) dst[i] = (float)l[mask[i]];
  }

  // resize + flip + affine + threshold, channel-parallel
  const float sy_scale = (float)h / S, sx_scale = (float)w / S;
  double inv[6] = {1, 0, 0, 0, 1, 0};
  if (affine) {
    const double a = affine[0], b = affine[1], tx = affine[2];
    const double c2 = affine[3], d = affine[4], ty = affine[5];
    const double det = a * d - b * c2;
    inv[0] = d / det;
    inv[1] = -b / det;
    inv[2] = (b * ty - d * tx) / det;
    inv[3] = -c2 / det;
    inv[4] = a / det;
    inv[5] = (c2 * tx - a * ty) / det;
  }

  std::vector<float> resized((size_t)n_channels * S * S);
#pragma omp parallel for schedule(static)
  for (int c = 0; c < n_channels; ++c) {
    const float* src = &native[(size_t)c * h * w];
    float* mid = &resized[(size_t)c * S * S];
    // bilinear resize (half-pixel) with optional hflip fused in
    for (int y = 0; y < S; ++y) {
      const float sy = (y + 0.5f) * sy_scale - 0.5f;
      for (int x = 0; x < S; ++x) {
        const int xo = do_hflip ? (S - 1 - x) : x;
        const float sx = (x + 0.5f) * sx_scale - 0.5f;
        mid[y * S + xo] = bilinear_at(src, h, w, sy, sx);
      }
    }
    if (affine) {
      // fill: channel 0 keeps its max (background stays background
      // out-of-frame), others -1 (dataset.py:446-451)
      float fill = -1.0f;
      if (c == 0) {
        fill = 0.0f;
        for (int i = 0; i < S * S; ++i) fill = std::max(fill, mid[i]);
      }
      std::vector<float> warped((size_t)S * S);
      for (int y = 0; y < S; ++y) {
        for (int x = 0; x < S; ++x) {
          // nearest: round the inverse-mapped source coordinate
          const double sxf = inv[0] * x + inv[1] * y + inv[2];
          const double syf = inv[3] * x + inv[4] * y + inv[5];
          const long xs = std::lround(sxf), ys = std::lround(syf);
          warped[y * S + x] =
              (xs >= 0 && xs < S && ys >= 0 && ys < S)
                  ? mid[ys * S + xs]
                  : fill;
        }
      }
      std::memcpy(mid, warped.data(), sizeof(float) * S * S);
    }
    // threshold 0.5 (dataset.py:454-455)
    for (int i = 0; i < S * S; ++i) mid[i] = mid[i] >= 0.5f ? 1.0f : 0.0f;
  }

  // channel-last output with optional ternary encoding
#pragma omp parallel for schedule(static)
  for (int y = 0; y < S; ++y) {
    for (int x = 0; x < S; ++x) {
      float* o = &out[((size_t)y * S + x) * n_channels];
      for (int c = 0; c < n_channels; ++c)
        o[c] = resized[(size_t)c * S * S + y * S + x];
      if (hier) {
        for (int c = n_channels - 1; c >= 0; --c) {
          const int p = parent_channel[c];
          if (p < 0) continue;  // root: stays 0/1
          const float child = resized[(size_t)c * S * S + y * S + x];
          const float par = resized[(size_t)p * S * S + y * S + x];
          o[c] = child > 0 ? 1.0f : (par > 0 ? 0.0f : -1.0f);
        }
      }
    }
  }
  return 0;
}

int rhss_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

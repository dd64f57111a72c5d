// Host-side frame pre/post-processing kernels for the TPU data path.
//
// The reference does uint8→[-1,1] normalization, ×4 area downsampling of
// oversized inputs, and output quantization in torch on the GPU
// (inference_upscale_a_video.py:180-185,357-359). On TPU these belong to the
// host ingest path (SURVEY §2.11 N9): decode stays with the codec library,
// while the bandwidth-bound pixel conversions run here, multithreaded, writing
// straight into the buffer that jax.device_put ships to the chip.
//
// Exposed C ABI (ctypes, see upscale_a_video_tpu/utils/native_frameproc.py):
//   fp_normalize_u8   : uint8 HWC → float32 [-1, 1]
//   fp_denormalize_f32: float32 [-1, 1] → uint8 (clamped, round-half-away)
//   fp_area_downsample4: float32 HWC → /4 area-averaged float32
// All batched over frames with a simple thread pool.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, int threads, F fn) {
  if (n <= 0) return;
  int workers = std::min<int64_t>(std::max(threads, 1), n);
  if (workers == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    pool.emplace_back([&]() {
      for (int64_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// frames: (T, H, W, C) uint8 → out: (T, H, W, C) float32 in [-1, 1]
// matches (x/255 - 0.5) * 2 (ref inference_upscale_a_video.py:180)
void fp_normalize_u8(const uint8_t* frames, float* out, int64_t t, int64_t hwc,
                     int threads) {
  // LUT: 256 entries, exact match to the float expression
  float lut[256];
  for (int i = 0; i < 256; ++i) {
    lut[i] = (static_cast<float>(i) / 255.0f - 0.5f) * 2.0f;
  }
  parallel_for(t, threads, [&](int64_t fi) {
    const uint8_t* src = frames + fi * hwc;
    float* dst = out + fi * hwc;
    for (int64_t j = 0; j < hwc; ++j) dst[j] = lut[src[j]];
  });
}

// frames: (T, H, W, C) float32 [-1, 1] → out uint8
// matches clip(x/2 + 0.5, 0, 1) * 255 → uint8 truncation (ref :357-359)
void fp_denormalize_f32(const float* frames, uint8_t* out, int64_t t,
                        int64_t hwc, int threads) {
  parallel_for(t, threads, [&](int64_t fi) {
    const float* src = frames + fi * hwc;
    uint8_t* dst = out + fi * hwc;
    for (int64_t j = 0; j < hwc; ++j) {
      float v = src[j] * 0.5f + 0.5f;
      v = std::min(1.0f, std::max(0.0f, v)) * 255.0f;
      dst[j] = static_cast<uint8_t>(v);  // trunc, as numpy astype(uint8)
    }
  });
}

// frames: (T, H, W, C) float32 → out (T, H/4, W/4, C): 4×4 box average
// (torch F.interpolate mode='area' with integer factor 4, ref :184-185)
void fp_area_downsample4(const float* frames, float* out, int64_t t, int64_t h,
                         int64_t w, int64_t c, int threads) {
  const int64_t oh = h / 4, ow = w / 4;
  parallel_for(t * oh, threads, [&](int64_t job) {
    const int64_t fi = job / oh;
    const int64_t oy = job % oh;
    const float* src = frames + fi * h * w * c;
    float* dst = out + fi * oh * ow * c + oy * ow * c;
    for (int64_t ox = 0; ox < ow; ++ox) {
      for (int64_t ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int64_t dy = 0; dy < 4; ++dy) {
          const float* row = src + ((oy * 4 + dy) * w + ox * 4) * c + ch;
          acc += row[0] + row[c] + row[2 * c] + row[3 * c];
        }
        dst[ox * c + ch] = acc * (1.0f / 16.0f);
      }
    }
  });
}

}  // extern "C"

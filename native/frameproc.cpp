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
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
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

// ---------------------------------------------------------------------------
// Decoded-frame ring buffer: fixed-size slots, multi-producer (decode thread
// pool) / single-or-multi-consumer, FIFO in *reservation* order. Producers
// reserve a ticket, fill the slot, commit; commits become visible strictly in
// ticket order (a watermark advances over contiguously-committed tickets), so
// frame order survives an out-of-order decode pool. Consumers pop the oldest
// committed ticket and release its slot after copying/uploading.
//
// This is the host half of the streaming ingest path (SURVEY §2.11 N9): the
// pool decodes clip k+1 into the ring while the TPU runs clip k.

namespace {

struct Ring {
  std::mutex mu;
  std::condition_variable cv;
  std::vector<uint8_t> buf;
  std::vector<uint8_t> committed;  // per-slot flag for the in-flight window
  std::vector<uint8_t> released;   // popped slots given back, maybe out of order
  int64_t slots = 0;
  int64_t slot_bytes = 0;
  int64_t write_ticket = 0;      // next ticket to hand out
  int64_t commit_watermark = 0;  // all tickets < this are committed
  int64_t read_ticket = 0;       // next ticket to pop
  int64_t popped_ticket = 0;     // highest popped-but-unreleased + 1
  bool closed = false;
};

template <typename Pred>
bool wait_on(Ring* r, std::unique_lock<std::mutex>& lk, int timeout_ms,
             Pred pred) {
  if (timeout_ms < 0) {
    r->cv.wait(lk, pred);
    return true;
  }
  return r->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred);
}

}  // namespace

extern "C" {

void* fp_ring_create(int64_t slots, int64_t slot_bytes) {
  if (slots <= 0 || slot_bytes <= 0) return nullptr;
  Ring* r = new Ring();
  r->slots = slots;
  r->slot_bytes = slot_bytes;
  r->buf.resize(static_cast<size_t>(slots * slot_bytes));
  r->committed.assign(static_cast<size_t>(slots), 0);
  r->released.assign(static_cast<size_t>(slots), 0);
  return r;
}

void fp_ring_destroy(void* h) { delete static_cast<Ring*>(h); }

// Producer side signals no more frames will be reserved.
void fp_ring_close(void* h) {
  Ring* r = static_cast<Ring*>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  r->closed = true;
  r->cv.notify_all();
}

// Reserve a slot for writing. Returns ticket ≥ 0, -1 on timeout, -2 if closed.
int64_t fp_ring_reserve(void* h, int timeout_ms) {
  Ring* r = static_cast<Ring*>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  bool ok = wait_on(r, lk, timeout_ms, [&] {
    return r->closed || r->write_ticket - r->read_ticket < r->slots;
  });
  if (r->closed) return -2;
  if (!ok) return -1;
  return r->write_ticket++;
}

// Slot memory for a ticket (valid between reserve/pop and commit/release).
void* fp_ring_slot(void* h, int64_t ticket) {
  Ring* r = static_cast<Ring*>(h);
  return r->buf.data() + (ticket % r->slots) * r->slot_bytes;
}

void fp_ring_commit(void* h, int64_t ticket) {
  Ring* r = static_cast<Ring*>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  r->committed[ticket % r->slots] = 1;
  while (r->commit_watermark < r->write_ticket &&
         r->committed[r->commit_watermark % r->slots]) {
    ++r->commit_watermark;
  }
  r->cv.notify_all();
}

// Pop the oldest committed ticket. -1 on timeout, -2 if closed AND drained.
int64_t fp_ring_pop(void* h, int timeout_ms) {
  Ring* r = static_cast<Ring*>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  bool ok = wait_on(r, lk, timeout_ms, [&] {
    return r->popped_ticket < r->commit_watermark ||
           (r->closed && r->popped_ticket >= r->write_ticket);
  });
  if (r->popped_ticket < r->commit_watermark) return r->popped_ticket++;
  if (r->closed) return -2;
  (void)ok;
  return -1;
}

// Release a popped ticket's slot for reuse. Releases may arrive out of order
// (multiple consumers); a slot is recycled only once every older ticket's slot
// is also back, keeping reserve()'s ticket↔slot mapping unambiguous.
void fp_ring_release(void* h, int64_t ticket) {
  Ring* r = static_cast<Ring*>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  r->released[ticket % r->slots] = 1;
  while (r->read_ticket < r->popped_ticket &&
         r->released[r->read_ticket % r->slots]) {
    r->released[r->read_ticket % r->slots] = 0;
    r->committed[r->read_ticket % r->slots] = 0;
    ++r->read_ticket;
  }
  r->cv.notify_all();
}

// Committed-but-unpopped count (for monitoring/backpressure decisions).
int64_t fp_ring_pending(void* h) {
  Ring* r = static_cast<Ring*>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  return r->commit_watermark - r->popped_ticket;
}

}  // extern "C"

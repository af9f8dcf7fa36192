// Host-side ingest framer: the one genuinely native-hot path of the
// framework (SURVEY §7.1). At the north-star operating point the host
// must deinterleave ≥1.28 GB/s of complex64 multichannel IQ into the
// f32 re/im planes the TPU pipeline consumes; numpy's .real/.imag copies
// make two extra passes and fight the GIL. This library does the
// split (+ optional overlap-tail prepend) in one multithreaded pass.
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).
//
// Reference analog: the GNU Radio runtime's ring-buffer/ingest layer and
// the fork's host↔accelerator FIFO marshalling (SURVEY §2.2 F3).

#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, int threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (threads <= 1 || n < (1 << 16)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk > n ? n : begin + chunk;
    if (begin >= end) break;
    pool.emplace_back([&fn, begin, end] { fn(begin, end); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// src: n interleaved complex64 values (2n floats) → planar re/im.
void doa_split_c64(const float* src, float* re, float* im, int64_t n,
                   int threads) {
  parallel_for(n, threads, [=](int64_t begin, int64_t end) {
    const float* p = src + 2 * begin;
    for (int64_t i = begin; i < end; ++i) {
      re[i] = p[0];
      im[i] = p[1];
      p += 2;
    }
  });
}

// Inverse: planar → interleaved (for writing recorded-IQ output).
void doa_merge_c64(const float* re, const float* im, float* dst, int64_t n,
                   int threads) {
  parallel_for(n, threads, [=](int64_t begin, int64_t end) {
    float* p = dst + 2 * begin;
    for (int64_t i = begin; i < end; ++i) {
      p[0] = re[i];
      p[1] = im[i];
      p += 2;
    }
  });
}

// Overlap-aware block framing: writes [tail ; block] split into planes.
//   tail:   overlap*nch complex64 (previous block's trailing samples)
//   block:  t*nch complex64 (new samples)
//   re/im:  (overlap + t)*nch floats each
// Returns complex samples written per plane.
int64_t doa_frame_block(const float* tail, int64_t overlap,
                        const float* block, int64_t t, int64_t nch,
                        float* re, float* im, int threads) {
  int64_t head = overlap * nch;
  if (head > 0) doa_split_c64(tail, re, im, head, threads);
  doa_split_c64(block, re + head, im + head, t * nch, threads);
  return head + t * nch;
}

}  // extern "C"

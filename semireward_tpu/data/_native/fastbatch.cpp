// fastbatch: threaded host-side batch assembly for the input pipeline.
//
// The reference leans on torch DataLoader's native worker pool for per-batch
// tensor assembly; this is the TPU build's native equivalent. It covers the
// two host-side hot paths that remain after augmentation moved on-device:
//   * gather_rows:  fancy-index copy  dst[i] = src[idx[i]]  (batch gather of
//     raw uint8 images / tokenized rows / waveforms) with a thread pool —
//     ImageNet-scale rows (224*224*3 = 150 KB) benefit from parallel memcpy.
//   * crop_pad_f32: batched random-crop/zero-pad of variable-length float
//     waveforms into the fixed audio bucket.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in image).
// Build: python -m semireward_tpu.data._native.build  (g++ -O3 -shared).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// dst[i, :] = src[idx[i], :] for i in [0, n_idx); row_bytes per row.
void gather_rows(const uint8_t* src, const int64_t* idx, int64_t n_idx,
                 int64_t row_bytes, uint8_t* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  n_threads = std::min<int64_t>(n_threads, n_idx > 0 ? n_idx : 1);
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
    }
  };
  if (n_threads == 1) {
    worker(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_idx, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// For each batch element: copy src[i][start[i] : start[i]+T] (clipped to
// len[i]) into dst[i, :T], zero-padding the tail. srcs is an array of
// pointers to float rows of length lens[i].
void crop_pad_f32(const float* const* srcs, const int64_t* lens,
                  const int64_t* starts, int64_t n, int64_t T, float* dst,
                  int n_threads) {
  if (n_threads < 1) n_threads = 1;
  n_threads = std::min<int64_t>(n_threads, n > 0 ? n : 1);
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float* out = dst + i * T;
      int64_t avail = lens[i] - starts[i];
      int64_t ncopy = std::max<int64_t>(0, std::min(T, avail));
      if (ncopy > 0)
        std::memcpy(out, srcs[i] + starts[i], ncopy * sizeof(float));
      if (ncopy < T) std::memset(out + ncopy, 0, (T - ncopy) * sizeof(float));
    }
  };
  if (n_threads == 1) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"

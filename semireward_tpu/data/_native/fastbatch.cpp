// fastbatch: threaded host-side batch assembly for the input pipeline.
//
// The reference leans on torch DataLoader's native worker pool for per-batch
// tensor assembly; this is the TPU build's native equivalent. It covers the
// host-side hot paths that remain after augmentation moved on-device:
//   * gather_rows:  fancy-index copy  dst[i] = src[idx[i]]  (batch gather of
//     raw uint8 images / tokenized rows / waveforms) with a thread pool —
//     ImageNet-scale rows (224*224*3 = 150 KB) benefit from parallel memcpy.
//   * crop_pad_f32: batched random-crop/zero-pad of variable-length float
//     waveforms into the fixed audio bucket.
//   * decode_jpeg_files: batched JPEG read+decode+resize with libjpeg-turbo
//     SCALE-ON-DECODE — the decoder's own N/8 DCT scaling decodes straight
//     to the smallest size >= target, skipping most of the IDCT work the
//     full-size decode pays, then a fixed-point bilinear resample lands on
//     target x target (the reference decodes full-size in PIL inside torch
//     DataLoader workers, imagenet.py:46-169). This is the ViT-B-224 input
//     bottleneck on few-core hosts (LOADER_r04: 334 img/s decode vs 497
//     img/s chip demand).
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in image).
// Build: python -m semireward_tpu.data._native.build  (g++ -O3 -shared,
// -DHAVE_LIBJPEG -ljpeg when jpeglib.h is present).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#ifdef HAVE_LIBJPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif

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

#ifdef HAVE_LIBJPEG

namespace {

struct JerrMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jmp;
};

void jerr_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JerrMgr*>(cinfo->err)->jmp, 1);
}

// Fixed-point (16.16) separable bilinear resample, RGB u8, squashing both
// dims to t x t (the PIL-path semantics: im.resize((t, t), BILINEAR)).
// Decode-scale selection keeps the downscale ratio <= 8/7, so the naive
// 2-tap kernel stays alias-free in practice.
void bilinear_rgb(const uint8_t* src, int w, int h, uint8_t* dst, int t) {
  if (w == t && h == t) {
    std::memcpy(dst, src, static_cast<size_t>(t) * t * 3);
    return;
  }
  // align-corners=false sampling grid (PIL/TF convention)
  std::vector<int> x0(t), x1(t), wx(t);
  for (int j = 0; j < t; ++j) {
    double sx = (j + 0.5) * w / t - 0.5;
    if (sx < 0) sx = 0;
    int ix = static_cast<int>(sx);
    if (ix > w - 1) ix = w - 1;
    x0[j] = ix;
    x1[j] = std::min(ix + 1, w - 1);
    wx[j] = static_cast<int>((sx - ix) * 65536.0 + 0.5);
  }
  std::vector<uint8_t> row(static_cast<size_t>(t) * 3);
  for (int i = 0; i < t; ++i) {
    double sy = (i + 0.5) * h / t - 0.5;
    if (sy < 0) sy = 0;
    int iy = static_cast<int>(sy);
    if (iy > h - 1) iy = h - 1;
    int y1 = std::min(iy + 1, h - 1);
    int wy = static_cast<int>((sy - iy) * 65536.0 + 0.5);
    const uint8_t* r0 = src + static_cast<size_t>(iy) * w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * 3;
    uint8_t* out = dst + static_cast<size_t>(i) * t * 3;
    for (int j = 0; j < t; ++j) {
      int a = x0[j] * 3, b = x1[j] * 3, fx = wx[j];
      for (int c = 0; c < 3; ++c) {
        int top = (r0[a + c] << 16) + (r0[b + c] - r0[a + c]) * fx;
        int bot = (r1[a + c] << 16) + (r1[b + c] - r1[a + c]) * fx;
        int v = top + static_cast<int>(
            (static_cast<int64_t>(bot - top) * wy) >> 16);
        out[j * 3 + c] = static_cast<uint8_t>((v + 32768) >> 16);
      }
    }
  }
  (void)row;
}

// Decode one JPEG file straight to t x t RGB u8. Returns 0 ok, nonzero on
// any read/decode failure (caller falls back to PIL for that image).
int decode_one(const char* path, int t, uint8_t* dst) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  std::vector<uint8_t> scaled;  // declared before setjmp: longjmp-safe
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // scale-on-decode: smallest num/8 with min(w,h)*num/8 >= t (cap 8/8)
  int short_side = static_cast<int>(std::min(cinfo.image_width,
                                             cinfo.image_height));
  int num = 8;
  if (short_side > 0) {
    num = static_cast<int>((8LL * t + short_side - 1) / short_side);
    num = std::max(1, std::min(8, num));
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.dct_method = JDCT_ISLOW;  // turbo SIMD; quality = PIL default
  jpeg_start_decompress(&cinfo);
  int w = static_cast<int>(cinfo.output_width);
  int h = static_cast<int>(cinfo.output_height);
  scaled.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[8];
    int base = static_cast<int>(cinfo.output_scanline);
    int navail = std::min(8, h - base);
    for (int r = 0; r < navail; ++r)
      rows[r] = scaled.data() + static_cast<size_t>(base + r) * w * 3;
    jpeg_read_scanlines(&cinfo, rows, navail);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  bilinear_rgb(scaled.data(), w, h, dst, t);
  return 0;
}

}  // namespace

#endif  // HAVE_LIBJPEG

extern "C" {

// 1 when decode_jpeg_files is compiled in (libjpeg found at build time).
int has_jpeg() {
#ifdef HAVE_LIBJPEG
  return 1;
#else
  return 0;
#endif
}

// Batched read+decode+resize: dst[i] = resize(decode(paths[i]), t, t),
// RGB u8. status[i] = 0 ok / nonzero failed (caller re-decodes those via
// PIL). Threaded across images.
void decode_jpeg_files(const char* const* paths, int64_t n, int t,
                       uint8_t* dst, int n_threads, int32_t* status) {
#ifdef HAVE_LIBJPEG
  if (n_threads < 1) n_threads = 1;
  n_threads = static_cast<int>(std::min<int64_t>(n_threads, n > 0 ? n : 1));
  int64_t frame = static_cast<int64_t>(t) * t * 3;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      status[i] = decode_one(paths[i], t, dst + i * frame);
  };
  if (n_threads == 1) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int th = 0; th < n_threads; ++th) {
    int64_t lo = th * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
#else
  for (int64_t i = 0; i < n; ++i) status[i] = -1;
  (void)paths; (void)t; (void)dst; (void)n_threads;
#endif
}

}  // extern "C"

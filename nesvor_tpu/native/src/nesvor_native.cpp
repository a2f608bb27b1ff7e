// Native host-side data pipeline for nesvor_tpu.
//
// The reference's native layer is its CUDA compute kernels
// (slice_acq_cuda_kernel.cu, transform_convert_cuda_kernel.cu) — those map
// to Pallas/XLA here (ops/). What remains host-side on TPU is the data
// pipeline feeding the chip: NIfTI decompression + dtype cast and the
// masked pixel-bag assembly (reference nesvor/nesvor/train.py:19-41 flattens
// every masked pixel into device-resident arrays). This module implements
// that pipeline in C++ (zlib inflate, multithreaded cast/scale, fused
// single-pass pixel extraction) behind a plain C ABI consumed via ctypes
// (nesvor_tpu/native/__init__.py), with a numpy fallback when unbuilt.
//
// Build: make -C nesvor_tpu/native    (or auto-built on first import)

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int n_workers(int64_t work, int64_t min_per_thread) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int64_t n = std::min<int64_t>(hw, std::max<int64_t>(1, work / min_per_thread));
  return static_cast<int>(n);
}

template <typename F>
void parallel_for_ranges(int64_t count, int64_t min_per_thread, F f) {
  int n = n_workers(count, min_per_thread);
  if (n <= 1) {
    f(0, count);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (count + n - 1) / n;
  for (int t = 0; t < n; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(count, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { f(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

template <typename T>
void cast_range(const uint8_t* src, float* dst, int64_t lo, int64_t hi,
                float slope, float inter, bool scaled) {
  const T* s = reinterpret_cast<const T*>(src);
  if (scaled) {
    for (int64_t i = lo; i < hi; ++i)
      dst[i] = static_cast<float>(s[i]) * slope + inter;
  } else {
    for (int64_t i = lo; i < hi; ++i) dst[i] = static_cast<float>(s[i]);
  }
}

}  // namespace

extern "C" {

// Inflate a (possibly gzip-compressed) file fully into a malloc'd buffer.
// Returns the byte length, or -1 (open failed) / -2 (read failed).
// *out must be released with nsv_free.
int64_t nsv_read_file(const char* path, uint8_t** out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  gzbuffer(f, 1 << 20);
  size_t cap = 16u << 20;
  uint8_t* buf = static_cast<uint8_t*>(malloc(cap));
  size_t len = 0;
  while (true) {
    if (len == cap) {
      cap *= 2;
      buf = static_cast<uint8_t*>(realloc(buf, cap));
    }
    int n = gzread(f, buf + len, static_cast<unsigned>(cap - len));
    if (n < 0) {
      gzclose(f);
      free(buf);
      return -2;
    }
    if (n == 0) break;
    len += static_cast<size_t>(n);
  }
  gzclose(f);
  *out = buf;
  return static_cast<int64_t>(len);
}

void nsv_free(void* p) { free(p); }

// Multithreaded dtype cast + scl_slope/scl_inter scaling (f32 arithmetic,
// matching numpy's astype(float32) * slope + inter element order).
// dtype = NIfTI-1 datatype code. Returns 0, or -1 for unsupported dtype.
int nsv_cast_f32(const uint8_t* src, int32_t dtype, int64_t count,
                 float slope, float inter, float* dst) {
  bool scaled = slope != 0.0f && slope == slope &&
                !(slope == 1.0f && inter == 0.0f);
  auto run = [&](auto type_tag) {
    using T = decltype(type_tag);
    parallel_for_ranges(count, 1 << 20, [&](int64_t lo, int64_t hi) {
      cast_range<T>(src, dst, lo, hi, slope, inter, scaled);
    });
  };
  switch (dtype) {
    case 2: run(uint8_t{}); break;
    case 4: run(int16_t{}); break;
    case 8: run(int32_t{}); break;
    case 16: run(float{}); break;
    case 64: run(double{}); break;
    case 256: run(int8_t{}); break;
    case 512: run(uint16_t{}); break;
    case 768: run(uint32_t{}); break;
    case 1024: run(int64_t{}); break;
    case 1280: run(uint64_t{}); break;
    default: return -1;
  }
  return 0;
}

// Fused masked pixel-bag extraction over a (n, h, w) C-order volume:
// for every mask!=0 voxel, in (z, y, x) lexicographic order (numpy
// np.nonzero order), emit xyz = (idx - (shape-1)/2) * res in world mm and
// the pixel value. Returns the number of extracted pixels (outputs must
// have capacity for mask.sum(); call with xyz=v=null to count only).
int64_t nsv_pixel_bag(const float* img, const uint8_t* mask, int64_t n,
                      int64_t h, int64_t w, const float* res, float* xyz,
                      float* v) {
  const float cx = (static_cast<float>(w) - 1.0f) / 2.0f;
  const float cy = (static_cast<float>(h) - 1.0f) / 2.0f;
  const float cz = (static_cast<float>(n) - 1.0f) / 2.0f;
  // pass 1: per-plane counts (threaded), exclusive prefix
  std::vector<int64_t> counts(static_cast<size_t>(n), 0);
  parallel_for_ranges(n, 1, [&](int64_t lo, int64_t hi) {
    for (int64_t z = lo; z < hi; ++z) {
      const uint8_t* m = mask + z * h * w;
      int64_t c = 0;
      for (int64_t i = 0; i < h * w; ++i) c += (m[i] != 0);
      counts[static_cast<size_t>(z)] = c;
    }
  });
  std::vector<int64_t> offs(static_cast<size_t>(n) + 1, 0);
  for (int64_t z = 0; z < n; ++z) offs[z + 1] = offs[z] + counts[z];
  int64_t total = offs[static_cast<size_t>(n)];
  if (!xyz || !v) return total;
  // pass 2: fill (threaded over planes)
  parallel_for_ranges(n, 1, [&](int64_t lo, int64_t hi) {
    for (int64_t z = lo; z < hi; ++z) {
      const uint8_t* m = mask + z * h * w;
      const float* im = img + z * h * w;
      int64_t o = offs[static_cast<size_t>(z)];
      const float zc = (static_cast<float>(z) - cz) * res[2];
      for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
          int64_t i = y * w + x;
          if (m[i]) {
            xyz[o * 3 + 0] = (static_cast<float>(x) - cx) * res[0];
            xyz[o * 3 + 1] = (static_cast<float>(y) - cy) * res[1];
            xyz[o * 3 + 2] = zc;
            v[o] = im[i];
            ++o;
          }
        }
      }
    }
  });
  return total;
}

}  // extern "C"

// Native tile-IO runtime for the host data pipeline.
//
// The reference's data path is torch DataLoader worker *processes* copying
// ~17 MB tiles through pickle queues (reference: src/tempo_data.py:139-146).
// Here the hot host-side operation is gathering N scattered tiles (rows of
// memory-mapped .npy shards) into one contiguous NHWC batch buffer that
// jax.device_put can DMA — a pure memory problem, so it lives in C++:
// multi-threaded memcpy with the GIL released (ctypes releases it around
// every call), optional float16->float32 widening, and page-cache friendly
// sequential access per tile.
//
// Built with: g++ -O3 -march=native -shared -fPIC -o libtileio.so tileio.cpp -lpthread
// Bound via ctypes (tempo_tpu/data/native.py); the loader falls back to
// numpy when the library is unavailable.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Copy n_tiles tiles (tile_bytes each) from scattered sources into dst,
// contiguously, using up to n_threads worker threads.
// srcs: array of n_tiles source pointers.
void gather_tiles(const void** srcs, void* dst, int64_t tile_bytes,
                  int64_t n_tiles, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_tiles) return;
      std::memcpy(static_cast<char*>(dst) + i * tile_bytes, srcs[i],
                  tile_bytes);
    }
  };
  if (n_threads == 1 || n_tiles <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  int spawn = static_cast<int>(n_threads < n_tiles ? n_threads : n_tiles);
  threads.reserve(spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Same gather but widening IEEE float16 sources to float32 (half-precision
// shard format halves disk footprint and page-cache pressure).
static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FFu;
      // subnormal h = mant * 2^-24; after `shift` normalizing shifts the
      // implicit-1 exponent is (1 - 15) - shift = -14 - shift.
      bits = sign | ((uint32_t)(127 - 14 - shift) << 23) | (mant << 13);
    }
  } else if (exp == 0x1Fu) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

void gather_tiles_f16_to_f32(const void** srcs, float* dst,
                             int64_t tile_elems, int64_t n_tiles,
                             int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_tiles) return;
      const uint16_t* src = static_cast<const uint16_t*>(srcs[i]);
      float* out = dst + i * tile_elems;
      for (int64_t e = 0; e < tile_elems; ++e) out[e] = half_to_float(src[e]);
    }
  };
  if (n_threads == 1 || n_tiles <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  int spawn = static_cast<int>(n_threads < n_tiles ? n_threads : n_tiles);
  threads.reserve(spawn);
  for (int t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

int tileio_version() { return 1; }

}  // extern "C"

// Native host runtime: frame staging.
//
// The TPU does the compute; the host runtime around it (the role the
// reference delegates to camera-ASIC queues and DDS, SURVEY.md §2.4) has
// one hot path worth native code on a weak host CPU:
//
//   stage_frames: fuse a gather of N uint8 images into one contiguous
//   float32 [N,H,W] tensor (normalize + stack in a single multithreaded
//   pass — feeds one dense jax.device_put, e.g. the SPMD multi-chip
//   staging path).
//
// A previous revision also carried timestamp-synchronization queries
// (reference rig.py:336-356 semantics). They were measured SLOWER than
// the pure-Python implementations at production queue sizes (4 streams x
// 30 entries: 19-23 us native vs 1-12 us Python — ctypes marshalling of
// the ragged layout dominates) and were removed: native code has to earn
// its keep per call site, not per line.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// srcs: array of n pointers to HxW uint8 images; dst: n*H*W float32.
void stage_frames_u8_to_f32(const uint8_t** srcs, int n, int h, int w,
                            float* dst, int num_threads) {
  const size_t plane = static_cast<size_t>(h) * w;
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::atomic<int> next(0);
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      const uint8_t* s = srcs[i];
      float* d = dst + plane * i;
      constexpr float kInv = 1.0f / 255.0f;
      for (size_t j = 0; j < plane; ++j) d[j] = s[j] * kInv;
    }
  };
  const int nt = std::min<int>(num_threads, n);
  workers.reserve(nt);
  for (int t = 0; t < nt; ++t) workers.emplace_back(work);
  for (auto& th : workers) th.join();
}

}  // extern "C"

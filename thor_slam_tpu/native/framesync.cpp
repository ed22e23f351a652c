// Native host runtime: frame staging + timestamp synchronization.
//
// The TPU does the compute; the host runtime around it (the role the
// reference delegates to camera-ASIC queues and DDS, SURVEY.md §2.4) has
// two hot paths worth native code:
//
//  1. stage_frames: fuse the per-tick gather of C*2 uint8 images into one
//     contiguous float32 [C,2,H,W] tensor (normalize + stack in a single
//     multithreaded pass — feeds jax.device_put).
//  2. sync search: reference-timestamp computation + per-stream
//     closest-frame search over ring buffers of timestamps (the rig's
//     O(streams * queue) scan at 60 Hz).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- staging

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

// ------------------------------------------------------------ sync search

// Reference timestamp = min over streams of each stream's newest timestamp
// (the slowest camera; reference rig.py:336-356). Timestamps are given as a
// ragged layout: ts[offsets[s] .. offsets[s] + counts[s]) per stream,
// oldest-to-newest. Returns NAN if any stream is empty.
double sync_reference_timestamp(const double* ts, const int64_t* offsets,
                                const int64_t* counts, int num_streams) {
  double ref = INFINITY;
  for (int s = 0; s < num_streams; ++s) {
    if (counts[s] <= 0) return NAN;
    double newest = ts[offsets[s] + counts[s] - 1];
    ref = std::min(ref, newest);
  }
  return ref;
}

// For each stream, the index (within the stream) of the timestamp closest
// to target. out_idx[s] = -1 for empty streams. Returns the max |dt|.
double sync_closest_indices(const double* ts, const int64_t* offsets,
                            const int64_t* counts, int num_streams,
                            double target, int64_t* out_idx) {
  double max_dt = 0.0;
  for (int s = 0; s < num_streams; ++s) {
    if (counts[s] <= 0) {
      out_idx[s] = -1;
      continue;
    }
    const double* base = ts + offsets[s];
    // Timestamps are sorted: binary search, then compare neighbors.
    const double* it = std::lower_bound(base, base + counts[s], target);
    int64_t idx = it - base;
    if (idx > 0 &&
        (idx == counts[s] ||
         std::abs(base[idx - 1] - target) <= std::abs(base[idx] - target))) {
      idx -= 1;
    }
    out_idx[s] = idx;
    max_dt = std::max(max_dt, std::abs(base[idx] - target));
  }
  return max_dt;
}

// Count of leading entries older than cutoff, per stream (prune support;
// reference rig.py:490-520).
void sync_prune_counts(const double* ts, const int64_t* offsets,
                       const int64_t* counts, int num_streams, double cutoff,
                       int64_t* out_counts) {
  for (int s = 0; s < num_streams; ++s) {
    const double* base = ts + offsets[s];
    const double* it = std::lower_bound(base, base + counts[s], cutoff);
    out_counts[s] = it - base;
  }
}

}  // extern "C"

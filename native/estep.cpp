// Native (host CPU) implementation of the adaptive-bias E-step.
//
// Role: CPU-pipeline fallback and independent cross-check of the JAX /
// Pallas device kernels. The reference ships a similar component
// (estep/weaklabel.cpp, prebuilt libweaklabel.so) whose defects kept it
// out of production: per-batch double free (weaklabel.cpp:117-118),
// per-pixel max seeded with FLT_MIN — the smallest POSITIVE float — which
// breaks all-negative score maps (weaklabel.cpp:71), stride-2 label
// subsampling when building the tag vector (weaklabel.cpp:24-30), and a
// global-RNG shuffle. This is a from-scratch rewrite with none of those:
// out-of-place, RAII buffers, -inf seeding, full label scan, caller-
// provided class orders.
//
// Semantics follow em_adapt_tpu/ops/estep_oracle.py (itself an exact
// re-derivation of the reference python path, estep.py:33-84).
//
// Build: make -C native   (produces libemadapt_estep.so)

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline float channel_min_lifted(const float* px, const uint8_t* tags, int C,
                                float gmax) {
  // min over channels of (score + (absent ? gmax : 0)) — replicating the
  // oracle's "lift absent channels by the global max" formulation.
  float m = FLT_MAX;
  for (int c = 0; c < C; ++c) {
    float v = px[c] + (tags[c] ? 0.0f : gmax);
    if (v < m) m = v;
  }
  return m;
}

inline float pixel_max(const float* px, int C) {
  float m = -FLT_MAX;
  for (int c = 0; c < C; ++c)
    if (px[c] > m) m = px[c];
  return m;
}

}  // namespace

extern "C" {

// scores:  [B, H, W, C] float32 input (not modified)
// out:     [B, H, W, C] float32 output buffer
// labels:  [B, H, W] int32 ground-truth ids (255 = ignore; any id >= C is
//          dropped after a uint8-style wrap, matching the python cast)
// orders:  [num_iter, C-1] int32 foreground visit order (values 1..C-1)
// bg_p/fg_p: percentile fractions in [0, 1); passed as DOUBLE so the
//          k = int(HW * p) truncation matches the python oracle bit-for-
//          bit (a float32-narrowed p can land the product on the other
//          side of an integer boundary and shift k by 1 — breaking the
//          pixel-identical argmax contract, ops/estep_oracle.py:116-117).
// Returns 0 on success; 1/2 invalid pointers/sizes, 3 invalid orders,
// 4 percentile out of range, 5 allocation failure.
int emadapt_estep(const float* scores, float* out, const int32_t* labels,
                  int32_t B, int32_t H, int32_t W, int32_t C,
                  const int32_t* orders, int32_t num_iter,
                  int32_t suppress_others, float margin_others, double bg_p,
                  double fg_p) {
  if (!scores || !out || !labels || !orders) return 1;
  if (B <= 0 || H <= 0 || W <= 0 || C <= 1 || num_iter < 0) return 2;

  const int64_t HW = int64_t(H) * W;
  const int64_t img_elems = HW * C;
  std::memcpy(out, scores, size_t(B) * img_elems * sizeof(float));

  // Allocation failures must surface as the documented error code, not
  // unwind through the C ABI into ctypes (std::terminate).
  try {

  // Image-level tags from the (uint8-wrapped) label ids.
  std::vector<uint8_t> tags(size_t(B) * C, 0);
  for (int b = 0; b < B; ++b) {
    const int32_t* lab = labels + b * HW;
    uint8_t* t = tags.data() + size_t(b) * C;
    for (int64_t p = 0; p < HW; ++p) {
      uint8_t id = static_cast<uint8_t>(lab[p]);  // python's uint8 cast
      if (id < C) t[id] = 1;
    }
  }

  if (suppress_others) {
    // Global max over the WHOLE batch (oracle/reference semantics).
    float gmax = -FLT_MAX;
    for (int64_t i = 0; i < int64_t(B) * img_elems; ++i)
      if (out[i] > gmax) gmax = out[i];
    for (int b = 0; b < B; ++b) {
      float* img = out + b * img_elems;
      const uint8_t* t = tags.data() + size_t(b) * C;
      for (int64_t p = 0; p < HW; ++p) {
        float* px = img + p * C;
        float pmin = channel_min_lifted(px, t, C, gmax);
        for (int c = 0; c < C; ++c)
          if (!t[c] && px[c] > pmin) px[c] = pmin - margin_others;
      }
    }
  }

  std::vector<double> before(B);
  for (int b = 0; b < B; ++b) {
    const float* img = out + b * img_elems;
    double acc = 0.0;
    for (int64_t p = 0; p < HW; ++p) acc += pixel_max(img + p * C, C);
    before[b] = acc / double(HW);
  }

  const int64_t k_bg = int64_t(double(HW) * bg_p);
  const int64_t k_fg = int64_t(double(HW) * fg_p);
  // Percentiles must leave k strictly inside the buffer: diff[k] is read
  // after nth_element, so k == HW (bg_p >= 1.0) would be an
  // out-of-bounds heap read and nth > end() is UB. The oracle's
  // np.partition(d, k) raises for the same inputs.
  if (bg_p < 0.0 || fg_p < 0.0 || k_bg >= HW || k_fg >= HW) return 4;

  // Validate the visit schedule up front (clean error instead of UB).
  for (int64_t i = 0; i < int64_t(num_iter) * (C - 1); ++i)
    if (orders[i] < 0 || orders[i] >= C) return 3;

  // Images are independent given the shared visit schedule: parallelize
  // the batch across host threads (the reference's kernel was strictly
  // serial — and broken for batch > 1).
  // A bad_alloc thrown inside an OpenMP structured block cannot unwind
  // out of it (libgomp calls std::terminate), so the per-thread scratch
  // allocation is trapped in-thread and surfaced via a flag instead.
  std::atomic<int> alloc_failed{0};
#pragma omp parallel
  {
    std::vector<float> diff;
    bool thread_ok = true;
    try {
      diff.resize(HW);
    } catch (const std::exception&) {
      thread_ok = false;
      alloc_failed.store(1, std::memory_order_relaxed);
    }
#pragma omp for schedule(static)
    for (int b = 0; b < B; ++b) {
      if (!thread_ok) continue;
      float* img = out + b * img_elems;
      for (int it = 0; it < num_iter; ++it) {
        const int32_t* row = orders + int64_t(it) * (C - 1);
        for (int step = 0; step < C; ++step) {
          const int32_t j = (step == 0) ? 0 : row[step - 1];
          if (!tags[size_t(b) * C + j]) continue;
          const int64_t k = (j == 0) ? k_bg : k_fg;
          for (int64_t p = 0; p < HW; ++p) {
            const float* px = img + p * C;
            diff[p] = pixel_max(px, C) - px[j];
          }
          std::nth_element(diff.begin(), diff.begin() + k, diff.end());
          const float th = diff[k];
          for (int64_t p = 0; p < HW; ++p) img[p * C + j] += th;
        }
      }
    }
  }

  if (alloc_failed.load(std::memory_order_relaxed)) return 5;

  for (int b = 0; b < B; ++b) {
    float* img = out + b * img_elems;
    double acc = 0.0;
    for (int64_t p = 0; p < HW; ++p) acc += pixel_max(img + p * C, C);
    const float shift = float(before[b] - acc / double(HW));
    for (int64_t i = 0; i < img_elems; ++i) img[i] += shift;
  }
  return 0;

  } catch (const std::exception&) {
    return 5;  // allocation failure (tags/before vectors)
  }
}

}  // extern "C"

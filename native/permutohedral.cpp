// Permutohedral-lattice high-dimensional Gaussian filtering.
//
// Host-side native component backing the denseCRF bilateral kernel
// (em_adapt_tpu/eval/crf.py). The reference delegates denseCRF to an
// external permutohedral-based tool (reference readme.md:40-44, CRF
// hyperparameters preserved at reference network.py:63); this is a
// from-scratch implementation of the lattice algorithm (Adams, Baek &
// Davis, "Fast High-Dimensional Filtering Using the Permutohedral
// Lattice", 2010): embed d-dim feature points into the hyperplane
// H_d ⊂ R^{d+1}, splat each point barycentrically onto the d+1 vertices
// of its enclosing simplex, blur along each lattice direction with a
// [1,2,1] kernel, and slice back. Approximates filtering with
// exp(-0.5·||fi-fj||²) for unit-std features.
//
// API shape: init/filter/free. Mean-field inference filters 10x with the
// SAME features, so the lattice (simplex vertices, barycentric weights,
// per-axis neighbor tables) is built once and each filter pass is pure
// gather/FMA over the precomputed structure.
//
// Normalization contract: callers append a homogeneous all-ones value
// channel and divide by its filtered result (normalized convolution), so
// any global scale constant of the lattice kernel cancels; this file
// therefore skips the usual (d+1)/2^d style correction factors.
//
// Validated against the brute-force O(n²) kernel oracle in
// tests/test_crf.py (same oracle the bilateral-grid path is measured
// against).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

// Open hashing over int16 lattice keys stored in one flat vector; map
// values are lattice ids, map keys are indices into the same vector (a
// candidate key is appended at index n_lattice, probed, popped if seen).
struct KeyHash {
  const std::vector<int16_t>* keys;
  int d;
  size_t operator()(int32_t idx) const {
    const int16_t* k = keys->data() + static_cast<size_t>(idx) * d;
    uint64_t h = 14695981039346656037ull;
    for (int i = 0; i < d; i++) {
      h ^= static_cast<uint64_t>(static_cast<uint16_t>(k[i]));
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

struct KeyEq {
  const std::vector<int16_t>* keys;
  int d;
  bool operator()(int32_t a, int32_t b) const {
    const int16_t* ka = keys->data() + static_cast<size_t>(a) * d;
    const int16_t* kb = keys->data() + static_cast<size_t>(b) * d;
    return std::memcmp(ka, kb, sizeof(int16_t) * d) == 0;
  }
};

struct Lattice {
  int32_t n = 0;        // number of input points
  int d = 0;            // feature dimension
  int32_t n_lattice = 0;
  std::vector<int32_t> vert;   // [n, d+1] lattice vertex ids per point
  std::vector<float> bary;     // [n, d+1] barycentric weights
  std::vector<int32_t> nplus;  // [d+1, n_lattice] +neighbor id or -1
  std::vector<int32_t> nminus; // [d+1, n_lattice]
  mutable std::vector<float> lat, lat2;  // [n_lattice, c] work buffers
};

}  // namespace

static Lattice* lattice_init(const float* features, int32_t n, int32_t d) {
  const int dp1 = d + 1;
  std::unique_ptr<Lattice> owned(new Lattice);
  Lattice* L = owned.get();
  L->n = n;
  L->d = d;
  L->vert.resize(static_cast<size_t>(n) * dp1);
  L->bary.resize(static_cast<size_t>(n) * dp1);

  // Embedding scale: per-axis factors so that unit-std features map to a
  // lattice where the splat+blur kernel approximates exp(-0.5||Δf||²).
  std::vector<float> scale(d);
  for (int i = 0; i < d; i++)
    scale[i] = (d + 1) * std::sqrt(2.0f / 3.0f) /
               std::sqrt(float(i + 1) * (i + 2));

  std::vector<int16_t> keys;  // [n_lattice, d]
  keys.reserve(static_cast<size_t>(n) * d);
  std::unordered_map<int32_t, int32_t, KeyHash, KeyEq> table(
      static_cast<size_t>(n) * 2, KeyHash{&keys, d}, KeyEq{&keys, d});

  std::vector<float> elevated(dp1);
  std::vector<int> rem0(dp1), rank(dp1);
  std::vector<float> barycentric(d + 2);

  for (int32_t p = 0; p < n; p++) {
    const float* f = features + static_cast<size_t>(p) * d;
    // Elevate onto H_d via the rotated canonical basis (O(d) recurrence).
    float sm = 0.0f;
    for (int i = d; i > 0; i--) {
      float cf = f[i - 1] * scale[i - 1];
      elevated[i] = sm - i * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Closest 0-colored lattice point: round to multiples of d+1.
    int sum = 0;
    for (int i = 0; i <= d; i++) {
      float v = elevated[i] / dp1;
      int up = static_cast<int>(std::ceil(v)) * dp1;
      int down = static_cast<int>(std::floor(v)) * dp1;
      rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
      sum += rem0[i];
    }
    sum /= dp1;

    // Rank of each coordinate's residual (descending order index).
    std::fill(rank.begin(), rank.end(), 0);
    for (int i = 0; i < d; i++)
      for (int j = i + 1; j <= d; j++) {
        if (elevated[i] - rem0[i] < elevated[j] - rem0[j])
          rank[i]++;
        else
          rank[j]++;
      }

    // Walk back onto H_d (coordinates must sum to zero).
    for (int i = 0; i <= d; i++) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += dp1;
        rem0[i] += dp1;
      } else if (rank[i] > d) {
        rank[i] -= dp1;
        rem0[i] -= dp1;
      }
    }

    // Barycentric coordinates inside the simplex.
    std::fill(barycentric.begin(), barycentric.end(), 0.0f);
    for (int i = 0; i <= d; i++) {
      float delta = (elevated[i] - rem0[i]) / dp1;
      barycentric[d - rank[i]] += delta;
      barycentric[d + 1 - rank[i]] -= delta;
    }
    barycentric[0] += 1.0f + barycentric[d + 1];

    // Register the d+1 simplex vertices in the hash table.
    for (int remainder = 0; remainder <= d; remainder++) {
      size_t base = keys.size();
      keys.resize(base + d);
      for (int i = 0; i < d; i++)
        keys[base + i] = static_cast<int16_t>(
            rem0[i] + remainder - (rank[i] >= dp1 - remainder ? dp1 : 0));
      int32_t cand = L->n_lattice;
      auto it = table.find(cand);
      int32_t id;
      if (it == table.end()) {
        table.emplace(cand, cand);
        id = L->n_lattice++;
      } else {
        keys.resize(base);
        id = it->second;
      }
      L->vert[static_cast<size_t>(p) * dp1 + remainder] = id;
      L->bary[static_cast<size_t>(p) * dp1 + remainder] =
          barycentric[remainder];
    }
  }

  // Per-axis neighbor tables. Neighbor of key K along axis a:
  // K + 1 everywhere except K[a] - d (axis d touches only the implicit
  // last coordinate, i.e. all stored entries +1 / -1).
  const int32_t nl = L->n_lattice;
  L->nplus.assign(static_cast<size_t>(dp1) * nl, -1);
  L->nminus.assign(static_cast<size_t>(dp1) * nl, -1);
  std::vector<int16_t> kbuf(d);
  for (int a = 0; a <= d; a++) {
    for (int32_t id = 0; id < nl; id++) {
      // COPY the key before appending the probe key: keys.resize() can
      // reallocate the vector (reachable whenever capacity == size here,
      // e.g. n=1, d=1), and a raw pointer into the old buffer would be
      // a use-after-free read feeding garbage neighbor topology.
      std::copy(keys.begin() + static_cast<size_t>(id) * d,
                keys.begin() + static_cast<size_t>(id + 1) * d,
                kbuf.begin());
      size_t base = keys.size();
      keys.resize(base + d);
      for (int i = 0; i < d; i++)
        keys[base + i] = static_cast<int16_t>(kbuf[i] + 1);
      if (a < d) keys[base + a] = static_cast<int16_t>(kbuf[a] - d);
      auto it = table.find(nl);
      keys.resize(base);
      if (it != table.end())
        L->nplus[static_cast<size_t>(a) * nl + id] = it->second;

      base = keys.size();
      keys.resize(base + d);
      for (int i = 0; i < d; i++)
        keys[base + i] = static_cast<int16_t>(kbuf[i] - 1);
      if (a < d) keys[base + a] = static_cast<int16_t>(kbuf[a] + d);
      it = table.find(nl);
      keys.resize(base);
      if (it != table.end())
        L->nminus[static_cast<size_t>(a) * nl + id] = it->second;
    }
  }
  return owned.release();
}

extern "C" void* emadapt_permutohedral_init(const float* features,  // [n, d]
                                            int32_t n, int32_t d) {
  if (n <= 0 || d <= 0 || d > 16) return nullptr;
  // A std::bad_alloc (large n on a constrained host) must not unwind
  // through the C ABI into ctypes (std::terminate would kill the whole
  // Python process); a null return lets dense_crf's "auto" fall back.
  try {
    return lattice_init(features, n, d);
  } catch (const std::exception&) {
    return nullptr;
  }
}

extern "C" int emadapt_permutohedral_filter(void* lattice,
                                            const float* values,  // [n, c]
                                            float* out,           // [n, c]
                                            int32_t n, int32_t c) {
  auto* L = static_cast<Lattice*>(lattice);
  if (!L || n != L->n || c <= 0) return 1;
  const int d = L->d, dp1 = d + 1;
  const int32_t nl = L->n_lattice;

  try {
    L->lat.assign(static_cast<size_t>(nl) * c, 0.0f);
    L->lat2.resize(static_cast<size_t>(nl) * c);
  } catch (const std::exception&) {
    return 2;  // allocation failure: error code, never unwind into ctypes
  }

  // Splat.
  for (int32_t p = 0; p < n; p++) {
    const float* v = values + static_cast<size_t>(p) * c;
    const int32_t* vt = L->vert.data() + static_cast<size_t>(p) * dp1;
    const float* by = L->bary.data() + static_cast<size_t>(p) * dp1;
    for (int r = 0; r <= d; r++) {
      float w = by[r];
      float* slot = L->lat.data() + static_cast<size_t>(vt[r]) * c;
      for (int ch = 0; ch < c; ch++) slot[ch] += w * v[ch];
    }
  }

  // Blur along each axis: v' = 0.5 v + 0.25 (v+ + v-).
  for (int a = 0; a <= d; a++) {
    const int32_t* np_ = L->nplus.data() + static_cast<size_t>(a) * nl;
    const int32_t* nm_ = L->nminus.data() + static_cast<size_t>(a) * nl;
#pragma omp parallel for schedule(static)
    for (int32_t id = 0; id < nl; id++) {
      const float* self = L->lat.data() + static_cast<size_t>(id) * c;
      const float* vp =
          np_[id] >= 0 ? L->lat.data() + static_cast<size_t>(np_[id]) * c
                       : nullptr;
      const float* vm =
          nm_[id] >= 0 ? L->lat.data() + static_cast<size_t>(nm_[id]) * c
                       : nullptr;
      float* dst = L->lat2.data() + static_cast<size_t>(id) * c;
      for (int ch = 0; ch < c; ch++) {
        float acc = 0.5f * self[ch];
        if (vp) acc += 0.25f * vp[ch];
        if (vm) acc += 0.25f * vm[ch];
        dst[ch] = acc;
      }
    }
    L->lat.swap(L->lat2);
  }

  // Slice.
#pragma omp parallel for schedule(static)
  for (int32_t p = 0; p < n; p++) {
    float* o = out + static_cast<size_t>(p) * c;
    const int32_t* vt = L->vert.data() + static_cast<size_t>(p) * dp1;
    const float* by = L->bary.data() + static_cast<size_t>(p) * dp1;
    for (int ch = 0; ch < c; ch++) o[ch] = 0.0f;
    for (int r = 0; r <= d; r++) {
      float w = by[r];
      const float* slot = L->lat.data() + static_cast<size_t>(vt[r]) * c;
      for (int ch = 0; ch < c; ch++) o[ch] += w * slot[ch];
    }
  }
  return 0;
}

extern "C" void emadapt_permutohedral_free(void* lattice) {
  delete static_cast<Lattice*>(lattice);
}

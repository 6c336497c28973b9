// graphcore — native host-side graph construction kernels.
//
// TPU-native replacement for the reference's pip-wheel native dependencies
// on the *host* side of the pipeline (SURVEY.md §2b): torch_cluster's
// CUDA radius search and PyG's C++-assisted batch collation.  The TPU compute
// path stays JAX/Pallas; these kernels feed it arrays.
//
//   - radius_graph: uniform cell-list neighbour search, O(N * avg_neighbors);
//     emits both directions of each pair within r (strict), no self loops —
//     matching PyG radius_graph semantics used at
//     reference datasets/simulation/dataset.py:80.
//   - sort_by_key: index argsort of int32 keys (CSR edge ordering).
//   - bincount: in-degree counting for cached per-destination counts.
//
// Built as a plain shared library, bound via ctypes (no pybind11 in image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// Count + emit edges (i, j) with 0 < |x_i - x_j| < r. Two-phase API:
// first call with out_dst == nullptr to get the count, then with buffers.
// Returns the number of directed edges.
int64_t radius_graph(const float* loc, int64_t n, float r,
                     int32_t* out_dst, int32_t* out_src,
                     int64_t capacity) {
  if (n <= 0) return 0;
  float min_c[3] = {loc[0], loc[1], loc[2]};
  float max_c[3] = {loc[0], loc[1], loc[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      const float v = loc[i * 3 + d];
      min_c[d] = std::min(min_c[d], v);
      max_c[d] = std::max(max_c[d], v);
    }
  }
  const float cell = std::max(r, 1e-12f);
  int64_t dims[3];
  for (int d = 0; d < 3; ++d) {
    dims[d] = std::max<int64_t>(
        1, static_cast<int64_t>((max_c[d] - min_c[d]) / cell) + 1);
    dims[d] = std::min<int64_t>(dims[d], 1 << 20);
  }
  const int64_t n_cells = dims[0] * dims[1] * dims[2];

  auto cell_of = [&](int64_t i, int64_t* c) {
    for (int d = 0; d < 3; ++d) {
      int64_t k = static_cast<int64_t>((loc[i * 3 + d] - min_c[d]) / cell);
      c[d] = std::min(std::max<int64_t>(k, 0), dims[d] - 1);
    }
  };

  // counting-sort points into cells
  std::vector<int64_t> cell_id(n), head(n_cells + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    cell_of(i, c);
    cell_id[i] = (c[0] * dims[1] + c[1]) * dims[2] + c[2];
    head[cell_id[i] + 1]++;
  }
  std::partial_sum(head.begin(), head.end(), head.begin());
  std::vector<int64_t> order(n), cursor(head.begin(), head.end() - 1);
  for (int64_t i = 0; i < n; ++i) order[cursor[cell_id[i]]++] = i;

  const float r2 = r * r;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    cell_of(i, c);
    for (int64_t dx = -1; dx <= 1; ++dx) {
      const int64_t cx = c[0] + dx;
      if (cx < 0 || cx >= dims[0]) continue;
      for (int64_t dy = -1; dy <= 1; ++dy) {
        const int64_t cy = c[1] + dy;
        if (cy < 0 || cy >= dims[1]) continue;
        for (int64_t dz = -1; dz <= 1; ++dz) {
          const int64_t cz = c[2] + dz;
          if (cz < 0 || cz >= dims[2]) continue;
          const int64_t cc = (cx * dims[1] + cy) * dims[2] + cz;
          for (int64_t p = head[cc]; p < head[cc + 1]; ++p) {
            const int64_t j = order[p];
            if (j == i) continue;
            const float ddx = loc[i * 3] - loc[j * 3];
            const float ddy = loc[i * 3 + 1] - loc[j * 3 + 1];
            const float ddz = loc[i * 3 + 2] - loc[j * 3 + 2];
            const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 < r2 && d2 > 0.0f) {
              if (out_dst != nullptr) {
                if (count >= capacity) return -1;
                out_dst[count] = static_cast<int32_t>(i);
                out_src[count] = static_cast<int32_t>(j);
              }
              ++count;
            }
          }
        }
      }
    }
  }
  return count;
}

// Stable argsort of int32 keys into out_perm (int32 indices).
void sort_by_key(const int32_t* keys, int64_t n, int32_t* out_perm) {
  std::vector<int32_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int32_t a, int32_t b) { return keys[a] < keys[b]; });
  std::copy(idx.begin(), idx.end(), out_perm);
}

// out_counts[k] += 1 for each key k in [0, n_bins); others ignored.
void bincount(const int32_t* keys, int64_t n, int64_t n_bins,
              float* out_counts) {
  for (int64_t i = 0; i < n_bins; ++i) out_counts[i] = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t k = keys[i];
    if (k >= 0 && k < n_bins) out_counts[k] += 1.0f;
  }
}

}  // extern "C"

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

// Stable counting argsort for keys in [0, n_bins): O(n + n_bins).
// Out-of-range keys sort last (stable among themselves).
void counting_argsort(const int32_t* keys, int64_t n, int64_t n_bins,
                      int32_t* out_perm) {
  std::vector<int64_t> off(n_bins + 2, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t k = keys[i];
    const int64_t b = (k >= 0 && k < n_bins) ? k : n_bins;
    ++off[b + 1];
  }
  for (int64_t b = 0; b <= n_bins; ++b) off[b + 1] += off[b];
  for (int64_t i = 0; i < n; ++i) {
    const int32_t k = keys[i];
    const int64_t b = (k >= 0 && k < n_bins) ? k : n_bins;
    out_perm[off[b]++] = static_cast<int32_t>(i);
  }
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

// ---------------------------------------------------------------------------
// v5 edge-kernel packer (see fastegnn_tpu/ops/edge_kernel_v5.py::make_v5_meta
// — this is the same greedy contiguous-window / same-dst-block-superchunk
// algorithm; semantics must stay bit-identical, tested against the python
// implementation).  The python packer costs ~200 ms at Water-3D scale, which
// would serialize with a ~10 ms device step; this runs in a few ms.
//
// Two-phase: call with idsx == nullptr to get n_chunks (slot/superchunk
// counts follow from chunk/G); then call again with output buffers sized
// idsx[8 * n_chunks * chunk], w0[n_chunks], sdb[n_chunks / G].
// Returns n_chunks, or -1 if a provided buffer is too small
// (capacity_chunks < n_chunks).

namespace {
struct V5Run {            // a contiguous slice of sorted edges in one chunk
  int64_t pos;            // start in the sorted edge order
  int64_t take;
  int32_t woff;           // src-block offset within the chunk's window
};
struct V5Chunk {
  int32_t db;
  int32_t w0;
  int32_t dw0 = 0;
  std::vector<V5Run> runs;
  int64_t filled = 0;
};
}  // namespace

int64_t pack_v5(const int32_t* dst, const int32_t* src, const float* ea,
                const uint8_t* mask, int64_t n_edges, int64_t fe,
                int64_t num_nodes, int64_t chunk, int64_t W, int64_t G,
                int64_t D, int64_t S, int32_t* idsx, int32_t* w0_out,
                int32_t* dw0_out, int32_t* sdb_out,
                int64_t capacity_chunks) {
  const int64_t kRows = 128;
  const int64_t kSRows = S * kRows;   // dst superblock rows
  const int64_t n_blocks = (num_nodes + kRows - 1) / kRows;
  const int64_t n_sblocks = (num_nodes + kSRows - 1) / kSRows;
  const int64_t max_w0 = n_blocks > W ? n_blocks - W : 0;

  // real edges, stably sorted by (dst_superblock, src_block, dst_local)
  // via counting sort (comparator sorts cost ~140 ms at 580k edges; this
  // is O(E + keys))
  const int64_t n_keys = n_sblocks * n_blocks * kSRows;
  std::vector<int64_t> bucket(n_keys + 1, 0);
  std::vector<int64_t> ekey(n_edges);
  for (int64_t e = 0; e < n_edges; ++e) {
    if (mask[e] && dst[e] < num_nodes) {
      const int64_t k =
          ((static_cast<int64_t>(dst[e]) / kSRows) * n_blocks +
           src[e] / kRows) *
              kSRows +
          dst[e] % kSRows;
      ekey[e] = k;
      ++bucket[k + 1];
    } else {
      ekey[e] = -1;
    }
  }
  for (int64_t k = 0; k < n_keys; ++k) bucket[k + 1] += bucket[k];
  const int64_t m = bucket[n_keys];
  std::vector<int64_t> order(m);
  {
    std::vector<int64_t> fill(bucket.begin(), bucket.end() - 1);
    for (int64_t e = 0; e < n_edges; ++e)
      if (ekey[e] >= 0) order[fill[ekey[e]]++] = e;
  }

  // greedy pack into per-superblock chunk lists
  std::vector<std::vector<V5Chunk>> per_db(n_sblocks);
  V5Chunk cur;
  bool open = false;
  auto close = [&]() {
    if (open && !cur.runs.empty()) per_db[cur.db].push_back(std::move(cur));
    cur = V5Chunk();
    open = false;
  };
  int64_t t0 = 0;
  while (t0 < m) {
    const int32_t tdb = dst[order[t0]] / kSRows;
    const int32_t tsb = src[order[t0]] / kRows;
    int64_t t1 = t0;
    while (t1 < m && dst[order[t1]] / kSRows == tdb &&
           src[order[t1]] / kRows == tsb)
      ++t1;
    int64_t pos = t0;
    while (pos < t1) {
      const int32_t dl = dst[order[pos]] % kSRows;
      if (open && (cur.db != tdb || tsb - cur.w0 >= W || tsb < cur.w0 ||
                   dl - cur.dw0 >= D || dl < cur.dw0))
        close();
      if (!open) {
        cur.db = tdb;
        cur.w0 = static_cast<int32_t>(std::min<int64_t>(tsb, max_w0));
        cur.dw0 = static_cast<int32_t>(
            std::min<int64_t>(dl / 8 * 8, kSRows - D));
        open = true;
      }
      // furthest in-tile edge whose dst row stays inside [dw0, dw0+D)
      // (dst_local ascending within the tile)
      int64_t lim = pos;
      const int32_t dmax = cur.dw0 + static_cast<int32_t>(D);
      while (lim < t1 && dst[order[lim]] % kSRows < dmax) ++lim;
      const int64_t take =
          std::min(chunk - cur.filled, std::min(t1 - pos, lim - pos));
      if (take == 0) {
        close();
        continue;
      }
      cur.runs.push_back({pos, take, static_cast<int32_t>(tsb - cur.w0)});
      cur.filled += take;
      pos += take;
      if (cur.filled == chunk) close();
    }
    t0 = t1;
  }
  close();

  int64_t n_chunks = 0;
  for (int64_t b = 0; b < n_sblocks; ++b) {
    int64_t want = per_db[b].empty() ? 1 : per_db[b].size();
    want = ((want + G - 1) / G) * G;
    n_chunks += want;
  }
  if (idsx == nullptr) return n_chunks;
  if (n_chunks > capacity_chunks) return -1;

  const int64_t n_slots = n_chunks * chunk;
  // rows 0,1 default -1 (sentinel); rows 2..7 default 0
  std::fill(idsx, idsx + 2 * n_slots, -1);
  std::fill(idsx + 2 * n_slots, idsx + 8 * n_slots, 0);
  const int32_t* ea_bits = reinterpret_cast<const int32_t*>(ea);

  int64_t ci = 0;
  for (int64_t b = 0; b < n_sblocks; ++b) {
    int64_t want = per_db[b].empty() ? 1 : per_db[b].size();
    want = ((want + G - 1) / G) * G;
    for (int64_t k = 0; k < want; ++k, ++ci) {
      const bool realc = k < static_cast<int64_t>(per_db[b].size());
      w0_out[ci] = realc ? per_db[b][k].w0 : 0;
      dw0_out[ci] = realc ? per_db[b][k].dw0 : 0;
      if (ci % G == 0) sdb_out[ci / G] = static_cast<int32_t>(b);
      if (!realc) continue;
      const int32_t dw0 = per_db[b][k].dw0;
      int64_t at = ci * chunk;
      for (const V5Run& r : per_db[b][k].runs) {
        for (int64_t i = 0; i < r.take; ++i) {
          const int64_t e = order[r.pos + i];
          const int64_t s = at + i;
          idsx[s] = dst[e] % kSRows - dw0;                 // row 0
          idsx[n_slots + s] = r.woff * kRows + src[e] % kRows;  // row 1
          for (int64_t f = 0; f < fe; ++f)
            idsx[(2 + f) * n_slots + s] = ea_bits[e * fe + f];
        }
        at += r.take;
      }
    }
  }
  return n_chunks;
}

}  // extern "C"

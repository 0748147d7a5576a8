// Native host-side graph builder for sgl_tpu.
//
// On TPU, the SpMM itself is a Pallas kernel (the analog of the reference's
// OpenMP/AVX csrc/matmul.c family); what remains host-bound at
// papers100M scale is *building* the padded-COO graph: sorting billions of
// edges by destination, computing degrees, and producing normalized edge
// weights.  numpy's lexsort is single-threaded; this library does an
// OpenMP-parallel counting sort keyed on dst plus parallel degree /
// normalization passes.  Loaded via ctypes (sgl_tpu/graph/native.py) with a
// transparent numpy fallback when the shared object is missing.
//
// C ABI (all arrays caller-allocated):
//   sgl_sort_edges_by_dst(src, dst, val, n_edges, num_nodes,
//                         out_src, out_dst, out_val)
//   sgl_compute_degrees(src, val, n_edges, num_nodes, out_deg)   // += val
//   sgl_normalized_weights(src, dst, val, n_edges, deg, r, out_w)
//       // w_e = deg[dst_e]^(r-1) * val_e * deg[src_e]^(-r), 0 where deg==0

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_max_threads() { return 1; }
static int omp_get_thread_num() { return 0; }
#endif

extern "C" {

// Parallel stable counting sort of edges by dst.
// Two passes: per-thread histograms over dst, exclusive prefix to get
// per-(thread, bucket) offsets, then a scatter pass.  Stability within a
// dst bucket follows thread-then-index order, which preserves input order.
void sgl_sort_edges_by_dst(const int32_t* src, const int32_t* dst,
                           const float* val, int64_t n_edges,
                           int32_t num_nodes, int32_t* out_src,
                           int32_t* out_dst, float* out_val) {
  const int n_threads = omp_get_max_threads();
  const int64_t nb = static_cast<int64_t>(num_nodes);
  std::vector<int64_t> hist(static_cast<size_t>(n_threads) * nb, 0);

#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    int64_t* h = hist.data() + static_cast<int64_t>(t) * nb;
#pragma omp for schedule(static)
    for (int64_t e = 0; e < n_edges; ++e) {
      ++h[dst[e]];
    }
  }

  // exclusive prefix sum over (bucket-major, thread-minor) so that bucket b,
  // thread t starts at offsets[t * nb + b]
  int64_t running = 0;
  for (int64_t b = 0; b < nb; ++b) {
    for (int t = 0; t < n_threads; ++t) {
      int64_t& h = hist[static_cast<int64_t>(t) * nb + b];
      const int64_t count = h;
      h = running;
      running += count;
    }
  }

#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    int64_t* h = hist.data() + static_cast<int64_t>(t) * nb;
#pragma omp for schedule(static)
    for (int64_t e = 0; e < n_edges; ++e) {
      const int64_t pos = h[dst[e]]++;
      out_src[pos] = src[e];
      out_dst[pos] = dst[e];
      out_val[pos] = val[e];
    }
  }
}

void sgl_compute_degrees(const int32_t* src, const float* val, int64_t n_edges,
                         int32_t num_nodes, float* out_deg) {
#pragma omp parallel
  {
    std::vector<float> local(num_nodes, 0.0f);
#pragma omp for schedule(static)
    for (int64_t e = 0; e < n_edges; ++e) {
      local[src[e]] += val[e];
    }
#pragma omp critical
    {
      for (int32_t i = 0; i < num_nodes; ++i) {
        out_deg[i] += local[i];
      }
    }
  }
}

// Parallel row gather: out[i] = x[idx[i]] for row_bytes-wide rows.
// dtype-agnostic (memcpy); the hot host-side op of the out-of-core SpMM
// (kernels/spmm_ooc.py) — numpy's fancy indexing is single-threaded, this
// is memory-bound and scales with cores on production hosts.
void sgl_gather_rows(const char* x, int64_t row_bytes, const int32_t* idx,
                     int64_t n_idx, char* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + i * row_bytes,
                x + static_cast<int64_t>(idx[i]) * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

void sgl_normalized_weights(const int32_t* src, const int32_t* dst,
                            const float* val, int64_t n_edges,
                            const float* deg, float r, float* out_w) {
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < n_edges; ++e) {
    const float ds = deg[src[e]];
    const float dd = deg[dst[e]];
    if (ds > 0.0f && dd > 0.0f) {
      out_w[e] = std::pow(dd, r - 1.0f) * val[e] * std::pow(ds, -r);
    } else {
      out_w[e] = 0.0f;
    }
  }
}

}  // extern "C"

extern "C" {

// Pack every 2-D (dst-part x src-block) cell's padded chunk arrays in one
// parallel pass over cells.  Inputs are the CELL-SORTED edge arrays (dst
// order preserved within each cell, so each cell's edges arrive tile-
// ordered); per-cell geometry comes as offset arrays computed by the
// caller.  Mirrors the numpy packing loop in prepare_out_of_core_2d —
// one sequential sweep per cell (tile runs, default fills, edge scatter),
// cells parallel via dynamic scheduling (sizes vary by power-of-two
// class).
void sgl_pack_cells_2d(const int32_t* src, const int32_t* dst,
                       const float* w, const int64_t* cell_starts,
                       const int64_t* slot_offs, const int64_t* ct_offs,
                       const int32_t* t_lo_rows, const int32_t* blk_base,
                       int32_t n_cells, int32_t tr, int32_t chunk,
                       int32_t n_tiles, int32_t* o_src, int32_t* o_dst,
                       float* o_w, int32_t* o_ct) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t c = 0; c < n_cells; ++c) {
    const int64_t lo = cell_starts[c], hi = cell_starts[c + 1];
    const int64_t e_b = slot_offs[c + 1] - slot_offs[c];
    const int64_t c_cell = ct_offs[c + 1] - ct_offs[c];
    int32_t* osrc = o_src + slot_offs[c];
    int32_t* odst = o_dst + slot_offs[c];
    float* ow = o_w + slot_offs[c];
    int32_t* oct = o_ct + ct_offs[c];
    std::memset(osrc, 0, static_cast<size_t>(e_b) * sizeof(int32_t));
    std::memset(ow, 0, static_cast<size_t>(e_b) * sizeof(float));
    if (hi <= lo) {  // empty cell: all slots pad against tile 0
      for (int64_t s = 0; s < c_cell; ++s) oct[s] = 0;
      std::memset(odst, 0, static_cast<size_t>(e_b) * sizeof(int32_t));
      continue;
    }
    const int32_t base = t_lo_rows[c];
    const int32_t blk = blk_base[c];
    std::vector<int64_t> counts(n_tiles, 0);
    for (int64_t e = lo; e < hi; ++e) {
      ++counts[(dst[e] - base) / tr];
    }
    int64_t off = 0, ct_pos = 0, epos = lo;
    int32_t last_vis = 0;
    for (int32_t t = 0; t < n_tiles; ++t) {
      if (!counts[t]) continue;
      last_vis = t;
      const int64_t padded = ((counts[t] + chunk - 1) / chunk) * chunk;
      for (int64_t j = 0; j < padded / chunk; ++j) oct[ct_pos++] = t;
      const int32_t row0 = t * tr;
      for (int64_t s = counts[t]; s < padded; ++s) odst[off + s] = row0;
      for (int64_t s = 0; s < counts[t]; ++s, ++epos) {
        osrc[off + s] = src[epos] - blk;
        odst[off + s] = dst[epos] - base;
        ow[off + s] = w[epos];
      }
      off += padded;
    }
    const int32_t pad_row = last_vis * tr;
    for (; ct_pos < c_cell; ++ct_pos) oct[ct_pos] = last_vis;
    for (int64_t s = off; s < e_b; ++s) odst[s] = pad_row;
  }
}

}  // extern "C"

extern "C" {

// Classify + stable-sort 2-D layout edges in two parallel passes: the
// cell key (part_of_tile[dst/tr] * k + src/sb) is computed on the fly
// from the small per-tile part table, so the caller never materializes
// the per-edge tile/part/block/key arrays numpy needed (~5 full passes
// over the edge list at papers100M scale).  Emits the cell-sorted
// (src, dst, dst/tr, w) arrays plus the per-cell histogram.
void sgl_classify_sort_cells_2d(const int32_t* src, const int32_t* dst,
                                const float* w, int64_t n, int32_t tr,
                                int32_t sb, int32_t k,
                                const int32_t* part_of_tile, int32_t n_keys,
                                int32_t* o_src, int32_t* o_dst,
                                int32_t* o_tile, float* o_w,
                                int64_t* o_cell_counts) {
  const int n_threads = omp_get_max_threads();
  const int64_t nk = static_cast<int64_t>(n_keys);
  std::vector<int64_t> hist(static_cast<size_t>(n_threads) * nk, 0);

#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    int64_t* h = hist.data() + static_cast<int64_t>(t) * nk;
#pragma omp for schedule(static)
    for (int64_t e = 0; e < n; ++e) {
      ++h[part_of_tile[dst[e] / tr] * k + src[e] / sb];
    }
  }

  for (int64_t b = 0; b < nk; ++b) {
    int64_t total = 0;
    for (int t = 0; t < n_threads; ++t) {
      total += hist[static_cast<int64_t>(t) * nk + b];
    }
    o_cell_counts[b] = total;
  }
  int64_t running = 0;
  for (int64_t b = 0; b < nk; ++b) {
    for (int t = 0; t < n_threads; ++t) {
      int64_t& h = hist[static_cast<int64_t>(t) * nk + b];
      const int64_t count = h;
      h = running;
      running += count;
    }
  }

#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    int64_t* h = hist.data() + static_cast<int64_t>(t) * nk;
#pragma omp for schedule(static)
    for (int64_t e = 0; e < n; ++e) {
      const int32_t tile = dst[e] / tr;
      const int64_t pos = h[part_of_tile[tile] * k + src[e] / sb]++;
      o_src[pos] = src[e];
      o_dst[pos] = dst[e];
      o_tile[pos] = tile;
      o_w[pos] = w[e];
    }
  }
}

}  // extern "C"

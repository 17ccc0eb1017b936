// graphcore — native host-side graph runtime for gnn_tpu.
//
// The TPU executes the compute path (JAX/XLA/Pallas); this library owns the
// host-side hot paths that sit between dataset and device upload:
//
//   * edge_weights      — aggregation-mode weights (sum/normalized/average);
//                         the reference builds scipy ArcNode matrices instead
//                         (graph_class.py:98-121)
//   * sort_edges_by_dst — stable dst-order permutation for sorted batches
//   * merge_edges       — disjoint-union index offsetting (graph_class.py:304)
//   * build_agg_plan    — block-sparse chunking for the Pallas aggregation
//                         kernel (tile grouping + chunk padding); the
//                         numpy version is O(E log E) python-side and becomes
//                         the batch-prep bottleneck for large datasets
//
// Exposed as a flat C ABI consumed through ctypes (gnn_tpu/native/__init__.py).
// Build: cc -O3 -march=native -shared -fPIC graphcore.cpp -o libgraphcore.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Aggregation weights per edge. mode: 0=sum, 1=normalized, 2=average.
// dst: [e] destination node ids; out_w: [e] float32.
void gc_edge_weights(const int32_t* dst, int64_t e, int64_t n_nodes, int mode,
                     float* out_w) {
  if (mode == 0) {
    std::fill(out_w, out_w + e, 1.0f);
  } else if (mode == 1) {
    const float v = e > 0 ? 1.0f / static_cast<float>(e) : 0.0f;
    std::fill(out_w, out_w + e, v);
  } else {
    std::vector<int32_t> indeg(static_cast<size_t>(n_nodes), 0);
    for (int64_t i = 0; i < e; ++i) indeg[dst[i]]++;
    for (int64_t i = 0; i < e; ++i)
      out_w[i] = 1.0f / static_cast<float>(indeg[dst[i]]);
  }
}

// ---------------------------------------------------------------------------
// Stable permutation sorting edges by destination. out_perm: [e] int64.
void gc_sort_edges_by_dst(const int32_t* dst, int64_t e, int64_t* out_perm) {
  std::iota(out_perm, out_perm + e, int64_t{0});
  std::stable_sort(out_perm, out_perm + e,
                   [dst](int64_t a, int64_t b) { return dst[a] < dst[b]; });
}

// ---------------------------------------------------------------------------
// Accumulate INTRA-block edges into the [B, W, W] block-dense adjacency:
// adj[dst/W][dst%W][src%W] += w (graphs/batch.py::from_graphs_blocked —
// numpy's add.at is an order of magnitude slower). Caller pre-filters to
// intra-block edges and pre-zeroes adj.
void gc_block_adj(const int64_t* src, const int64_t* dst, const float* w,
                  int64_t e, int64_t W, float* adj) {
  for (int64_t i = 0; i < e; ++i) {
    const int64_t d = dst[i];
    adj[(d / W) * W * W + (d % W) * W + (src[i] % W)] += w[i];
  }
}

// ---------------------------------------------------------------------------
// f32 -> bf16 with round-to-nearest-even (matches ml_dtypes / XLA; finite
// inputs — adjacency weights).
static inline uint16_t f32_to_bf16(float x) {
  uint32_t b;
  std::memcpy(&b, &x, 4);
  b += 0x7FFFu + ((b >> 16) & 1u);
  return static_cast<uint16_t>(b >> 16);
}
static inline float bf16_to_f32(uint16_t h) {
  uint32_t b = static_cast<uint32_t>(h) << 16;
  float x;
  std::memcpy(&x, &b, 4);
  return x;
}

// Transpose + bf16 hi/lo pack in one pass (graphs/batch.py fused layout):
// adj [B][d][s] f32 -> out [B][s][2W] bf16 with out[b][s][d] = hi and
// out[b][s][W+d] = lo = RNE(v - hi). Replaces 4 full-array numpy passes.
void gc_pack_hilo_T(const float* adj, int64_t B, int64_t W, uint16_t* out) {
  for (int64_t b = 0; b < B; ++b) {
    const float* a = adj + b * W * W;
    uint16_t* o = out + b * W * 2 * W;
    for (int64_t d = 0; d < W; ++d)
      for (int64_t s = 0; s < W; ++s) {
        const float v = a[d * W + s];
        const uint16_t hi = f32_to_bf16(v);
        o[s * 2 * W + d] = hi;
        o[s * 2 * W + W + d] = f32_to_bf16(v - bf16_to_f32(hi));
      }
  }
}

// ---------------------------------------------------------------------------
// Weighted row scatter-add: out[dst[i], :] += w[i] * vals[i, :]
// (graphs/batch.py::_host_agg — per-node aggregation of edge labels).
// out is pre-zeroed [n, d] f32.
void gc_seg_rows(const float* vals, const float* w, const int64_t* dst,
                 int64_t e, int64_t d, float* out) {
  for (int64_t i = 0; i < e; ++i) {
    float* o = out + dst[i] * d;
    const float* v = vals + i * d;
    const float wi = w[i];
    for (int64_t j = 0; j < d; ++j) o[j] += wi * v[j];
  }
}

// ---------------------------------------------------------------------------
// Disjoint-union merge: offset each graph's src/dst ids by the cumulative
// node count. sizes: [g] edge counts per graph; node_counts: [g].
// src/dst are concatenated edge arrays, modified in place.
void gc_merge_offset(int32_t* src, int32_t* dst, const int64_t* edge_counts,
                     const int64_t* node_counts, int64_t n_graphs) {
  int64_t eo = 0;
  int64_t no = 0;
  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t ec = edge_counts[g];
    for (int64_t i = 0; i < ec; ++i) {
      src[eo + i] += static_cast<int32_t>(no);
      dst[eo + i] += static_cast<int32_t>(no);
    }
    eo += ec;
    no += node_counts[g];
  }
}

// ---------------------------------------------------------------------------
// Block-sparse aggregation plan (see ops/pallas_segment.py). Two-phase API:
// gc_plan_count returns the number of chunks K; gc_plan_fill writes the
// [K, C] slot arrays and [K] chunk block ids.
//
// Edges are grouped by (dst_block, src_block) tile; each tile's edge list is
// padded to a multiple of C.
struct PlanScratch {
  std::vector<int64_t> order;     // edge permutation sorted by tile
  std::vector<int64_t> tile_ids;  // dense tile rank per sorted edge
  std::vector<int64_t> starts;    // first sorted-edge index per tile
  std::vector<int64_t> kper;      // chunks per tile
  int64_t K;
};

static thread_local PlanScratch g_scratch;

int64_t gc_plan_count(const int32_t* src, const int32_t* dst, int64_t e,
                      int64_t block_w, int64_t chunk_c) {
  auto& s = g_scratch;
  s.order.resize(e);
  std::iota(s.order.begin(), s.order.end(), int64_t{0});
  auto key = [&](int64_t i) {
    return (static_cast<int64_t>(dst[i]) / block_w) * (int64_t{1} << 32) +
           (static_cast<int64_t>(src[i]) / block_w);
  };
  std::stable_sort(s.order.begin(), s.order.end(),
                   [&](int64_t a, int64_t b) { return key(a) < key(b); });

  s.tile_ids.resize(e);
  s.starts.clear();
  s.kper.clear();
  int64_t tid = -1;
  int64_t prev_key = INT64_MIN;
  int64_t run = 0;
  for (int64_t i = 0; i < e; ++i) {
    const int64_t k = key(s.order[i]);
    if (k != prev_key) {
      if (tid >= 0) s.kper.push_back((run + chunk_c - 1) / chunk_c);
      prev_key = k;
      ++tid;
      run = 0;
      s.starts.push_back(i);
    }
    s.tile_ids[i] = tid;
    ++run;
  }
  if (tid >= 0) s.kper.push_back((run + chunk_c - 1) / chunk_c);
  s.K = std::accumulate(s.kper.begin(), s.kper.end(), int64_t{0});
  return s.K;
}

// Fill phase. Arrays: src_local/dst_local [K*C] int32, w_out [K*C] float32,
// chunk_src_blk/chunk_dst_blk [K] int32. Must follow gc_plan_count with the
// same (src, dst, block_w, chunk_c).
void gc_plan_fill(const int32_t* src, const int32_t* dst, const float* w,
                  int64_t e, int64_t block_w, int64_t chunk_c,
                  int32_t* src_local, int32_t* dst_local, float* w_out,
                  int32_t* chunk_src_blk, int32_t* chunk_dst_blk) {
  auto& s = g_scratch;
  const int64_t K = s.K;
  std::memset(src_local, 0, sizeof(int32_t) * K * chunk_c);
  std::memset(dst_local, 0, sizeof(int32_t) * K * chunk_c);
  std::memset(w_out, 0, sizeof(float) * K * chunk_c);

  // chunk base offsets per tile
  std::vector<int64_t> base(s.kper.size());
  int64_t acc = 0;
  for (size_t t = 0; t < s.kper.size(); ++t) {
    base[t] = acc;
    acc += s.kper[t];
  }

  for (size_t t = 0; t < s.starts.size(); ++t) {
    const int64_t first = s.order[s.starts[t]];
    for (int64_t k = 0; k < s.kper[t]; ++k) {
      chunk_src_blk[base[t] + k] = static_cast<int32_t>(src[first] / block_w);
      chunk_dst_blk[base[t] + k] = static_cast<int32_t>(dst[first] / block_w);
    }
  }

  std::vector<int64_t> tile_fill(s.kper.size(), 0);
  for (int64_t i = 0; i < e; ++i) {
    const int64_t eid = s.order[i];
    const int64_t t = s.tile_ids[i];
    const int64_t p = tile_fill[t]++;
    const int64_t slotrow = base[t] + p / chunk_c;
    const int64_t slotcol = p % chunk_c;
    src_local[slotrow * chunk_c + slotcol] =
        static_cast<int32_t>(src[eid] % block_w);
    dst_local[slotrow * chunk_c + slotcol] =
        static_cast<int32_t>(dst[eid] % block_w);
    w_out[slotrow * chunk_c + slotcol] = w[eid];
  }
}

// ---------------------------------------------------------------------------
// In-degree histogram (diagnostics / normalisation).
void gc_in_degrees(const int32_t* dst, int64_t e, int64_t n_nodes,
                   int32_t* out_deg) {
  std::memset(out_deg, 0, sizeof(int32_t) * n_nodes);
  for (int64_t i = 0; i < e; ++i) out_deg[dst[i]]++;
}

}  // extern "C"

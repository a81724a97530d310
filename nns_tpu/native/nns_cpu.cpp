// Native host-side components (C ABI, loaded via ctypes — see build.py).
//
// The reference implements these host-side pieces in C++ too: the linear
// scan oracle (core.cu:11-54), the recursive KD-tree build with
// max-variance split + nth_element median (core.cu:1092-1114), and the
// octree build (core.cu:1525-1566). These are fresh implementations with
// the framework's own layouts (flat arrays fit for device upload), OpenMP
// where it pays.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// v0: exact linear scan, lowest-index tie-break, OpenMP over queries.
// ---------------------------------------------------------------------------
void nns_linear_scan(int k, int m, int n, const float* q, const float* r,
                     int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m; ++i) {
    const float* qi = q + (size_t)i * k;
    float best = INFINITY;
    int best_j = 0;
    for (int j = 0; j < n; ++j) {
      const float* rj = r + (size_t)j * k;
      float d = 0.f;
      for (int d_i = 0; d_i < k; ++d_i) {
        float t = qi[d_i] - rj[d_i];
        d += t * t;
      }
      if (d < best) {
        best = d;
        best_j = j;
      }
    }
    out[i] = best_j;
  }
}

// ---------------------------------------------------------------------------
// KD-tree build: implicit heap (root 1, children 2r/2r+1), max-variance
// split dim, median at beg + len/2 via nth_element. perm/dims must hold
// 4 * next_pow2(n) entries; empty slots get -1.
// ---------------------------------------------------------------------------
namespace {

struct KDCtx {
  const float* refs;
  int k;
  int32_t* perm;
  int32_t* dims;
  int64_t heap_len;
};

void kd_rec(KDCtx& ctx, int32_t* idx, int64_t beg, int64_t end, int64_t node,
            int depth) {
  if (beg >= end || node >= ctx.heap_len) return;
  const int k = ctx.k;
  const int64_t len = end - beg;

  // Split dimension = max variance (reference behavior, core.cu:1096-1108).
  int best_d = 0;
  double best_var = -1.0;
  for (int d = 0; d < k; ++d) {
    double s = 0.0, s2 = 0.0;
    for (int64_t i = beg; i < end; ++i) {
      double v = ctx.refs[(size_t)idx[i] * k + d];
      s += v;
      s2 += v * v;
    }
    double var = s2 - s * s / (double)len;
    if (var > best_var) {
      best_var = var;
      best_d = d;
    }
  }

  const int64_t mid = beg + len / 2;
  std::nth_element(idx + beg, idx + mid, idx + end,
                   [&](int32_t a, int32_t b) {
                     return ctx.refs[(size_t)a * k + best_d] <
                            ctx.refs[(size_t)b * k + best_d];
                   });
  ctx.perm[node] = idx[mid];
  ctx.dims[node] = best_d;

  // Parallelize the top of the tree only (task overhead below that).
  if (depth < 4 && len > 4096) {
#pragma omp task shared(ctx)
    kd_rec(ctx, idx, beg, mid, node * 2, depth + 1);
#pragma omp task shared(ctx)
    kd_rec(ctx, idx, mid + 1, end, node * 2 + 1, depth + 1);
#pragma omp taskwait
  } else {
    kd_rec(ctx, idx, beg, mid, node * 2, depth + 1);
    kd_rec(ctx, idx, mid + 1, end, node * 2 + 1, depth + 1);
  }
}

}  // namespace

int nns_kd_build(int k, int n, const float* refs, int32_t* perm,
                 int32_t* dims) {
  int64_t size = 1;
  while (size < n) size <<= 1;
  const int64_t heap_len = 4 * size;
  std::fill(perm, perm + heap_len, -1);
  std::fill(dims, dims + heap_len, 0);
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  KDCtx ctx{refs, k, perm, dims, heap_len};
#pragma omp parallel
  {
#pragma omp single
    kd_rec(ctx, idx.data(), 0, n, 1, 0);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// KD-tree query: per-query iterative best-first descent with hyperplane
// pruning (the reference's ask(), core.cu:1123-1138, made stackless),
// OpenMP over queries. Exact under ties (returns a true nearest neighbor;
// strict-< keeps the first optimum encountered in traversal order).
// ---------------------------------------------------------------------------
void nns_kd_query(int k, int m, int64_t heap_len, const float* refs,
                  const float* queries, const int32_t* perm,
                  const int32_t* dims, int32_t* out) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < m; ++i) {
    const float* q = queries + (size_t)i * k;
    int64_t stack_n[96];
    float stack_b[96];
    int sp = 0;
    stack_n[sp] = 1;
    stack_b[sp++] = 0.f;
    float best = INFINITY;
    int32_t best_i = 0;
    while (sp) {
      --sp;
      const int64_t node = stack_n[sp];
      const float bound = stack_b[sp];
      if (bound >= best) continue;
      const int32_t p = perm[node];
      if (p < 0) continue;
      const float* rp = refs + (size_t)p * k;
      float d = 0.f;
      for (int di = 0; di < k; ++di) {
        const float t = q[di] - rp[di];
        d += t * t;
      }
      if (d < best) {
        best = d;
        best_i = p;
      }
      const int dim = dims[node];
      const float delta = q[dim] - rp[dim];
      const int64_t near_c = 2 * node + (delta >= 0 ? 1 : 0);
      const int64_t far_c = near_c ^ 1;
      if (far_c < heap_len && perm[far_c] >= 0 && delta * delta < best) {
        stack_n[sp] = far_c;
        stack_b[sp++] = delta * delta;
      }
      if (near_c < heap_len && perm[near_c] >= 0) {
        stack_n[sp] = near_c;
        stack_b[sp++] = bound;
      }
    }
    out[i] = best_i;
  }
}

// ---------------------------------------------------------------------------
// Octree query: per-query DFS with cube-distance pruning + leaf scans
// (exact, unlike the reference's 3-face-neighbor heuristic), OpenMP over
// queries (the reference parallelizes octree queries too, core.cu:1654).
// Works on trees from either the native or the numpy build.
// ---------------------------------------------------------------------------
void nns_octree_query(int m, const float* refs, const float* queries,
                      const int32_t* children, const float* centers,
                      const float* radii, const int32_t* starts,
                      const int32_t* counts, const int32_t* order,
                      int32_t* out) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < m; ++i) {
    const float* q = queries + (size_t)i * 3;
    int32_t stack_n[256];
    float stack_b[256];
    int sp = 0;
    stack_n[sp] = 0;
    stack_b[sp++] = 0.f;
    float best = INFINITY;
    int32_t best_i = 0;
    while (sp) {
      --sp;
      const int32_t node = stack_n[sp];
      if (stack_b[sp] >= best) continue;
      const int32_t* ch = children + 8 * (size_t)node;
      bool leaf = true;
      for (int o = 0; o < 8; ++o)
        if (ch[o] >= 0) { leaf = false; break; }
      if (leaf) {
        const int32_t s = starts[node], c = counts[node];
        for (int32_t j = 0; j < c; ++j) {
          const int32_t p = order[s + j];
          const float* rp = refs + (size_t)p * 3;
          float d = 0.f;
          for (int di = 0; di < 3; ++di) {
            const float t = q[di] - rp[di];
            d += t * t;
          }
          if (d < best || (d == best && p < best_i)) {
            best = d;
            best_i = p;
          }
        }
        continue;
      }
      // Compute child bounds; push far-to-near so nearest pops first.
      float cb[8];
      int ord[8];
      int nc = 0;
      for (int o = 0; o < 8; ++o) {
        if (ch[o] < 0) continue;
        const float* cc = centers + 3 * (size_t)ch[o];
        const float cr = radii[ch[o]];
        float b = 0.f;
        for (int di = 0; di < 3; ++di) {
          float g = std::fabs(q[di] - cc[di]) - cr;
          if (g > 0) b += g * g;
        }
        if (b < best) {
          cb[nc] = b;
          ord[nc++] = o;
        }
      }
      for (int a = 1; a < nc; ++a)  // tiny insertion sort, descending bound
        for (int b2 = a; b2 > 0 && cb[b2] > cb[b2 - 1]; --b2) {
          std::swap(cb[b2], cb[b2 - 1]);
          std::swap(ord[b2], ord[b2 - 1]);
        }
      for (int a = 0; a < nc; ++a) {
        stack_n[sp] = ch[ord[a]];
        stack_b[sp++] = cb[a];
      }
    }
    out[i] = best_i;
  }
}

// ---------------------------------------------------------------------------
// Octree build (3-D): linearized nodes — children[8], center, radius (cube
// half extent), leaf point ranges over a permutation array. Same rules as
// the framework's numpy build: octant bit j = (p[j] > c[j]) << j, leaf when
// depth >= max_depth or count <= 1. Returns node count, or -1 on overflow.
// ---------------------------------------------------------------------------
namespace {

struct OctCtx {
  const float* refs;
  int32_t* children;  // (max_nodes, 8)
  float* centers;     // (max_nodes, 3)
  float* radii;
  int32_t* starts;
  int32_t* counts;
  int32_t* order;
  int32_t max_nodes;
  int32_t n_nodes;
  int max_depth;
  int32_t* scratch;  // size n; partition staging (sibling ranges disjoint)
};

int oct_rec(OctCtx& ctx, int64_t beg, int64_t end, int depth) {
  if (ctx.n_nodes >= ctx.max_nodes) return -1;
  const int node = ctx.n_nodes++;
  ctx.starts[node] = (int32_t)beg;
  ctx.counts[node] = (int32_t)(end - beg);
  // Tight f32-SOUND geometry: the node box comes from the node's OWN
  // points (double accumulation), never halved from the parent cube — at
  // large coordinate magnitudes the f32 rounding of a halved center
  // exceeds deep-node nominal radii, and the query's cube-distance prune
  // becomes unsound (misses true neighbors; range-robustness fuzz). The
  // radius is inflated by a few ulps of the coordinate magnitude so
  // |q - c| - r stays a true lower bound under f32 query arithmetic.
  // Tight boxes also prune strictly harder than nominal octant cubes.
  double lo[3] = {INFINITY, INFINITY, INFINITY};
  double hi[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (int64_t i = beg; i < end; ++i) {
    const float* pt = ctx.refs + 3 * (size_t)ctx.order[i];
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], (double)pt[d]);
      hi[d] = std::max(hi[d], (double)pt[d]);
    }
  }
  float c[3];
  double radd = 0.0, cmag = 0.0;
  for (int d = 0; d < 3; ++d) {
    c[d] = (float)((lo[d] + hi[d]) * 0.5);
    radd = std::max(radd, std::max(hi[d] - (double)c[d], (double)c[d] - lo[d]));
    cmag = std::max(cmag, std::fabs((double)c[d]));
  }
  const float rad = (float)(radd + 1.2e-6 * (cmag + radd) + 1e-30);
  std::memcpy(ctx.centers + 3 * (size_t)node, c, 3 * sizeof(float));
  ctx.radii[node] = rad;
  for (int o = 0; o < 8; ++o) ctx.children[8 * (size_t)node + o] = -1;

  if (depth >= ctx.max_depth || end - beg <= 1) return node;  // leaf

  // Partition the order slice into the 8 octants (stable, id-ascending
  // within octant, matching the vectorized numpy build).
  int64_t cnt[8] = {0};
  auto oct_of = [&](int32_t p) {
    const float* pt = ctx.refs + 3 * (size_t)p;
    return ((pt[0] > c[0]) ? 1 : 0) | ((pt[1] > c[1]) ? 2 : 0) |
           ((pt[2] > c[2]) ? 4 : 0);
  };
  for (int64_t i = beg; i < end; ++i) cnt[oct_of(ctx.order[i])]++;
  int64_t offs[9] = {0};
  for (int o = 0; o < 8; ++o) offs[o + 1] = offs[o] + cnt[o];
  // Stage the partition in the shared scratch slice for this range: a
  // per-node std::vector here costs ~1.5M allocations across a 1M-point
  // build (measured ~6 s of the build); sibling ranges are disjoint and a
  // parent's staging is consumed before its children run, so one n-sized
  // scratch indexed by `beg` is race-free in DFS order.
  int32_t* tmp = ctx.scratch + beg;
  int64_t cursor[8];
  std::memcpy(cursor, offs, 8 * sizeof(int64_t));
  for (int64_t i = beg; i < end; ++i) {
    int32_t p = ctx.order[i];
    tmp[cursor[oct_of(p)]++] = p;
  }
  std::memcpy(ctx.order + beg, tmp, (end - beg) * sizeof(int32_t));

  for (int o = 0; o < 8; ++o) {
    if (cnt[o] == 0) continue;
    int child = oct_rec(ctx, beg + offs[o], beg + offs[o + 1], depth + 1);
    if (child < 0) return -1;
    ctx.children[8 * (size_t)node + o] = child;
  }
  return node;
}

}  // namespace

int nns_octree_build(int k, int n, const float* refs, int32_t* children,
                     float* centers, float* radii, int32_t* starts,
                     int32_t* counts, int32_t* order, int max_depth) {
  if (k != 3 || n < 1) return -1;
  for (int i = 0; i < n; ++i) order[i] = i;
  std::vector<int32_t> scratch((size_t)n);
  // max_nodes is implied by the caller's allocation: 4n + 64 (see build.py).
  // Node geometry (incl. the root's) is derived per node from its own
  // points inside oct_rec.
  OctCtx ctx{refs, children, centers, radii, starts, counts, order,
             4 * n + 64, 0, max_depth, scratch.data()};
  if (oct_rec(ctx, 0, n, 0) < 0) return -1;
  return ctx.n_nodes;
}

}  // extern "C" (reopened below — templates cannot have C linkage)

// ---------------------------------------------------------------------------
// Supercell halo build (3-D): enumerate each point's halo-set memberships
// (<= 8 supercells within `halo` of the point) and fill the dense
// (G, R_cap, 3) halo tensors by counting sort — replaces the numpy
// argsort-based build (O(n log n) + fancy indexing) with two O(8n) passes.
// Within each group, slots are in ascending point-id order (outer loop);
// the numpy fallback uses octant-block order — both are valid (same sets).
// ---------------------------------------------------------------------------
namespace {

template <typename F>
inline void cells_for_each_membership(int n, const float* refs, int D,
                                      double halo, const double* mn,
                                      const double* w, F&& fn) {
  for (int p = 0; p < n; ++p) {
    int64_t lo[3], hi[3];
    for (int d = 0; d < 3; ++d) {
      const double rel = (double)refs[3 * (size_t)p + d] - mn[d];
      int64_t l = (int64_t)std::floor((rel - halo) / w[d]);
      int64_t h = (int64_t)std::floor((rel + halo) / w[d]);
      lo[d] = std::min<int64_t>(std::max<int64_t>(l, 0), D - 1);
      hi[d] = std::min<int64_t>(std::max<int64_t>(h, 0), D - 1);
    }
    for (int64_t gx = lo[0];; gx = hi[0]) {
      for (int64_t gy = lo[1];; gy = hi[1]) {
        for (int64_t gz = lo[2];; gz = hi[2]) {
          fn(p, (gx * D + gy) * D + gz);
          if (gz == hi[2]) break;
        }
        if (gy == hi[1]) break;
      }
      if (gx == hi[0]) break;
    }
  }
}

}  // namespace

extern "C" {

int nns_cells_count(int n, const float* refs, int D, double halo,
                    const double* mn, const double* w, int32_t* counts) {
  const int64_t G = (int64_t)D * D * D;
  std::fill(counts, counts + G, 0);
  cells_for_each_membership(n, refs, D, halo, mn, w,
                            [&](int, int64_t gid) { counts[gid]++; });
  return 0;
}

// Query staging: bucket queries by supercell with a stable counting sort.
// Writes packed (m, 5) f32 [qx, qy, qz, sid, slot] in group-sorted order
// plus the permutation (original index per output row). Returns the
// maximum per-group count (q_max before pow2 rounding).
int nns_cells_stage(int m, const float* queries, int D, const double* mn,
                    const double* w, float* packed, int32_t* order) {
  const int64_t G = (int64_t)D * D * D;
  std::vector<int32_t> sid(m);
  std::vector<int32_t> counts(G, 0);
  for (int i = 0; i < m; ++i) {
    int64_t g = 0;
    for (int d = 0; d < 3; ++d) {
      int64_t c = (int64_t)std::floor(((double)queries[3 * (size_t)i + d] - mn[d]) / w[d]);
      c = std::min<int64_t>(std::max<int64_t>(c, 0), D - 1);
      g = g * D + c;
    }
    sid[i] = (int32_t)g;
    counts[g]++;
  }
  int32_t q_max = 0;
  for (int64_t g = 0; g < G; ++g) q_max = std::max(q_max, counts[g]);
  std::vector<int64_t> start(G + 1, 0);
  for (int64_t g = 0; g < G; ++g) start[g + 1] = start[g] + counts[g];
  std::vector<int64_t> cursor(start.begin(), start.end() - 1);
  for (int i = 0; i < m; ++i) {  // stable: ascending original index
    const int32_t g = sid[i];
    const int64_t row = cursor[g]++;
    float* dst = packed + 5 * row;
    const float* src = queries + 3 * (size_t)i;
    dst[0] = src[0];
    dst[1] = src[1];
    dst[2] = src[2];
    dst[3] = (float)g;
    dst[4] = (float)(row - start[g]);
    order[row] = i;
  }
  return q_max;
}

// halo_pts_dm is DIM-MAJOR (G, 3, r_cap) — the exact device layout the scan
// kernel consumes, so the Python side never pays a strided transpose copy.
int nns_cells_fill(int n, const float* refs, int D, double halo,
                   const double* mn, const double* w, int r_cap,
                   float* halo_pts_dm, int32_t* halo_ids) {
  const int64_t G = (int64_t)D * D * D;
  std::vector<int32_t> cursor(G, 0);
  bool overflow = false;
  cells_for_each_membership(
      n, refs, D, halo, mn, w, [&](int p, int64_t gid) {
        const int32_t c = cursor[gid]++;
        if (c >= r_cap) {
          overflow = true;
          return;
        }
        float* base = halo_pts_dm + (size_t)gid * 3 * r_cap + c;
        const float* src = refs + 3 * (size_t)p;
        base[0 * r_cap] = src[0];
        base[1 * r_cap] = src[1];
        base[2 * r_cap] = src[2];
        halo_ids[(size_t)gid * r_cap + c] = p;
      });
  return overflow ? -1 : 0;
}

}  // extern "C"

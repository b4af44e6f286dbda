// pointsec_native: host-side native kernels for the data pipeline.
//
// TPU-native framework equivalent of the reference's C++ layer
// (RandLA-Net/utils/cpp_wrappers grid subsampling and
// utils/nearest_neighbors nanoflann kNN) — written from scratch:
//  - a hash-grid barycenter voxel subsampler (majority-vote labels),
//  - an exact median-split KD-tree with batched, OpenMP-parallel
//    k-nearest-neighbor queries.
// Exposed through a plain C ABI for ctypes (no pybind11 in the image).
//
// These serve the HOST side only (dataset preparation, samplers); the
// on-device hot path uses the XLA/Pallas kNN in pointsecguard_tpu.ops.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------- KD-tree
struct KDTree {
  struct Node {
    float split;
    int axis;       // -1 for leaf
    int left, right;  // children node ids
    int start, count; // leaf range into idx
  };
  const float* pts;  // [n, 3]
  int n;
  std::vector<int> idx;
  std::vector<Node> nodes;
  static constexpr int kLeafSize = 16;

  KDTree(const float* p, int count) : pts(p), n(count), idx(count) {
    for (int i = 0; i < count; ++i) idx[i] = i;
    nodes.reserve(2 * count / kLeafSize + 4);
    build(0, count);
  }

  int build(int start, int count) {
    int id = static_cast<int>(nodes.size());
    nodes.push_back({});
    if (count <= kLeafSize) {
      nodes[id] = {0.f, -1, -1, -1, start, count};
      return id;
    }
    // split on the axis of largest extent at the median
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = start; i < start + count; ++i) {
      const float* q = pts + 3 * idx[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], q[a]);
        hi[a] = std::max(hi[a], q[a]);
      }
    }
    int axis = 0;
    float ext = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > ext) { ext = hi[a] - lo[a]; axis = a; }
    int mid = start + count / 2;
    std::nth_element(
        idx.begin() + start, idx.begin() + mid, idx.begin() + start + count,
        [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    float split = pts[3 * idx[mid] + axis];
    int left = build(start, mid - start);
    int right = build(mid, start + count - mid);
    nodes[id] = {split, axis, left, right, start, count};
    return id;
  }

  // k-best accumulator: simple insertion (k is small, 1..32)
  struct KBest {
    int k;
    std::vector<float> d2;
    std::vector<int> id;
    KBest(int kk) : k(kk), d2(kk, 1e30f), id(kk, -1) {}
    inline float worst() const { return d2[k - 1]; }
    inline void push(float dist2, int i) {
      if (dist2 >= worst()) return;
      int pos = k - 1;
      while (pos > 0 && d2[pos - 1] > dist2) {
        d2[pos] = d2[pos - 1];
        id[pos] = id[pos - 1];
        --pos;
      }
      d2[pos] = dist2;
      id[pos] = i;
    }
  };

  void query_node(int node_id, const float* q, KBest& best) const {
    const Node& nd = nodes[node_id];
    if (nd.axis < 0) {
      for (int i = nd.start; i < nd.start + nd.count; ++i) {
        const float* p = pts + 3 * idx[i];
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        best.push(dx * dx + dy * dy + dz * dz, idx[i]);
      }
      return;
    }
    float diff = q[nd.axis] - nd.split;
    int near = diff < 0 ? nd.left : nd.right;
    int far = diff < 0 ? nd.right : nd.left;
    query_node(near, q, best);
    if (diff * diff < best.worst()) query_node(far, q, best);
  }

  void knn(const float* q, int k, long long* out_idx, float* out_d2) const {
    KBest best(k);
    query_node(0, q, best);
    for (int i = 0; i < k; ++i) {
      out_idx[i] = best.id[i] < 0 ? 0 : best.id[i];
      if (out_d2) out_d2[i] = best.d2[i];
    }
  }
};

}  // namespace

extern "C" {

// Batched exact kNN: for each cloud b, the k nearest support points of
// every query point. support [B, N, 3], query [B, M, 3] (row-major
// float32), out_idx [B, M, K] int64, out_d2 [B, M, K] float32 or null.
void psg_knn_batch(const float* support, int batch, int n, const float* query,
                   int m, int k, long long* out_idx, float* out_d2) {
  for (int b = 0; b < batch; ++b) {
    KDTree tree(support + static_cast<size_t>(b) * n * 3, n);
    const float* q0 = query + static_cast<size_t>(b) * m * 3;
    long long* o0 = out_idx + static_cast<size_t>(b) * m * k;
    float* d0 = out_d2 ? out_d2 + static_cast<size_t>(b) * m * k : nullptr;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int i = 0; i < m; ++i) {
      tree.knn(q0 + 3 * i, k, o0 + static_cast<size_t>(i) * k,
               d0 ? d0 + static_cast<size_t>(i) * k : nullptr);
    }
  }
}

// Single-cloud kNN convenience wrapper.
void psg_knn(const float* support, int n, const float* query, int m, int k,
             long long* out_idx, float* out_d2) {
  psg_knn_batch(support, 1, n, query, m, k, out_idx, out_d2);
}

// Voxel-grid barycenter subsampling. points [n,3] float32;
// features [n,fdim] float32 or null; labels [n] int32 or null.
// Outputs are caller-allocated with capacity n rows; returns the number
// of occupied cells. Majority-vote labels (ties -> smaller label, like
// argmax over a histogram).
int psg_grid_subsample(const float* points, int n, const float* features,
                       int fdim, const int* labels, int num_classes,
                       float sample_dl, float* out_points, float* out_features,
                       int* out_labels) {
  float origin[3] = {1e30f, 1e30f, 1e30f};
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      origin[a] = std::min(origin[a], points[3 * i + a]);

  struct Cell {
    double xyz[3] = {0, 0, 0};
    std::vector<double> feat;
    std::vector<int> hist;
    int count = 0;
    int order = 0;
  };
  std::unordered_map<uint64_t, Cell> cells;
  cells.reserve(n / 4 + 8);

  int next_order = 0;
  for (int i = 0; i < n; ++i) {
    uint64_t key = 0;
    for (int a = 0; a < 3; ++a) {
      int64_t v =
          static_cast<int64_t>(std::floor((points[3 * i + a] - origin[a]) / sample_dl));
      key = key * 1000003u + static_cast<uint64_t>(v + 1);
    }
    Cell& c = cells[key];
    if (c.count == 0) {
      c.order = next_order++;
      if (features) c.feat.assign(fdim, 0.0);
      if (labels) c.hist.assign(num_classes, 0);
    }
    for (int a = 0; a < 3; ++a) c.xyz[a] += points[3 * i + a];
    if (features)
      for (int f = 0; f < fdim; ++f) c.feat[f] += features[static_cast<size_t>(i) * fdim + f];
    if (labels) c.hist[labels[i]]++;
    c.count++;
  }

  // emit in first-seen order (deterministic)
  std::vector<const Cell*> ordered(cells.size());
  for (const auto& kv : cells) ordered[kv.second.order] = &kv.second;
  int out = 0;
  for (const Cell* c : ordered) {
    for (int a = 0; a < 3; ++a)
      out_points[3 * out + a] = static_cast<float>(c->xyz[a] / c->count);
    if (features && out_features)
      for (int f = 0; f < fdim; ++f)
        out_features[static_cast<size_t>(out) * fdim + f] =
            static_cast<float>(c->feat[f] / c->count);
    if (labels && out_labels) {
      int best = 0;
      for (int l = 1; l < num_classes; ++l)
        if (c->hist[l] > c->hist[best]) best = l;
      out_labels[out] = best;
    }
    ++out;
  }
  return out;
}

int psg_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

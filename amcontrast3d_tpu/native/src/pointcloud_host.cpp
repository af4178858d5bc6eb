// Host-side native point-cloud ops (C++17, no external deps).
//
// TPU-native replacements for the reference's CPU extensions:
//  * grid_subsample  ↔ cpp/subsampling/grid_subsampling.cpp:1-106
//      voxel-grid subsampling: barycenter of points/features per occupied
//      voxel, per-dimension majority vote for integer labels.
//  * kdtree KNN      ↔ dataset/semantic_kitti/utils/nearest_neighbors
//      (vendored nanoflann) — here a compact median-split KD-tree with
//      exact best-first k-NN queries for host-side preprocessing.
//
// Exposed via a C ABI and loaded with ctypes (no pybind11 in the image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelAccum {
  int64_t count = 0;
  double px = 0, py = 0, pz = 0;
  std::vector<double> feat;
  std::vector<std::unordered_map<int32_t, int32_t>> label_votes;
};

}  // namespace

extern "C" {

// Returns the number of occupied voxels. Output buffers must hold at least
// n entries (the true count is <= n). Pass features=nullptr / classes=nullptr
// to skip those channels.
int64_t grid_subsample(const float* points, int64_t n, const float* features,
                       int64_t fdim, const int32_t* classes, int64_t ldim,
                       float sampleDl, float* out_points, float* out_features,
                       int32_t* out_classes) {
  if (n <= 0 || sampleDl <= 0) return 0;
  float minx = points[0], miny = points[1], minz = points[2];
  float maxx = minx, maxy = miny, maxz = minz;
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, points[3 * i]);
    miny = std::min(miny, points[3 * i + 1]);
    minz = std::min(minz, points[3 * i + 2]);
    maxx = std::max(maxx, points[3 * i]);
    maxy = std::max(maxy, points[3 * i + 1]);
    maxz = std::max(maxz, points[3 * i + 2]);
  }
  const double inv = 1.0 / sampleDl;
  const double ox = std::floor(minx * inv) * sampleDl;
  const double oy = std::floor(miny * inv) * sampleDl;
  const double oz = std::floor(minz * inv) * sampleDl;
  const int64_t nx = (int64_t)std::floor((maxx - ox) * inv) + 1;
  const int64_t ny = (int64_t)std::floor((maxy - oy) * inv) + 1;

  std::unordered_map<int64_t, VoxelAccum> grid;
  grid.reserve((size_t)n / 4 + 1);
  std::vector<int64_t> order;  // first-seen voxel order → deterministic output
  order.reserve((size_t)n / 4 + 1);

  for (int64_t i = 0; i < n; ++i) {
    const float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
    const int64_t ix = (int64_t)std::floor((x - ox) * inv);
    const int64_t iy = (int64_t)std::floor((y - oy) * inv);
    const int64_t iz = (int64_t)std::floor((z - oz) * inv);
    const int64_t key = ix + nx * iy + nx * ny * iz;
    auto it = grid.find(key);
    if (it == grid.end()) {
      it = grid.emplace(key, VoxelAccum{}).first;
      if (features) it->second.feat.assign((size_t)fdim, 0.0);
      if (classes) it->second.label_votes.resize((size_t)ldim);
      order.push_back(key);
    }
    VoxelAccum& v = it->second;
    v.count += 1;
    v.px += x;
    v.py += y;
    v.pz += z;
    if (features)
      for (int64_t f = 0; f < fdim; ++f) v.feat[(size_t)f] += features[i * fdim + f];
    if (classes)
      for (int64_t l = 0; l < ldim; ++l) v.label_votes[(size_t)l][classes[i * ldim + l]]++;
  }

  int64_t m = 0;
  for (int64_t key : order) {
    const VoxelAccum& v = grid[key];
    const double c = (double)v.count;
    out_points[3 * m] = (float)(v.px / c);
    out_points[3 * m + 1] = (float)(v.py / c);
    out_points[3 * m + 2] = (float)(v.pz / c);
    if (features)
      for (int64_t f = 0; f < fdim; ++f)
        out_features[m * fdim + f] = (float)(v.feat[(size_t)f] / c);
    if (classes) {
      for (int64_t l = 0; l < ldim; ++l) {
        int32_t best_label = 0, best_cnt = -1;
        for (const auto& kv : v.label_votes[(size_t)l]) {
          if (kv.second > best_cnt ||
              (kv.second == best_cnt && kv.first < best_label)) {
            best_cnt = kv.second;
            best_label = kv.first;
          }
        }
        out_classes[m * ldim + l] = best_label;
      }
    }
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// KD-tree exact k-NN (host preprocessing)
// ---------------------------------------------------------------------------

namespace {

struct KDTree {
  // implicit median-split tree over index array
  const float* pts;  // (n, dim)
  int64_t n;
  int dim;
  std::vector<int64_t> idx;

  void build(int64_t lo, int64_t hi, int depth) {
    if (hi - lo <= 1) return;
    const int axis = depth % dim;
    const int64_t mid = (lo + hi) / 2;
    std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                     [&](int64_t a, int64_t b) {
                       return pts[a * dim + axis] < pts[b * dim + axis];
                     });
    build(lo, mid, depth + 1);
    build(mid + 1, hi, depth + 1);
  }

  void query(const float* q, int k, int64_t lo, int64_t hi, int depth,
             std::priority_queue<std::pair<float, int64_t>>& heap) const {
    if (hi <= lo) return;
    const int axis = depth % dim;
    const int64_t mid = (lo + hi) / 2;
    const int64_t p = idx[(size_t)mid];
    float d2 = 0;
    for (int c = 0; c < dim; ++c) {
      const float d = q[c] - pts[p * dim + c];
      d2 += d * d;
    }
    if ((int)heap.size() < k) {
      heap.emplace(d2, p);
    } else if (d2 < heap.top().first) {
      heap.pop();
      heap.emplace(d2, p);
    }
    const float delta = q[axis] - pts[p * dim + axis];
    const int64_t near_lo = delta < 0 ? lo : mid + 1;
    const int64_t near_hi = delta < 0 ? mid : hi;
    const int64_t far_lo = delta < 0 ? mid + 1 : lo;
    const int64_t far_hi = delta < 0 ? hi : mid;
    query(q, k, near_lo, near_hi, depth + 1, heap);
    if ((int)heap.size() < k || delta * delta < heap.top().first)
      query(q, k, far_lo, far_hi, depth + 1, heap);
  }
};

}  // namespace

// Exact k-NN of queries (m, dim) among support (n, dim); writes int64
// indices (m, k) and squared distances (m, k), ascending.
void kdtree_knn(const float* support, int64_t n, const float* queries,
                int64_t m, int dim, int k, int64_t* out_idx,
                float* out_dist2) {
  KDTree tree;
  tree.pts = support;
  tree.n = n;
  tree.dim = dim;
  tree.idx.resize((size_t)n);
  std::iota(tree.idx.begin(), tree.idx.end(), 0);
  tree.build(0, n, 0);

  for (int64_t i = 0; i < m; ++i) {
    std::priority_queue<std::pair<float, int64_t>> heap;
    tree.query(queries + i * dim, k, 0, n, 0, heap);
    int64_t kk = (int64_t)heap.size();
    for (int64_t j = kk - 1; j >= 0; --j) {
      out_idx[i * k + j] = heap.top().second;
      out_dist2[i * k + j] = heap.top().first;
      heap.pop();
    }
    for (int64_t j = kk; j < k; ++j) {  // fewer support points than k
      out_idx[i * k + j] = kk > 0 ? out_idx[i * k] : 0;
      out_dist2[i * k + j] = 1e10f;
    }
  }
}

}  // extern "C"

// Native binned-SAH BVH builder — the performance-critical scene-load step
// (the analogue of corona-13's parallel SAH build, src/accel.d/qbvhmp.c:
// 93-170, 877-1067, which is C with a job queue).  The Python/numpy
// builder in ops/bvh.py is the reference implementation and fallback;
// this one produces the identical flat skip-link layout ~50x faster for
// large scenes.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libbvh.so bvh_build.cc
// ABI:    bvh_build(prim_min[3n], prim_max[3n], n, leaf_size, out...)
// Layout: DFS preorder, binary, binned SAH (16 bins) on the widest
//         centroid axis; leaves hold <= leaf_size prims padded with -1.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

constexpr int SAH_BINS = 16;

struct Builder {
  const float* pmin;
  const float* pmax;
  std::vector<float> cent;
  int leaf_size;

  std::vector<float> node_min, node_max;
  std::vector<int32_t> node_first, node_parent, node_right;
  std::vector<uint8_t> is_right;
  std::vector<int32_t> leaf_prims;

  int emit(const std::vector<int32_t>& idx, int parent, bool right) {
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i : idx)
      for (int k = 0; k < 3; ++k) {
        mn[k] = std::min(mn[k], pmin[3 * i + k]);
        mx[k] = std::max(mx[k], pmax[3 * i + k]);
      }
    node_min.insert(node_min.end(), mn, mn + 3);
    node_max.insert(node_max.end(), mx, mx + 3);
    node_first.push_back(-1);
    node_parent.push_back(parent);
    node_right.push_back(-1);
    is_right.push_back(right);
    return (int)node_first.size() - 1;
  }

  void build(std::vector<int32_t> idx, int parent, bool right) {
    int me = emit(idx, parent, right);
    if ((int)idx.size() <= leaf_size) {
      node_first[me] = (int32_t)leaf_prims.size();
      for (int k = 0; k < leaf_size; ++k)
        leaf_prims.push_back(k < (int)idx.size() ? idx[k] : -1);
      return;
    }
    // widest centroid axis
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i : idx)
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], cent[3 * i + k]);
        hi[k] = std::max(hi[k], cent[3 * i + k]);
      }
    int axis = 0;
    float ext = hi[0] - lo[0];
    for (int k = 1; k < 3; ++k)
      if (hi[k] - lo[k] > ext) { ext = hi[k] - lo[k]; axis = k; }

    std::vector<int32_t> left, rightv;
    if (ext <= 1e-12f) {
      left.assign(idx.begin(), idx.begin() + idx.size() / 2);
      rightv.assign(idx.begin() + idx.size() / 2, idx.end());
    } else {
      // binned SAH
      float bmin[SAH_BINS][3], bmax[SAH_BINS][3];
      int cnt[SAH_BINS] = {0};
      for (auto& b : bmin) b[0] = b[1] = b[2] = 1e30f;
      for (auto& b : bmax) b[0] = b[1] = b[2] = -1e30f;
      auto bin_of = [&](int32_t i) {
        int b = (int)((cent[3 * i + axis] - lo[axis]) / ext * SAH_BINS);
        return std::min(b, SAH_BINS - 1);
      };
      for (int32_t i : idx) {
        int b = bin_of(i);
        ++cnt[b];
        for (int k = 0; k < 3; ++k) {
          bmin[b][k] = std::min(bmin[b][k], pmin[3 * i + k]);
          bmax[b][k] = std::max(bmax[b][k], pmax[3 * i + k]);
        }
      }
      auto area = [](const float* mn, const float* mx) {
        float d[3] = {std::max(mx[0] - mn[0], 0.f),
                      std::max(mx[1] - mn[1], 0.f),
                      std::max(mx[2] - mn[2], 0.f)};
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0];
      };
      float sa_l[SAH_BINS], sa_r[SAH_BINS];
      int cnt_l[SAH_BINS], cnt_r[SAH_BINS];
      {
        float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
        int c = 0;
        for (int b = 0; b < SAH_BINS; ++b) {
          for (int k = 0; k < 3; ++k) {
            mn[k] = std::min(mn[k], bmin[b][k]);
            mx[k] = std::max(mx[k], bmax[b][k]);
          }
          c += cnt[b];
          sa_l[b] = area(mn, mx);
          cnt_l[b] = c;
        }
      }
      {
        float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
        int c = 0;
        for (int b = SAH_BINS - 1; b >= 0; --b) {
          for (int k = 0; k < 3; ++k) {
            mn[k] = std::min(mn[k], bmin[b][k]);
            mx[k] = std::max(mx[k], bmax[b][k]);
          }
          c += cnt[b];
          sa_r[b] = area(mn, mx);
          cnt_r[b] = c;
        }
      }
      int best = -1;
      float best_cost = 1e30f;
      for (int b = 0; b + 1 < SAH_BINS; ++b) {
        if (cnt_l[b] == 0 || cnt_r[b + 1] == 0) continue;
        float c = sa_l[b] * cnt_l[b] + sa_r[b + 1] * cnt_r[b + 1];
        if (c < best_cost) { best_cost = c; best = b; }
      }
      if (best < 0) {
        // all prims in one bin: median split by centroid order
        std::vector<int32_t> sorted = idx;
        std::nth_element(sorted.begin(), sorted.begin() + sorted.size() / 2,
                         sorted.end(), [&](int32_t a, int32_t b2) {
                           return cent[3 * a + axis] < cent[3 * b2 + axis];
                         });
        left.assign(sorted.begin(), sorted.begin() + sorted.size() / 2);
        rightv.assign(sorted.begin() + sorted.size() / 2, sorted.end());
      } else {
        for (int32_t i : idx)
          (bin_of(i) <= best ? left : rightv).push_back(i);
      }
    }
    build(std::move(left), me, false);
    build(std::move(rightv), me, true);
  }
};

}  // namespace

extern "C" {

// First pass: build and report sizes.  Handle is returned for the copy
// pass (single-threaded per-handle usage expected).
void* bvh_build(const float* prim_min, const float* prim_max, int32_t n,
                int32_t leaf_size, int32_t* n_nodes, int32_t* n_slots) {
  auto* b = new Builder();
  b->pmin = prim_min;
  b->pmax = prim_max;
  b->leaf_size = leaf_size;
  b->cent.resize(3 * (size_t)n);
  for (int32_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k)
      b->cent[3 * i + k] = 0.5f * (prim_min[3 * i + k] + prim_max[3 * i + k]);
  std::vector<int32_t> all(n);
  for (int32_t i = 0; i < n; ++i) all[i] = i;
  b->build(std::move(all), -1, false);
  *n_nodes = (int32_t)b->node_first.size();
  *n_slots = (int32_t)b->leaf_prims.size();
  return b;
}

// Second pass: copy out the flat arrays (computing skip links) and free.
void bvh_finish(void* handle, float* node_min, float* node_max,
                int32_t* node_skip, int32_t* node_first, int32_t* node_right,
                int32_t* leaf_prims) {
  auto* b = (Builder*)handle;
  int n = (int)b->node_first.size();
  std::memcpy(node_min, b->node_min.data(), sizeof(float) * 3 * n);
  std::memcpy(node_max, b->node_max.data(), sizeof(float) * 3 * n);
  std::memcpy(node_first, b->node_first.data(), sizeof(int32_t) * n);
  std::memcpy(leaf_prims, b->leaf_prims.data(),
              sizeof(int32_t) * b->leaf_prims.size());
  // right children from parent links
  std::vector<int32_t> right(n, -1);
  for (int i = 1; i < n; ++i)
    if (b->is_right[i]) right[b->node_parent[i]] = i;
  std::memcpy(node_right, right.data(), sizeof(int32_t) * n);
  // skip links: left child -> right sibling; right child -> parent's skip
  node_skip[0] = n;
  for (int i = 1; i < n; ++i) {
    int p = b->node_parent[i];
    node_skip[i] = b->is_right[i]
                       ? node_skip[p]
                       : (right[p] >= 0 ? right[p] : node_skip[p]);
  }
  delete b;
}

}  // extern "C"

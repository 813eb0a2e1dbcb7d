// Connected-component labeling for binary masks: two-pass union-find.
//
// Host-side native replacement for scipy.ndimage.label / skimage.measure.label
// (the reference's CC path: object-localization/object_discovery.py:196,
// extract/extract_utils.py:107-112). The on-device JAX labeler
// (deep_spectral_tpu/ops/morphology.py) covers patch grids; this library covers
// large full-resolution masks on the host where iterative propagation would
// need O(image diameter) sweeps.
//
// Build: g++ -O3 -march=native -shared -fPIC cc_label.cpp -o libcclabel.so
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {  // path compression
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    // Union by minimum root index so every component's root is its first
    // raster-order pixel (gives scipy-compatible label numbering in pass 2).
    if (a < b) parent[b] = a;
    else parent[a] = b;
  }
};

}  // namespace

extern "C" {

// Labels an (h, w) uint8 mask. connectivity: 1 = 4-neighborhood, 2 = 8.
// labels_out: (h*w) int32, 0 = background, components numbered 1..n in
// first-encounter raster order (matching scipy.ndimage.label numbering).
// Returns the number of components.
int32_t cc_label(const uint8_t* mask, int32_t h, int32_t w,
                 int32_t connectivity, int32_t* labels_out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  UnionFind uf(n);
  // Pass 1: union each foreground pixel with its already-visited neighbors.
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = static_cast<int64_t>(y) * w + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) uf.unite(i, i - 1);
      if (y > 0) {
        const int64_t up = i - w;
        if (mask[up]) uf.unite(i, up);
        if (connectivity >= 2) {
          if (x > 0 && mask[up - 1]) uf.unite(i, up - 1);
          if (x < w - 1 && mask[up + 1]) uf.unite(i, up + 1);
        }
      }
    }
  }
  // Pass 2: assign consecutive labels by the raster order of component roots.
  std::vector<int32_t> root_label(n, 0);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!mask[i]) {
      labels_out[i] = 0;
      continue;
    }
    const int32_t r = uf.find(static_cast<int32_t>(i));
    if (root_label[r] == 0) root_label[r] = ++next;
    labels_out[i] = root_label[r];
  }
  return next;
}

// Boolean mask of the largest component (ties -> lowest label). Returns its size.
int64_t largest_component(const uint8_t* mask, int32_t h, int32_t w,
                          int32_t connectivity, uint8_t* out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> labels(n);
  const int32_t num = cc_label(mask, h, w, connectivity, labels.data());
  if (num == 0) {
    std::memset(out, 0, n);
    return 0;
  }
  std::vector<int64_t> sizes(num + 1, 0);
  for (int64_t i = 0; i < n; ++i) sizes[labels[i]]++;
  int32_t best = 1;
  for (int32_t c = 2; c <= num; ++c)
    if (sizes[c] > sizes[best]) best = c;
  for (int64_t i = 0; i < n; ++i) out[i] = labels[i] == best;
  return sizes[best];
}

// Per-label [xmin, ymin, xmax(+1), ymax(+1)] boxes for labels 1..num_labels.
void label_bboxes(const int32_t* labels, int32_t h, int32_t w,
                  int32_t num_labels, int32_t* boxes_out) {
  for (int32_t c = 0; c < num_labels; ++c) {
    boxes_out[c * 4 + 0] = w;   // xmin
    boxes_out[c * 4 + 1] = h;   // ymin
    boxes_out[c * 4 + 2] = 0;   // xmax
    boxes_out[c * 4 + 3] = 0;   // ymax
  }
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t l = labels[static_cast<int64_t>(y) * w + x];
      if (l <= 0 || l > num_labels) continue;
      int32_t* b = boxes_out + static_cast<int64_t>(l - 1) * 4;
      if (x < b[0]) b[0] = x;
      if (y < b[1]) b[1] = y;
      if (x + 1 > b[2]) b[2] = x + 1;
      if (y + 1 > b[3]) b[3] = y + 1;
    }
  }
}

}  // extern "C"

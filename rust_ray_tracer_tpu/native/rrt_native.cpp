// Native host-side runtime: PNG encoding, Morton ordering, LBVH build.
//
// The reference's host runtime is Rust (image crate PNG save,
// /root/reference/src/main.rs:116; pointer-BVH build,
// geometry/mod.rs:161-199). Here the equivalents are C++ exposed through a
// C ABI for ctypes (rust_ray_tracer_tpu/native/__init__.py):
//
//   rrt_png_encode   — RGB8 -> PNG bytes (zlib deflate)
//   rrt_morton_sort  — centroid Morton-code argsort (LBVH front-end)
//   rrt_lbvh_build   — Karras-style binary radix tree over sorted leaves,
//                      emitted as flat index arrays (the layout the
//                      reference's own dead flat-BVH was reaching for,
//                      bvh/mod.rs:14-26) for device-side traversal.
//
// Build: make -C rust_ray_tracer_tpu/native    (g++ + zlib only)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8);
  v.push_back(x);
}

static void put_chunk(std::vector<uint8_t>& out, const char tag[4],
                      const uint8_t* data, size_t n) {
  put_be32(out, (uint32_t)n);
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + n);
  uLong crc = crc32(0L, out.data() + start, (uInt)(n + 4));
  put_be32(out, (uint32_t)crc);
}

// Encode [h, w, 3] u8 into `out` (capacity `cap`); returns bytes written,
// or -1 if the buffer is too small / deflate failed.
long long rrt_png_encode(const uint8_t* rgb, int w, int h,
                         uint8_t* out, long long cap) {
  const size_t stride = (size_t)w * 3;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[(stride + 1) * y] = 0;  // filter: none
    std::memcpy(&raw[(stride + 1) * y + 1], rgb + stride * y, stride);
  }
  uLongf zcap = compressBound((uLong)raw.size());
  std::vector<uint8_t> z(zcap);
  if (compress2(z.data(), &zcap, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  png.reserve(zcap + 128);
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                   '\n'};
  png.insert(png.end(), magic, magic + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", z.data(), zcap);
  put_chunk(png, "IEND", nullptr, 0);

  if ((long long)png.size() > cap) return -1;
  std::memcpy(out, png.data(), png.size());
  return (long long)png.size();
}

// ---------------------------------------------------------------------------
// Morton ordering
// ---------------------------------------------------------------------------

static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

static inline uint32_t morton3(float x, float y, float z) {
  // x, y, z in [0, 1]
  auto q = [](float f) {
    f = f < 0.f ? 0.f : (f > 1.f ? 1.f : f);
    return (uint32_t)(f * 1023.f);
  };
  return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) |
         expand_bits(q(z));
}

static void morton_codes(const float* c, int n, std::vector<uint32_t>& code) {
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], c[3 * i + k]);
      mx[k] = std::max(mx[k], c[3 * i + k]);
    }
  float inv[3];
  for (int k = 0; k < 3; ++k)
    inv[k] = (mx[k] > mn[k]) ? 1.f / (mx[k] - mn[k]) : 0.f;
  code.resize(n);
  for (int i = 0; i < n; ++i)
    code[i] = morton3((c[3 * i] - mn[0]) * inv[0],
                      (c[3 * i + 1] - mn[1]) * inv[1],
                      (c[3 * i + 2] - mn[2]) * inv[2]);
}

// centroids [n,3] f32 -> perm [n] i32 sorting primitives along the Morton
// curve (ties by index: stable).
void rrt_morton_sort(const float* centroids, int n, int32_t* perm) {
  std::vector<uint32_t> code;
  morton_codes(centroids, n, code);
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int32_t a, int32_t b) { return code[a] < code[b]; });
  std::memcpy(perm, idx.data(), n * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// LBVH (binary radix tree over Morton-sorted leaves; Karras 2012 layout)
// ---------------------------------------------------------------------------
//
// Nodes: n-1 internal (ids [0, n-1)), n leaves (ids [n-1, 2n-1) — leaf j
// holds sorted primitive j). Outputs per internal node: left/right child
// ids; per node: AABB (min/max) computed bottom-up.

struct LBVH {
  int n;
  std::vector<int32_t> left, right, parent;
};

static inline int clz64(uint64_t x) {
  return x == 0 ? 64 : __builtin_clzll(x);
}

static void radix_build(const std::vector<uint64_t>& key, LBVH& t) {
  const int n = t.n;
  auto delta = [&](int i, int j) -> int {
    if (j < 0 || j >= n) return -1;
    return clz64(key[i] ^ key[j]);
  };
  for (int i = 0; i < n - 1; ++i) {
    int d = (delta(i, i + 1) - delta(i, i - 1)) >= 0 ? 1 : -1;
    int dmin = delta(i, i - d);
    int lmax = 2;
    while (delta(i, i + lmax * d) > dmin) lmax <<= 1;
    int l = 0;
    for (int s = lmax >> 1; s > 0; s >>= 1)
      if (delta(i, i + (l + s) * d) > dmin) l += s;
    int j = i + l * d;
    int dnode = delta(i, j);
    int split = 0;
    for (int s = (l + 1) / 2;; s = (s + 1) / 2) {
      if (delta(i, i + (split + s) * d) > dnode) split += s;
      if (s == 1) break;
    }
    int gamma = i + split * d + std::min(d, 0);
    int lo = std::min(i, j), hi = std::max(i, j);
    int32_t lchild = (lo == gamma) ? (n - 1 + gamma) : gamma;
    int32_t rchild = (hi == gamma + 1) ? (n - 1 + gamma + 1) : (gamma + 1);
    t.left[i] = lchild;
    t.right[i] = rchild;
    t.parent[lchild] = i;
    t.parent[rchild] = i;
  }
}

// aabb_min/max: [n,3] per (Morton-sorted) primitive. Outputs (sized by the
// caller): left/right [n-1] i32, node_min/node_max [2n-1, 3] f32.
// Node ids: internal [0, n-1), leaves [n-1, 2n-1). Root is node 0.
void rrt_lbvh_build(const float* aabb_min, const float* aabb_max, int n,
                    int32_t* left, int32_t* right, float* node_min,
                    float* node_max) {
  if (n == 1) {  // degenerate: single leaf, no internal nodes
    for (int k = 0; k < 3; ++k) {
      node_min[k] = aabb_min[k];
      node_max[k] = aabb_max[k];
    }
    return;
  }
  // morton keys from centroids, tie-broken by index for unique keys
  std::vector<float> cent(3 * n);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k)
      cent[3 * i + k] = 0.5f * (aabb_min[3 * i + k] + aabb_max[3 * i + k]);
  std::vector<uint32_t> code32;
  morton_codes(cent.data(), n, code32);
  std::vector<uint64_t> key(n);
  for (int i = 0; i < n; ++i)
    key[i] = ((uint64_t)code32[i] << 32) | (uint32_t)i;

  LBVH t;
  t.n = n;
  t.left.assign(n - 1, 0);
  t.right.assign(n - 1, 0);
  t.parent.assign(2 * n - 1, -1);
  radix_build(key, t);
  std::memcpy(left, t.left.data(), (n - 1) * sizeof(int32_t));
  std::memcpy(right, t.right.data(), (n - 1) * sizeof(int32_t));

  // leaf boxes
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      node_min[3 * (n - 1 + i) + k] = aabb_min[3 * i + k];
      node_max[3 * (n - 1 + i) + k] = aabb_max[3 * i + k];
    }
  // bottom-up union via post-order stack (iterative; parent pointers)
  std::vector<int32_t> order;
  order.reserve(n - 1);
  std::vector<int32_t> stack = {0};
  while (!stack.empty()) {
    int32_t node = stack.back();
    stack.pop_back();
    order.push_back(node);
    if (t.left[node] < n - 1) stack.push_back(t.left[node]);
    if (t.right[node] < n - 1) stack.push_back(t.right[node]);
  }
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    int32_t i = *it, l = t.left[i], r = t.right[i];
    for (int k = 0; k < 3; ++k) {
      node_min[3 * i + k] =
          std::min(node_min[3 * l + k], node_min[3 * r + k]);
      node_max[3 * i + k] =
          std::max(node_max[3 * l + k], node_max[3 * r + k]);
    }
  }
}

}  // extern "C"

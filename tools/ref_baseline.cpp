// Measured stand-in for the Rust reference's CPU throughput.
//
// The reference (Safarte/rust-ray-tracer) publishes no numbers and no Rust
// toolchain exists in this image, so bench.py's vs_baseline denominator
// needs a measured estimate. This is an ORIGINAL minimal C++ tracer that
// reproduces the reference's per-ray suzanne workload — median-split BVH
// over the triangle mesh (geometry/mod.rs:161-199), Möller–Trumbore
// closest hit (triangle.rs:38-69), depth-4 Lambertian bounces with the
// 50/50 cosine/light-sphere mixture pdf estimator (ray.rs:102-120,
// pdf.rs:72-95, sphere.rs:101-119), emissive-sphere light + dark
// background (gltf.rs:287-299) — and measures Mrays/s per core, where
// rays = pixel-samples x depth to match bench.py's lane-bounce
// accounting. It deliberately uses a lean flat-array BVH and inlined
// math (no Arc<dyn> virtual dispatch), so it should run AT LEAST as fast
// as the reference's pointer-tree design: the resulting baseline is an
// upper bound, i.e. conservative against us.
//
// Build:  g++ -O3 -march=native -std=c++17 -o /tmp/ref_baseline \
//             tools/ref_baseline.cpp -lpthread
// Run:    /tmp/ref_baseline /tmp/suzanne_tris.f32 [threads]
//         (tris + camera dumped by tools/measure_baseline.py; the camera
//         file /tmp/suzanne_cam.f32 holds [c2w 3x4 row-major, tan(vfov/2),
//         aspect] so rays use the reference's own framing: camera.rs:56-69,
//         unnormalized directions and all)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <thread>
#include <vector>

struct V3 {
  float x = 0, y = 0, z = 0;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline V3 norm(V3 a) {
  float n = std::sqrt(dot(a, a));
  return n > 0 ? a * (1.f / n) : a;
}

struct Tri {
  V3 v0, e1, e2;
};

// xorshift128+ — cheap thread-local RNG (the reference uses thread_rng)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) : s0(seed * 2685821657736338717ull + 1), s1(seed ^ 0x9E3779B97F4A7C15ull) {}
  uint64_t next() {
    uint64_t a = s0, b = s1;
    s0 = b;
    a ^= a << 23;
    s1 = a ^ b ^ (a >> 18) ^ (b >> 5);
    return s1 + b;
  }
  float uf() { return (next() >> 40) * (1.f / 16777216.f); }
};

// ---- flat median-split BVH (same split policy family as the reference's
// BVHNode::new; axis cycles instead of random — equivalent work) ----------
struct Node {
  V3 mn, mx;
  int left = -1, right = -1, start = 0, count = 0;  // leaf if count > 0
};

struct BVH {
  std::vector<Node> nodes;
  std::vector<int> order;
  const std::vector<Tri>* tris = nullptr;

  void bounds(int i, V3& mn, V3& mx) const {
    const Tri& t = (*tris)[order[i]];
    V3 a = t.v0, b = t.v0 + t.e1, c = t.v0 + t.e2;
    mn = {std::fmin(a.x, std::fmin(b.x, c.x)), std::fmin(a.y, std::fmin(b.y, c.y)),
          std::fmin(a.z, std::fmin(b.z, c.z))};
    mx = {std::fmax(a.x, std::fmax(b.x, c.x)), std::fmax(a.y, std::fmax(b.y, c.y)),
          std::fmax(a.z, std::fmax(b.z, c.z))};
  }

  int build(int start, int count, int axis) {
    Node n;
    n.mn = {1e30f, 1e30f, 1e30f};
    n.mx = {-1e30f, -1e30f, -1e30f};
    for (int i = start; i < start + count; ++i) {
      V3 mn, mx;
      bounds(i, mn, mx);
      n.mn = {std::fmin(n.mn.x, mn.x), std::fmin(n.mn.y, mn.y), std::fmin(n.mn.z, mn.z)};
      n.mx = {std::fmax(n.mx.x, mx.x), std::fmax(n.mx.y, mx.y), std::fmax(n.mx.z, mx.z)};
    }
    int id = (int)nodes.size();
    nodes.push_back(n);
    if (count <= 2) {
      nodes[id].start = start;
      nodes[id].count = count;
      return id;
    }
    auto key = [&](int i) {
      const Tri& t = (*tris)[order[i]];
      V3 c = t.v0 + (t.e1 + t.e2) * (1.f / 3.f);
      return axis == 0 ? c.x : axis == 1 ? c.y : c.z;
    };
    std::sort(order.begin() + start, order.begin() + start + count,
              [&](int a, int b) {
                const Tri &ta = (*tris)[a], &tb = (*tris)[b];
                V3 ca = ta.v0 + (ta.e1 + ta.e2) * (1.f / 3.f);
                V3 cb = tb.v0 + (tb.e1 + tb.e2) * (1.f / 3.f);
                float ka = axis == 0 ? ca.x : axis == 1 ? ca.y : ca.z;
                float kb = axis == 0 ? cb.x : axis == 1 ? cb.y : cb.z;
                return ka < kb;
              });
    (void)key;
    int half = count / 2;
    int l = build(start, half, (axis + 1) % 3);
    int r = build(start + half, count - half, (axis + 1) % 3);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }
};

static inline bool slab(const Node& n, V3 o, V3 inv, float tmin, float tmax) {
  float t0 = (n.mn.x - o.x) * inv.x, t1 = (n.mx.x - o.x) * inv.x;
  if (inv.x < 0) std::swap(t0, t1);
  tmin = std::fmax(tmin, t0);
  tmax = std::fmin(tmax, t1);
  t0 = (n.mn.y - o.y) * inv.y;
  t1 = (n.mx.y - o.y) * inv.y;
  if (inv.y < 0) std::swap(t0, t1);
  tmin = std::fmax(tmin, t0);
  tmax = std::fmin(tmax, t1);
  t0 = (n.mn.z - o.z) * inv.z;
  t1 = (n.mx.z - o.z) * inv.z;
  if (inv.z < 0) std::swap(t0, t1);
  tmin = std::fmax(tmin, t0);
  tmax = std::fmin(tmax, t1);
  return tmax >= tmin;
}

struct Hit {
  float t;
  V3 n;
};

static bool closest(const BVH& bvh, const std::vector<Tri>& tris, V3 o, V3 d,
                    float tmin, float tmax, Hit& h) {
  V3 inv = {1.f / (d.x == 0 ? 1e-12f : d.x), 1.f / (d.y == 0 ? 1e-12f : d.y),
            1.f / (d.z == 0 ? 1e-12f : d.z)};
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  bool found = false;
  while (sp) {
    const Node& n = bvh.nodes[stack[--sp]];
    if (!slab(n, o, inv, tmin, tmax)) continue;
    if (n.count) {
      for (int i = n.start; i < n.start + n.count; ++i) {
        const Tri& t = tris[bvh.order[i]];
        // Möller–Trumbore, backface cull (triangle.rs:38-69)
        V3 p = cross(d, t.e2);
        float det = dot(t.e1, p);
        if (det < 1e-5f) continue;
        float idet = 1.f / det;
        V3 tv = o - t.v0;
        float u = dot(tv, p) * idet;
        if (u < 0 || u > 1) continue;
        V3 q = cross(tv, t.e1);
        float v = dot(d, q) * idet;
        if (v < 0 || u + v > 1) continue;
        float tt = dot(t.e2, q) * idet;
        if (tt < tmin || tt > tmax) continue;
        tmax = tt;
        h.t = tt;
        h.n = norm(cross(t.e1, t.e2));
        found = true;
      }
    } else {
      stack[sp++] = n.left;
      stack[sp++] = n.right;
    }
  }
  return found;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s tris.f32 [threads]\n", argv[0]);
    return 1;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<Tri> tris(sz / (9 * sizeof(float)));
  if (std::fread(tris.data(), 1, tris.size() * 9 * sizeof(float), f) !=
      tris.size() * 9 * sizeof(float))
    return 1;
  std::fclose(f);
  int nthreads = argc > 2 ? std::atoi(argv[2]) : (int)std::thread::hardware_concurrency();

  BVH bvh;
  bvh.tris = &tris;
  bvh.order.resize(tris.size());
  for (size_t i = 0; i < tris.size(); ++i) bvh.order[i] = (int)i;
  bvh.build(0, (int)tris.size(), 0);

  // suzanne-rig workload: the actual glTF camera (same framing the
  // reference renders — camera.rs:56-69, unnormalized ray directions);
  // emissive sphere light as in the glTF rig (gltf.rs:287-299)
  const int W = 512, H = 288, SPP = 4, DEPTH = 4;
  float camf[14];
  {
    std::string camPath(argv[1]);
    size_t slash = camPath.rfind('/');
    camPath = camPath.substr(0, slash + 1) + "suzanne_cam.f32";
    FILE* cf = std::fopen(camPath.c_str(), "rb");
    if (!cf || std::fread(camf, sizeof(float), 14, cf) != 14) {
      std::fprintf(stderr, "missing %s (run tools/measure_baseline.py)\n",
                   camPath.c_str());
      return 1;
    }
    std::fclose(cf);
  }
  const float scale = camf[12], aspect = camf[13];
  const V3 c2w_r0 = {camf[0], camf[1], camf[2]};
  const V3 c2w_r1 = {camf[4], camf[5], camf[6]};
  const V3 c2w_r2 = {camf[8], camf[9], camf[10]};
  const V3 eye = {camf[3], camf[7], camf[11]};
  V3 bmn = {1e30f, 1e30f, 1e30f}, bmx = {-1e30f, -1e30f, -1e30f};
  for (const Tri& t : tris) {
    for (V3 c : {t.v0, t.v0 + t.e1, t.v0 + t.e2}) {
      bmn = {std::fmin(bmn.x, c.x), std::fmin(bmn.y, c.y), std::fmin(bmn.z, c.z)};
      bmx = {std::fmax(bmx.x, c.x), std::fmax(bmx.y, c.y), std::fmax(bmx.z, c.z)};
    }
  }
  V3 center = (bmn + bmx) * 0.5f;
  V3 ext = (bmx - bmn) * 0.5f;
  float rad = std::sqrt(dot(ext, ext));
  const V3 lc = center + V3{3.f * rad, 3.f * rad, 2.f * rad};
  const float lr = 0.2f;
  std::atomic<long> row{0};
  std::atomic<long> shaded{0};
  auto worker = [&](int tid) {
    Rng rng(1234567 + tid);
    long local = 0;
    for (;;) {
      long y = row.fetch_add(1);
      if (y >= H) break;
      for (int x = 0; x < W; ++x) {
        for (int s = 0; s < SPP; ++s) {
          // camera.rs:59-68 exactly: jittered ndc, c2w affine, dir
          // left UNNORMALIZED (the reference never normalizes it)
          float px = (2.f * (x + rng.uf() + 0.5f) / W - 1.f) * scale * aspect;
          float py = (2.f * (y + rng.uf() + 0.5f) / H - 1.f) * scale;
          V3 ndc = {px, py, -1.f};
          V3 pt = {dot(c2w_r0, ndc) + eye.x, dot(c2w_r1, ndc) + eye.y,
                   dot(c2w_r2, ndc) + eye.z};
          V3 o = eye;
          V3 d = pt - eye;
          V3 beta = {1, 1, 1};
          for (int depth = 0; depth < DEPTH; ++depth) {
            Hit h;
            if (!closest(bvh, tris, o, d, 1e-4f, 1e30f, h)) break;
            ++local;
            V3 p = o + d * h.t;
            V3 n = dot(h.n, d) < 0 ? h.n : h.n * -1.f;
            // 50/50 mixture: cosine about n / cone toward the light
            V3 w = n;
            V3 a = std::fabs(w.x) > 0.9f ? V3{0, 1, 0} : V3{1, 0, 0};
            V3 t1 = norm(cross(w, a));
            V3 t2 = cross(w, t1);
            V3 nd;
            if (rng.uf() < 0.5f) {
              float r1 = rng.uf(), r2 = rng.uf();
              float phi = 6.2831853f * r1, sr = std::sqrt(r2);
              nd = t1 * (std::cos(phi) * sr) + t2 * (std::sin(phi) * sr) +
                   w * std::sqrt(1 - r2);
            } else {
              V3 tc = lc - p;
              float d2 = dot(tc, tc);
              float cmax = std::sqrt(std::fmax(0.f, 1 - lr * lr / d2));
              float zc = 1 + rng.uf() * (cmax - 1);
              float ph = 6.2831853f * rng.uf();
              float ss = std::sqrt(std::fmax(0.f, 1 - zc * zc));
              V3 lw = norm(tc);
              V3 la = std::fabs(lw.x) > 0.9f ? V3{0, 1, 0} : V3{1, 0, 0};
              V3 lt1 = norm(cross(lw, la));
              V3 lt2 = cross(lw, lt1);
              nd = lt1 * (std::cos(ph) * ss) + lt2 * (std::sin(ph) * ss) + lw * zc;
            }
            // mixture pdf (cosine + solid-angle), scattering pdf, albedo
            float cospdf = std::fmax(dot(nd, w), 0.f) * 0.31830988f;
            V3 tc = lc - p;
            float d2 = dot(tc, tc);
            float cmax = std::sqrt(std::fmax(0.f, 1 - lr * lr / d2));
            float lpdf = 1.f / (6.2831853f * std::fmax(1e-6f, 1 - cmax));
            float pdf = std::fmax(1e-5f, 0.5f * cospdf + 0.5f * lpdf);
            float spdf = cospdf;
            beta = beta * (0.8f * spdf / pdf);
            o = p;
            d = nd;
          }
        }
      }
    }
    shaded += local;
  };
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> ts;
  for (int i = 0; i < nthreads; ++i) ts.emplace_back(worker, i);
  for (auto& t : ts) t.join();
  double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  double lane_rays = (double)W * H * SPP * DEPTH;  // bench.py accounting
  std::printf(
      "{\"threads\": %d, \"tris\": %zu, \"secs\": %.3f, "
      "\"mrays_lane_accounting\": %.2f, \"per_core\": %.2f, "
      "\"segments_traced_mrays\": %.2f}\n",
      nthreads, tris.size(), dt, lane_rays / dt / 1e6,
      lane_rays / dt / 1e6 / nthreads, (double)shaded.load() / dt / 1e6);
  return 0;
}

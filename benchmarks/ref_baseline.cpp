// Same-machine baseline harness: compiles the UPSTREAM reference
// (tiny_bvh.h, included read-only from /root/reference — none of its code
// lives in this repo) and reports its builder speed, SAH cost, and
// single-core traversal rate on the same .bin scenes bench.py uses.
// This pins BENCH_r*.json's `sah_vs_ref` field and the host-build targets
// to numbers measured on THIS machine instead of BASELINE.md estimates.
//
// Build:  g++ -O3 -march=native -std=c++20 -I/root/reference \
//             benchmarks/ref_baseline.cpp -o /tmp/ref_baseline
// Run:    /tmp/ref_baseline /root/reference/testdata/bunny.bin [grid]
//         (optional arg `grid` tiles the scene 2x2 -> 4x the triangles)
#define TINYBVH_IMPLEMENTATION
#include "tiny_bvh.h"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using tinybvh::bvhvec4;
using tinybvh::BVH;

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "/root/reference/testdata/bunny.bin";
  bool grid = argc > 2 && !strcmp(argv[2], "grid");

  FILE *f = fopen(path, "rb");
  if (!f) { printf("{\"error\": \"cannot open %s\"}\n", path); return 1; }
  int n = 0;
  fread(&n, 4, 1, f);
  std::vector<bvhvec4> verts(n * 3);
  fread(verts.data(), 16, (size_t)n * 3, f);
  fclose(f);

  if (grid) {  // 2x2 tiling -> "Sponza-class" tri count from bunny
    float ex = 0, ey = 0, sx = 1e30f, sy = 1e30f;
    for (auto &v : verts) {
      ex = v.x > ex ? v.x : ex; ey = v.y > ey ? v.y : ey;
      sx = v.x < sx ? v.x : sx; sy = v.y < sy ? v.y : sy;
    }
    float dx = (ex - sx) * 1.1f, dy = (ey - sy) * 1.1f;
    size_t base = verts.size();
    verts.resize(base * 4);
    for (int g = 1; g < 4; g++)
      for (size_t i = 0; i < base; i++) {
        bvhvec4 v = verts[i];
        v.x += dx * (g & 1); v.y += dy * (g >> 1);
        verts[base * g + i] = v;
      }
    n *= 4;
  }

  // --- builds ---------------------------------------------------------
  BVH bvh;
  double t0 = now_ms();
  bvh.Build(verts.data(), n);
  double t_build = now_ms() - t0;
  float sah_plain = bvh.SAHCost();

#if defined(BVH_USEAVX)
  BVH bvh_avx;
  t0 = now_ms();
  bvh_avx.BuildAVX(verts.data(), n);
  double t_avx = now_ms() - t0;
  float sah_avx = bvh_avx.SAHCost();
#else
  double t_avx = -1; float sah_avx = -1;
#endif

  BVH bvh_hq;
  t0 = now_ms();
  bvh_hq.BuildHQ(verts.data(), n);
  double t_hq = now_ms() - t0;
  float sah_hq = bvh_hq.SAHCost();

  // --- primary-ray traversal (single core, 640x640, bench.py camera) ---
  float bmin[3] = {1e30f, 1e30f, 1e30f}, bmax[3] = {-1e30f, -1e30f, -1e30f};
  for (auto &v : verts)
    for (int k = 0; k < 3; k++) {
      float c = (&v.x)[k];
      bmin[k] = c < bmin[k] ? c : bmin[k];
      bmax[k] = c > bmax[k] ? c : bmax[k];
    }
  float cx = (bmin[0] + bmax[0]) / 2, cy = (bmin[1] + bmax[1]) / 2,
        cz = (bmin[2] + bmax[2]) / 2;
  float extent = 0;
  for (int k = 0; k < 3; k++)
    extent = bmax[k] - bmin[k] > extent ? bmax[k] - bmin[k] : extent;
  tinybvh::bvhvec3 eye(cx + 0.72f * extent, cy + 0.42f * extent,
                       cz + 1.32f * extent);
  tinybvh::bvhvec3 fwd = tinybvh::tinybvh_normalize(
      tinybvh::bvhvec3(cx, cy, cz) - eye);
  tinybvh::bvhvec3 right = tinybvh::tinybvh_normalize(
      tinybvh::tinybvh_cross(fwd, tinybvh::bvhvec3(0, 1, 0)));
  tinybvh::bvhvec3 up = tinybvh::tinybvh_cross(right, fwd);

  const int W = 640, H = 640;
  int hits = 0;
  t0 = now_ms();
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++) {
      float gx = ((x + 0.5f) / W - 0.5f) * 0.9f;
      float gy = ((y + 0.5f) / H - 0.5f) * 0.9f;
      tinybvh::bvhvec3 d =
          tinybvh_normalize(fwd + right * gx + up * gy);
      tinybvh::Ray ray(eye, d);
      bvh.Intersect(ray);
      hits += ray.hit.t < 1e29f;
    }
  double t_trace = now_ms() - t0;

  printf("{\"scene\": \"%s\", \"n_tris\": %d, "
         "\"build_ms\": %.2f, \"build_mtris_s\": %.3f, \"sah\": %.3f, "
         "\"build_avx_ms\": %.2f, \"avx_mtris_s\": %.3f, \"sah_avx\": %.3f, "
         "\"build_hq_ms\": %.2f, \"sah_hq\": %.3f, "
         "\"trace_mrays_s\": %.3f, \"hit_rate\": %.4f}\n",
         path, n, t_build, n / t_build / 1e3, sah_plain,
         t_avx, n / t_avx / 1e3, sah_avx, t_hq, sah_hq,
         W * H / t_trace / 1e3, (double)hits / (W * H));
  return 0;
}

// Native host-side runtime pieces for mpmvs_tpu.
//
// The TPU framework keeps all compute-path work in XLA/Pallas; these are the
// host-runtime equivalents of the reference's C++ components where exact
// sequential semantics matter or Python overhead would dominate:
//
//   1. mpmvs_fuse_exact: multi-view fusion with the reference's pixel-serial
//      consumed-mask ordering (RunFusion, src/PatchMatch.cpp:287-504). The
//      vectorized JAX fusion (mpmvs_tpu/fusion.py) relaxes within-view
//      ordering; this native path reproduces it exactly for users who need
//      bit-faithful point clouds.
//   2. mpmvs_delaunay: Bowyer-Watson Delaunay triangulation (alternative to
//      scipy/Qhull; the reference uses cv::Subdiv2D).
//
// Built as a plain C-ABI shared library consumed via ctypes (no pybind11).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

struct CameraParams {
  float K[9];
  float R[9];
  float t[3];
};

static inline void world_from_pixel(const CameraParams& c, float x, float y,
                                    float depth, float* X) {
  const float fx = c.K[0], fy = c.K[4], cx = c.K[2], cy = c.K[5];
  const float px = depth * (x - cx) / fx;
  const float py = depth * (y - cy) / fy;
  const float pz = depth;
  // world = R^T * p + C, C = -R^T t
  const float wx = c.R[0] * px + c.R[3] * py + c.R[6] * pz;
  const float wy = c.R[1] * px + c.R[4] * py + c.R[7] * pz;
  const float wz = c.R[2] * px + c.R[5] * py + c.R[8] * pz;
  const float Cx = -(c.R[0] * c.t[0] + c.R[3] * c.t[1] + c.R[6] * c.t[2]);
  const float Cy = -(c.R[1] * c.t[0] + c.R[4] * c.t[1] + c.R[7] * c.t[2]);
  const float Cz = -(c.R[2] * c.t[0] + c.R[5] * c.t[1] + c.R[8] * c.t[2]);
  X[0] = wx + Cx; X[1] = wy + Cy; X[2] = wz + Cz;
}

static inline void project(const CameraParams& c, const float* X, float* pt,
                           float* depth) {
  const float xc = c.R[0] * X[0] + c.R[1] * X[1] + c.R[2] * X[2] + c.t[0];
  const float yc = c.R[3] * X[0] + c.R[4] * X[1] + c.R[5] * X[2] + c.t[1];
  const float zc = c.R[6] * X[0] + c.R[7] * X[1] + c.R[8] * X[2] + c.t[2];
  *depth = c.K[6] * xc + c.K[7] * yc + c.K[8] * zc;
  pt[0] = (c.K[0] * xc + c.K[1] * yc + c.K[2] * zc) / *depth;
  pt[1] = (c.K[3] * xc + c.K[4] * yc + c.K[5] * zc) / *depth;
}

// Exact-order multi-view fusion. Arrays are dense (V, H, W[, 3]) row-major.
// scene_src: flattened source-index lists; scene_off[i]..scene_off[i+1]
// delimits view i's sources (batch indices). sky (V*H*W uint8) may be null.
// Outputs are caller-allocated with capacity cap; returns the point count
// or -1 if capacity was exceeded.
int64_t mpmvs_fuse_exact(
    const float* depths, const float* normals, const float* colors,
    const CameraParams* cams, int32_t V, int32_t H, int32_t W,
    const int32_t* scene_src, const int32_t* scene_off, int32_t num_scenes,
    const int32_t* scene_ref, const uint8_t* sky,
    int32_t use_dynamic,
    float* out_pts, float* out_nrm, float* out_col, int64_t cap) {
  std::vector<uint8_t> masks((size_t)V * H * W, 0);
  const size_t HW = (size_t)H * W;
  int64_t count = 0;
  std::vector<int32_t> used_r, used_c, used_v;

  for (int32_t si = 0; si < num_scenes; ++si) {
    const int32_t i = scene_ref[si];
    const int32_t* srcs = scene_src + scene_off[si];
    const int32_t nsrc = scene_off[si + 1] - scene_off[si];
    const float* depth_i = depths + (size_t)i * HW;
    const float* normal_i = normals + (size_t)i * HW * 3;
    const float* color_i = colors + (size_t)i * HW * 3;
    uint8_t* mask_i = masks.data() + (size_t)i * HW;

    for (int32_t r = 0; r < H; ++r) {
      for (int32_t c = 0; c < W; ++c) {
        const size_t idx = (size_t)r * W + c;
        if (mask_i[idx]) continue;
        if (sky && sky[(size_t)i * HW + idx]) { mask_i[idx] = 1; continue; }
        const float ref_depth = depth_i[idx];
        if (ref_depth <= 0.0f) continue;

        float X[3];
        world_from_pixel(cams[i], (float)c, (float)r, ref_depth, X);
        const float* nr = normal_i + idx * 3;
        float cons_pt[3] = {X[0], X[1], X[2]};
        float cons_n[3] = {nr[0], nr[1], nr[2]};
        float cons_col[3] = {color_i[idx * 3], color_i[idx * 3 + 1],
                             color_i[idx * 3 + 2]};
        int32_t num_consistent = 0;
        float dyn = 0.0f;
        used_r.clear(); used_c.clear(); used_v.clear();

        for (int32_t j = 0; j < nsrc; ++j) {
          // reference quirk: skip the last source if nothing matched yet
          if (j == nsrc - 1 && num_consistent == 0) break;
          const int32_t sj = srcs[j];
          float pt[2], proj_depth;
          project(cams[sj], X, pt, &proj_depth);
          const int32_t sc = (int32_t)(pt[0] + 0.5f);
          const int32_t sr = (int32_t)(pt[1] + 0.5f);
          if (sc < 0 || sc >= W || sr < 0 || sr >= H) continue;
          const size_t sidx = (size_t)sr * W + sc;
          if (masks[(size_t)sj * HW + sidx]) continue;
          const float sd = depths[(size_t)sj * HW + sidx];
          if (sd <= 0.0f) continue;

          float Xs[3];
          world_from_pixel(cams[sj], (float)sc, (float)sr, sd, Xs);
          float bpt[2], bdepth;
          project(cams[i], Xs, bpt, &bdepth);
          const float re = std::sqrt((c - bpt[0]) * (c - bpt[0]) +
                                     (r - bpt[1]) * (r - bpt[1]));
          if (re >= 2.0f) continue;
          const float dd = std::fabs(proj_depth - ref_depth) / ref_depth;
          if (dd >= 0.01f) continue;
          const float* ns = normals + ((size_t)sj * HW + sidx) * 3;
          float dot = nr[0] * ns[0] + nr[1] * ns[1] + nr[2] * ns[2];
          float ang = std::acos(dot);
          if (ang != ang) ang = 0.0f;  // NaN -> identical normals
          if (ang >= 0.174533f) continue;

          cons_pt[0] += Xs[0]; cons_pt[1] += Xs[1]; cons_pt[2] += Xs[2];
          cons_n[0] += ns[0]; cons_n[1] += ns[1]; cons_n[2] += ns[2];
          const float* cs = colors + ((size_t)sj * HW + sidx) * 3;
          cons_col[0] += cs[0]; cons_col[1] += cs[1]; cons_col[2] += cs[2];
          dyn += std::exp(-(re + 200.0f * dd + ang * 10.0f));
          ++num_consistent;
          used_r.push_back(sr); used_c.push_back(sc); used_v.push_back(sj);
        }

        const bool accept = use_dynamic
            ? (num_consistent >= 1 && dyn > 0.3f * num_consistent)
            : (num_consistent >= 2);
        if (!accept) continue;
        if (count >= cap) return -1;
        const float inv = 1.0f / (num_consistent + 1.0f);
        for (int k = 0; k < 3; ++k) {
          out_pts[count * 3 + k] = cons_pt[k] * inv;
          out_nrm[count * 3 + k] = cons_n[k] * inv;
          out_col[count * 3 + k] = cons_col[k] * inv;
        }
        ++count;
        mask_i[idx] = 1;
        for (size_t u = 0; u < used_v.size(); ++u) {
          masks[(size_t)used_v[u] * HW + (size_t)used_r[u] * W + used_c[u]] = 1;
        }
      }
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Bowyer-Watson Delaunay triangulation.
// points: (N, 2) float64; out_tris capacity cap triangles (3 int32 each).
// Returns triangle count or -1 on overflow.

struct Tri { int32_t a, b, c; double cx, cy, r2; bool alive; };

static void circumcircle(const double* p, int32_t a, int32_t b, int32_t c,
                         double* cx, double* cy, double* r2) {
  const double ax = p[a * 2], ay = p[a * 2 + 1];
  const double bx = p[b * 2], by = p[b * 2 + 1];
  const double ccx = p[c * 2], ccy = p[c * 2 + 1];
  const double d = 2.0 * (ax * (by - ccy) + bx * (ccy - ay) + ccx * (ay - by));
  if (std::fabs(d) < 1e-12) { *cx = *cy = 0; *r2 = -1; return; }
  const double a2 = ax * ax + ay * ay, b2 = bx * bx + by * by,
               c2 = ccx * ccx + ccy * ccy;
  *cx = (a2 * (by - ccy) + b2 * (ccy - ay) + c2 * (ay - by)) / d;
  *cy = (a2 * (ccx - bx) + b2 * (ax - ccx) + c2 * (bx - ax)) / d;
  const double dx = ax - *cx, dy = ay - *cy;
  *r2 = dx * dx + dy * dy;
}

int64_t mpmvs_delaunay(const double* points_in, int32_t n,
                       int32_t* out_tris, int64_t cap) {
  if (n < 3) return 0;
  // super-triangle
  double minx = 1e30, miny = 1e30, maxx = -1e30, maxy = -1e30;
  for (int32_t i = 0; i < n; ++i) {
    minx = std::fmin(minx, points_in[i * 2]);
    maxx = std::fmax(maxx, points_in[i * 2]);
    miny = std::fmin(miny, points_in[i * 2 + 1]);
    maxy = std::fmax(maxy, points_in[i * 2 + 1]);
  }
  const double dmax = std::fmax(maxx - minx, maxy - miny) * 20.0 + 1.0;
  const double midx = 0.5 * (minx + maxx), midy = 0.5 * (miny + maxy);
  std::vector<double> pts(points_in, points_in + (size_t)n * 2);
  pts.push_back(midx - dmax); pts.push_back(midy - dmax / 2);
  pts.push_back(midx + dmax); pts.push_back(midy - dmax / 2);
  pts.push_back(midx); pts.push_back(midy + dmax);

  std::vector<Tri> tris;
  auto add_tri = [&](int32_t a, int32_t b, int32_t c) {
    Tri t{a, b, c, 0, 0, 0, true};
    circumcircle(pts.data(), a, b, c, &t.cx, &t.cy, &t.r2);
    tris.push_back(t);
  };
  add_tri(n, n + 1, n + 2);

  std::vector<std::pair<int32_t, int32_t>> poly;
  for (int32_t ip = 0; ip < n; ++ip) {
    const double px = pts[ip * 2], py = pts[ip * 2 + 1];
    poly.clear();
    for (auto& t : tris) {
      if (!t.alive || t.r2 < 0) continue;
      const double dx = px - t.cx, dy = py - t.cy;
      if (dx * dx + dy * dy <= t.r2) {
        t.alive = false;
        const int32_t e[3][2] = {{t.a, t.b}, {t.b, t.c}, {t.c, t.a}};
        for (auto& ed : e) {
          bool shared = false;
          for (auto& pe : poly) {
            if ((pe.first == ed[1] && pe.second == ed[0]) ||
                (pe.first == ed[0] && pe.second == ed[1])) {
              pe.first = -1; shared = true; break;
            }
          }
          if (!shared) poly.push_back({ed[0], ed[1]});
        }
      }
    }
    for (auto& pe : poly) {
      if (pe.first < 0) continue;
      add_tri(pe.first, pe.second, ip);
    }
    // periodically compact
    if (tris.size() > 4096) {
      std::vector<Tri> keep;
      keep.reserve(tris.size());
      for (auto& t : tris) if (t.alive) keep.push_back(t);
      tris.swap(keep);
    }
  }

  int64_t cnt = 0;
  for (auto& t : tris) {
    if (!t.alive) continue;
    if (t.a >= n || t.b >= n || t.c >= n) continue;  // touches super-tri
    if (cnt >= cap) return -1;
    out_tris[cnt * 3] = t.a; out_tris[cnt * 3 + 1] = t.b;
    out_tris[cnt * 3 + 2] = t.c;
    ++cnt;
  }
  return cnt;
}

}  // extern "C"

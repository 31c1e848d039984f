// Native host engine: batched f64 polygon-vs-rectangle clipping.
//
// Reference parity: the exchange-grid generator is the reference's one
// unavoidably-native component (CGAL exact intersection in
// GridGen_Exchange.cpp [U]; SURVEY.md "star-NATIVE").  The TPU build's
// device engine is the Pallas kernel (ops/pallas_clip.py); THIS file is the
// host-side f64 engine replacing the vectorized-numpy oracle on the offline
// path (grid build, conservation repair reference): scalar Sutherland--
// Hodgman with compaction per pair, OpenMP across pairs.  ~100x the numpy
// oracle's throughput (no giant intermediate buffers).
//
// Exact same semantics as icebin_tpu/oracle/clip.py: duplicate-padded input
// rings, signed shoelace area, area centroid with degenerate fallback.
//
// Build: native/build.sh (g++ -O3 -fopenmp -shared -fPIC).

#include <cmath>
#include <cstdint>

namespace {

constexpr int kMaxVerts = 1024;

struct Ring {
  double x[kMaxVerts];
  double y[kMaxVerts];
  int n;
};

// Clip ring against half-plane keep: sgn*(axis coord) <= bound.
// axis: 0 = x, 1 = y.  Writes into out, returns vertex count.
inline void clip_half(const Ring& in, Ring& out, int axis, double sgn,
                      double bound) {
  out.n = 0;
  if (in.n == 0) return;
  auto coord = [&](int k) { return axis == 0 ? in.x[k] : in.y[k]; };
  int prev = in.n - 1;
  double dprev = bound - sgn * coord(prev);
  for (int k = 0; k < in.n; ++k) {
    double d = bound - sgn * coord(k);
    bool ins = d >= 0.0, insp = dprev >= 0.0;
    if (ins != insp) {
      double denom = dprev - d;
      double t = (denom != 0.0) ? dprev / denom : 0.0;
      out.x[out.n] = in.x[prev] + t * (in.x[k] - in.x[prev]);
      out.y[out.n] = in.y[prev] + t * (in.y[k] - in.y[prev]);
      ++out.n;
    }
    if (ins) {
      out.x[out.n] = in.x[k];
      out.y[out.n] = in.y[k];
      ++out.n;
    }
    prev = k;
    dprev = d;
  }
}

}  // namespace

extern "C" {

// polys: (n, v0, 2) f64 rings (duplicate padding ok);
// rects: (n, 4) f64 (x0, y0, x1, y1).
// areas: (n,) signed shoelace; cents: (n, 2) area centroids.
void ib_clip_polys_rects(const double* polys, const double* rects,
                         int64_t n, int32_t v0, double* areas,
                         double* cents) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    Ring a, b;
    const double* p = polys + i * v0 * 2;
    a.n = v0;
    for (int k = 0; k < v0; ++k) {
      a.x[k] = p[2 * k];
      a.y[k] = p[2 * k + 1];
    }
    const double* r = rects + i * 4;
    clip_half(a, b, 0, -1.0, -r[0]);   // x >= x0
    clip_half(b, a, 0, 1.0, r[2]);     // x <= x1
    clip_half(a, b, 1, -1.0, -r[1]);   // y >= y0
    clip_half(b, a, 1, 1.0, r[3]);     // y <= y1
    double area2 = 0.0, cx = 0.0, cy = 0.0;
    for (int k = 0; k < a.n; ++k) {
      int k2 = (k + 1 == a.n) ? 0 : k + 1;
      double cr = a.x[k] * a.y[k2] - a.x[k2] * a.y[k];
      area2 += cr;
      cx += (a.x[k] + a.x[k2]) * cr;
      cy += (a.y[k] + a.y[k2]) * cr;
    }
    double area = 0.5 * area2;
    areas[i] = area;
    if (std::fabs(area) > 0.0) {
      cents[2 * i] = cx / (6.0 * area);
      cents[2 * i + 1] = cy / (6.0 * area);
    } else if (a.n > 0) {
      cents[2 * i] = a.x[0];
      cents[2 * i + 1] = a.y[0];
    } else {
      cents[2 * i] = 0.0;
      cents[2 * i + 1] = 0.0;
    }
  }
}

// Sorted-COO duplicate-sum (spsparse accumulator consolidation, reference
// ibmisc spsparse [U]): inputs sorted by (row, col); outputs compacted
// in-place; returns new length.
int64_t ib_coo_sum_sorted(int64_t* rows, int64_t* cols, double* vals,
                          int64_t n) {
  if (n == 0) return 0;
  int64_t w = 0;
  for (int64_t i = 1; i < n; ++i) {
    if (rows[i] == rows[w] && cols[i] == cols[w]) {
      vals[w] += vals[i];
    } else {
      ++w;
      rows[w] = rows[i];
      cols[w] = cols[i];
      vals[w] = vals[i];
    }
  }
  return w + 1;
}

}  // extern "C"

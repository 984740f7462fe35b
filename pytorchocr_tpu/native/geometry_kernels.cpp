// Native geometry kernels for host-side postprocess + metrics.
//
// TPU-native counterpart of the reference's C++ pybind11/OpenCV/Clipper
// module (db_postprocess_fast/src/db_postprocess.cpp): the device handles
// thresholding/labeling/scoring, so the native host surface shrinks to pure
// geometry — convex hull, rotating-calipers min-area-rect, closed-form
// unclip (disk dilation of the hull), and polygon intersection / IoU
// matrices for the ICDAR evaluator.  No OpenCV/Clipper dependency; exposed
// through a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC geometry_kernels.cpp -o libocrgeom.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

static inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew monotone chain; returns hull in CCW order (math coords).
static std::vector<Pt> convex_hull(std::vector<Pt> pts) {
  size_t n = pts.size();
  if (n < 3) return pts;
  std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  std::vector<Pt> hull(2 * n);
  size_t k = 0;
  for (size_t i = 0; i < n; ++i) {  // lower
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) k--;
    hull[k++] = pts[i];
  }
  size_t lower = k + 1;
  for (size_t i = n - 1; i-- > 0;) {  // upper
    while (k >= lower && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) k--;
    hull[k++] = pts[i];
  }
  hull.resize(k - 1);
  return hull;
}

static double poly_area(const std::vector<Pt>& p) {
  double a = 0;
  size_t n = p.size();
  for (size_t i = 0; i < n; ++i) {
    size_t j = (i + 1) % n;
    a += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return 0.5 * a;
}

// Sutherland-Hodgman: clip subject by convex clip polygon (any orientation).
static std::vector<Pt> clip_convex(const std::vector<Pt>& subject,
                                   std::vector<Pt> clip) {
  if (poly_area(clip) < 0) std::reverse(clip.begin(), clip.end());
  std::vector<Pt> output = subject;
  size_t n = clip.size();
  for (size_t i = 0; i < n && !output.empty(); ++i) {
    const Pt& a = clip[i];
    const Pt& b = clip[(i + 1) % n];
    std::vector<Pt> input;
    input.swap(output);
    double ex = b.x - a.x, ey = b.y - a.y;
    Pt prev = input.back();
    double prev_side = ex * (prev.y - a.y) - ey * (prev.x - a.x);
    for (const Pt& cur : input) {
      double cur_side = ex * (cur.y - a.y) - ey * (cur.x - a.x);
      if (cur_side >= 0) {
        if (prev_side < 0) {
          double t = prev_side / (prev_side - cur_side);
          output.push_back({prev.x + t * (cur.x - prev.x),
                            prev.y + t * (cur.y - prev.y)});
        }
        output.push_back(cur);
      } else if (prev_side >= 0) {
        double t = prev_side / (prev_side - cur_side);
        output.push_back({prev.x + t * (cur.x - prev.x),
                          prev.y + t * (cur.y - prev.y)});
      }
      prev = cur;
      prev_side = cur_side;
    }
  }
  return output;
}

static bool is_convex(const std::vector<Pt>& p) {
  size_t n = p.size();
  if (n < 4) return true;
  bool pos = false, neg = false;
  for (size_t i = 0; i < n; ++i) {
    double c = cross(p[i], p[(i + 1) % n], p[(i + 2) % n]);
    if (c > 1e-9) pos = true;
    if (c < -1e-9) neg = true;
    if (pos && neg) return false;
  }
  return true;
}

static std::vector<Pt> to_pts(const float* data, int n) {
  std::vector<Pt> out(n);
  for (int i = 0; i < n; ++i) out[i] = {data[2 * i], data[2 * i + 1]};
  return out;
}

}  // namespace

extern "C" {

// Rotating-calipers min-area rect over n points.
// out: 8 floats (4 corners, arbitrary start, CCW) + out_sside (short side).
// Returns 0 on success.
int min_area_rect(const float* points, int n, float* out, float* out_sside) {
  if (n < 1) return -1;
  std::vector<Pt> hull = convex_hull(to_pts(points, n));
  size_t m = hull.size();
  if (m == 1) {
    for (int i = 0; i < 4; ++i) {
      out[2 * i] = (float)hull[0].x;
      out[2 * i + 1] = (float)hull[0].y;
    }
    *out_sside = 0;
    return 0;
  }
  if (m == 2) {
    out[0] = (float)hull[0].x; out[1] = (float)hull[0].y;
    out[2] = (float)hull[1].x; out[3] = (float)hull[1].y;
    out[4] = (float)hull[1].x; out[5] = (float)hull[1].y;
    out[6] = (float)hull[0].x; out[7] = (float)hull[0].y;
    *out_sside = 0;
    return 0;
  }

  double best_area = 1e300;
  double bx[4] = {0, 0, 0, 0}, by[4] = {0, 0, 0, 0};
  for (size_t i = 0; i < m; ++i) {
    size_t j = (i + 1) % m;
    double ex = hull[j].x - hull[i].x;
    double ey = hull[j].y - hull[i].y;
    double len = std::sqrt(ex * ex + ey * ey);
    if (len < 1e-12) continue;
    ex /= len;
    ey /= len;
    // project hull onto edge direction (u) and normal (v)
    double umin = 1e300, umax = -1e300, vmin = 1e300, vmax = -1e300;
    for (const Pt& p : hull) {
      double u = p.x * ex + p.y * ey;
      double v = -p.x * ey + p.y * ex;
      umin = std::min(umin, u); umax = std::max(umax, u);
      vmin = std::min(vmin, v); vmax = std::max(vmax, v);
    }
    double area = (umax - umin) * (vmax - vmin);
    if (area < best_area) {
      best_area = area;
      const double us[4] = {umin, umax, umax, umin};
      const double vs[4] = {vmin, vmin, vmax, vmax};
      for (int k = 0; k < 4; ++k) {
        bx[k] = us[k] * ex - vs[k] * ey;
        by[k] = us[k] * ey + vs[k] * ex;
      }
    }
  }
  double w = std::hypot(bx[1] - bx[0], by[1] - by[0]);
  double h = std::hypot(bx[3] - bx[0], by[3] - by[0]);
  for (int k = 0; k < 4; ++k) {
    out[2 * k] = (float)bx[k];
    out[2 * k + 1] = (float)by[k];
  }
  *out_sside = (float)std::min(w, h);
  return 0;
}

// Intersection area of polygon a (na pts) and polygon b (nb pts).
// Requires at least one convex operand; returns -1.0 if both non-convex.
double poly_intersection_area(const float* a, int na, const float* b, int nb) {
  if (na < 3 || nb < 3) return 0.0;
  std::vector<Pt> pa = to_pts(a, na);
  std::vector<Pt> pb = to_pts(b, nb);
  std::vector<Pt> clipped;
  if (is_convex(pb)) {
    clipped = clip_convex(pa, pb);
  } else if (is_convex(pa)) {
    clipped = clip_convex(pb, pa);
  } else {
    return -1.0;  // caller falls back to rasterization
  }
  if (clipped.size() < 3) return 0.0;
  return std::fabs(poly_area(clipped));
}

double polygon_area_abs(const float* a, int na) {
  if (na < 3) return 0.0;
  return std::fabs(poly_area(to_pts(a, na)));
}

// IoU matrix: gts (n_gt polygons, each gt_pts points flattened xy),
// dets likewise; out is n_gt * n_det row-major.  Polygons are fixed-arity
// here (the evaluator pads to a common point count).
// Pairs where both polys are non-convex get IoU -1 (caller recomputes).
void iou_matrix(const float* gts, int n_gt, int gt_pts, const float* dets,
                int n_det, int det_pts, float* out) {
  std::vector<double> gt_area(n_gt), det_area(n_det);
  for (int i = 0; i < n_gt; ++i)
    gt_area[i] = polygon_area_abs(gts + i * gt_pts * 2, gt_pts);
  for (int j = 0; j < n_det; ++j)
    det_area[j] = polygon_area_abs(dets + j * det_pts * 2, det_pts);
  for (int i = 0; i < n_gt; ++i) {
    for (int j = 0; j < n_det; ++j) {
      double inter = poly_intersection_area(gts + i * gt_pts * 2, gt_pts,
                                            dets + j * det_pts * 2, det_pts);
      if (inter < 0) {
        out[i * n_det + j] = -1.0f;
        continue;
      }
      double uni = gt_area[i] + det_area[j] - inter;
      out[i * n_det + j] = uni <= 0 ? 0.0f : (float)(inter / uni);
    }
  }
}

}  // extern "C"

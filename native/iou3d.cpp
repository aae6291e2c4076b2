// Rotated-BEV IoU + NMS host library.
//
// Native counterpart of the reference's iou3d CUDA extension
// (TaskPrompter/detection_toolbox/iou3d/src/iou3d_kernel.cu — rotated box
// overlap via convex-polygon intersection and greedy NMS). On TPU the
// device path is the XLA implementation in mtt_tpu/detection/iou3d.py;
// this C++ library serves the host-side evaluation/matching path
// (eval3d, dataset preprocessing) where latency matters and the data is
// small and ragged. Bound via ctypes (no pybind11 in the image).
//
// Algorithm: same vertex-collection scheme as the device kernel —
// contained corners + edge-edge intersections, angle-sorted, shoelace.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libiou3d.so iou3d.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

struct Box {
  double cx, cy, w, h, angle;
};

inline void corners(const Box& b, Pt out[4]) {
  const double c = std::cos(b.angle), s = std::sin(b.angle);
  const double hw = b.w * 0.5, hh = b.h * 0.5;
  const double lx[4] = {-hw, hw, hw, -hw};
  const double ly[4] = {-hh, -hh, hh, hh};
  for (int i = 0; i < 4; ++i) {
    out[i].x = b.cx + c * lx[i] - s * ly[i];
    out[i].y = b.cy + s * lx[i] + c * ly[i];
  }
}

inline bool point_in_box(const Pt& p, const Box& b) {
  const double c = std::cos(b.angle), s = std::sin(b.angle);
  const double dx = p.x - b.cx, dy = p.y - b.cy;
  const double lx = dx * c + dy * s;
  const double ly = -dx * s + dy * c;
  return std::abs(lx) <= b.w * 0.5 + 1e-9 && std::abs(ly) <= b.h * 0.5 + 1e-9;
}

inline bool seg_intersect(const Pt& a0, const Pt& a1, const Pt& b0,
                          const Pt& b1, Pt* out) {
  const double rx = a1.x - a0.x, ry = a1.y - a0.y;
  const double qx = b1.x - b0.x, qy = b1.y - b0.y;
  const double den = rx * qy - ry * qx;
  if (std::abs(den) < 1e-12) return false;
  const double dx = b0.x - a0.x, dy = b0.y - a0.y;
  const double t = (dx * qy - dy * qx) / den;
  const double u = (dx * ry - dy * rx) / den;
  if (t < 0.0 || t > 1.0 || u < 0.0 || u > 1.0) return false;
  out->x = a0.x + t * rx;
  out->y = a0.y + t * ry;
  return true;
}

double intersection_area(const Box& a, const Box& b) {
  Pt ca[4], cb[4];
  corners(a, ca);
  corners(b, cb);

  Pt pts[24];
  int n = 0;
  for (int i = 0; i < 4; ++i)
    if (point_in_box(ca[i], b)) pts[n++] = ca[i];
  for (int i = 0; i < 4; ++i)
    if (point_in_box(cb[i], a)) pts[n++] = cb[i];
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      Pt p;
      if (seg_intersect(ca[i], ca[(i + 1) & 3], cb[j], cb[(j + 1) & 3], &p))
        pts[n++] = p;
    }
  if (n < 3) return 0.0;

  Pt c{0, 0};
  for (int i = 0; i < n; ++i) {
    c.x += pts[i].x;
    c.y += pts[i].y;
  }
  c.x /= n;
  c.y /= n;
  double ang[24];
  int idx[24];
  for (int i = 0; i < n; ++i) {
    ang[i] = std::atan2(pts[i].y - c.y, pts[i].x - c.x);
    idx[i] = i;
  }
  std::sort(idx, idx + n, [&](int i, int j) { return ang[i] < ang[j]; });
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& p0 = pts[idx[i]];
    const Pt& p1 = pts[idx[(i + 1) % n]];
    area += p0.x * p1.y - p0.y * p1.x;
  }
  return std::abs(area) * 0.5;
}

}  // namespace

extern "C" {

// boxes: (n, 5) [cx, cy, w, h, angle] row-major float64
void boxes_overlap_bev(const double* boxes_a, int64_t na, const double* boxes_b,
                       int64_t nb, double* out) {
  for (int64_t i = 0; i < na; ++i) {
    Box a{boxes_a[i * 5], boxes_a[i * 5 + 1], boxes_a[i * 5 + 2],
          boxes_a[i * 5 + 3], boxes_a[i * 5 + 4]};
    for (int64_t j = 0; j < nb; ++j) {
      Box b{boxes_b[j * 5], boxes_b[j * 5 + 1], boxes_b[j * 5 + 2],
            boxes_b[j * 5 + 3], boxes_b[j * 5 + 4]};
      out[i * nb + j] = intersection_area(a, b);
    }
  }
}

void boxes_iou_bev(const double* boxes_a, int64_t na, const double* boxes_b,
                   int64_t nb, double* out) {
  boxes_overlap_bev(boxes_a, na, boxes_b, nb, out);
  for (int64_t i = 0; i < na; ++i) {
    const double area_a = boxes_a[i * 5 + 2] * boxes_a[i * 5 + 3];
    for (int64_t j = 0; j < nb; ++j) {
      const double area_b = boxes_b[j * 5 + 2] * boxes_b[j * 5 + 3];
      const double inter = out[i * nb + j];
      out[i * nb + j] = inter / std::max(area_a + area_b - inter, 1e-12);
    }
  }
}

// Greedy rotated NMS. scores sorted internally; keep flags written out.
// Returns number of kept boxes.
int64_t nms_bev(const double* boxes, const double* scores, int64_t n,
                double iou_thr, uint8_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> alive(n, 1);
  std::memset(keep, 0, n);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (!alive[oi]) continue;
    keep[i] = 1;
    ++kept;
    Box bi{boxes[i * 5], boxes[i * 5 + 1], boxes[i * 5 + 2], boxes[i * 5 + 3],
           boxes[i * 5 + 4]};
    const double area_i = bi.w * bi.h;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      if (!alive[oj]) continue;
      const int64_t j = order[oj];
      Box bj{boxes[j * 5], boxes[j * 5 + 1], boxes[j * 5 + 2], boxes[j * 5 + 3],
             boxes[j * 5 + 4]};
      const double inter = intersection_area(bi, bj);
      const double iou = inter / std::max(area_i + bj.w * bj.h - inter, 1e-12);
      if (iou > iou_thr) alive[oj] = 0;
    }
  }
  return kept;
}

// Axis-aligned IoU matrix for the 2D matching in the CS-3D evaluator.
void iou_matrix_2d(const double* a, int64_t na, const double* b, int64_t nb,
                   double* out) {
  for (int64_t i = 0; i < na; ++i) {
    const double ax1 = a[i * 4], ay1 = a[i * 4 + 1], ax2 = a[i * 4 + 2],
                 ay2 = a[i * 4 + 3];
    const double aa = std::max(ax2 - ax1, 0.0) * std::max(ay2 - ay1, 0.0);
    for (int64_t j = 0; j < nb; ++j) {
      const double bx1 = b[j * 4], by1 = b[j * 4 + 1], bx2 = b[j * 4 + 2],
                   by2 = b[j * 4 + 3];
      const double bb = std::max(bx2 - bx1, 0.0) * std::max(by2 - by1, 0.0);
      const double ix = std::max(
          0.0, std::min(ax2, bx2) - std::max(ax1, bx1));
      const double iy = std::max(
          0.0, std::min(ay2, by2) - std::max(ay1, by1));
      const double inter = ix * iy;
      out[i * nb + j] = inter / std::max(aa + bb - inter, 1e-12);
    }
  }
}

}  // extern "C"

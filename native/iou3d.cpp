// Exact oriented 3D box IoU — native core for the NOCS mAP harness.
//
// Replaces the Python Sutherland-Hodgman + scipy ConvexHull path
// (cppf2_tpu/eval/iou3d.py; reference: utils/iou.py, utils/box.py) for the
// evaluation hot loop: every (pred, gt) pair needs an exact IoU, and symmetric
// classes take a max over 36 yaw rotations (utils/util.py:534-538).
//
// Method: represent box B as a convex polyhedron (vertex list + quad faces),
// clip it against the 6 slab half-spaces of box A (in A's local frame) with
// full face bookkeeping (cap faces from each clip), then take the volume of
// the clipped polyhedron via the divergence theorem. Exact up to floating
// point; no hull reconstruction needed.
//
// C ABI:
//   double box_iou(const double* r1, const double* t1, const double* s1,
//                  const double* r2, const double* t2, const double* s2);
//   void batch_iou_sym(const double* rt1, const double* s1, int n1,
//                      const double* rt2, const double* s2, int n2,
//                      int symmetric, double* out);  // out[n1*n2]

#include <algorithm>
#include <array>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kEps = 1e-9;

struct Vec3 {
  double x, y, z;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
};

inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

// Convex polyhedron as a face-vertex soup: each face is a planar polygon with
// outward orientation. Volume via sum of signed tetrahedra against the origin.
struct Poly {
  std::vector<std::vector<Vec3>> faces;

  double volume() const {
    double v = 0.0;
    for (const auto& f : faces) {
      for (size_t i = 1; i + 1 < f.size(); ++i) {
        v += dot(f[0], cross(f[i], f[i + 1]));
      }
    }
    return v / 6.0;
  }
};

// Clip a convex polyhedron by the half-space d(p) = sign*(p[axis] - bound) <= 0
// keeping the inside. Produces the cap face from the cut edges.
void clip_halfspace(Poly& poly, int axis, double bound, double sign) {
  std::vector<std::vector<Vec3>> out;
  std::vector<Vec3> cap;  // intersection points on the clip plane
  out.reserve(poly.faces.size() + 1);

  auto coord = [axis](const Vec3& p) {
    return axis == 0 ? p.x : (axis == 1 ? p.y : p.z);
  };

  for (auto& f : poly.faces) {
    std::vector<Vec3> nf;
    nf.reserve(f.size() + 2);
    const size_t n = f.size();
    for (size_t i = 0; i < n; ++i) {
      const Vec3& cur = f[i];
      const Vec3& nxt = f[(i + 1) % n];
      double dc = sign * (coord(cur) - bound);
      double dn = sign * (coord(nxt) - bound);
      bool cin = dc <= kEps;
      bool nin = dn <= kEps;
      if (cin) nf.push_back(cur);
      if (cin != nin) {
        double t = dc / (dc - dn);
        Vec3 ip = cur + (nxt - cur) * t;
        nf.push_back(ip);
        cap.push_back(ip);
      }
    }
    if (nf.size() >= 3) out.push_back(std::move(nf));
  }

  if (cap.size() >= 3) {
    // order cap points around their centroid in the clip plane
    Vec3 c{0, 0, 0};
    for (auto& p : cap) c = c + p;
    c = c * (1.0 / cap.size());
    int u = (axis + 1) % 3, w = (axis + 2) % 3;
    auto uc = [u](const Vec3& p) { return u == 0 ? p.x : (u == 1 ? p.y : p.z); };
    auto wc = [w](const Vec3& p) { return w == 0 ? p.x : (w == 1 ? p.y : p.z); };
    std::sort(cap.begin(), cap.end(), [&](const Vec3& a, const Vec3& b) {
      return std::atan2(uc(a) - uc(c), wc(a) - wc(c)) <
             std::atan2(uc(b) - uc(c), wc(b) - wc(c));
    });
    // orientation: outward normal of the cap is +sign on `axis`
    if (sign < 0) std::reverse(cap.begin(), cap.end());
    out.push_back(std::move(cap));
  }
  poly.faces = std::move(out);
}

Poly make_box(const double r[9], const double t[3], const double s[3]) {
  // 8 corners: index bit pattern (sx, sy, sz)
  Vec3 corners[8];
  for (int i = 0; i < 8; ++i) {
    double lx = ((i >> 2) & 1 ? 0.5 : -0.5) * s[0];
    double ly = ((i >> 1) & 1 ? 0.5 : -0.5) * s[1];
    double lz = ((i)&1 ? 0.5 : -0.5) * s[2];
    corners[i] = {r[0] * lx + r[1] * ly + r[2] * lz + t[0],
                  r[3] * lx + r[4] * ly + r[5] * lz + t[1],
                  r[6] * lx + r[7] * ly + r[8] * lz + t[2]};
  }
  static const int faces[6][4] = {
      {4, 5, 7, 6},  // +x
      {0, 2, 3, 1},  // -x
      {2, 6, 7, 3},  // +y
      {0, 1, 5, 4},  // -y
      {1, 3, 7, 5},  // +z
      {0, 4, 6, 2},  // -z
  };
  Poly p;
  p.faces.resize(6);
  for (int f = 0; f < 6; ++f) {
    p.faces[f] = {corners[faces[f][0]], corners[faces[f][1]],
                  corners[faces[f][2]], corners[faces[f][3]]};
  }
  return p;
}

// volume of intersection: clip box2 (world) against box1's 6 slabs, in box1's
// local frame.
double intersection_volume(const double r1[9], const double t1[3],
                           const double s1[3], const double r2[9],
                           const double t2[3], const double s2[3]) {
  // transform box2 into box1's local frame: p_local = R1^T (p - t1)
  double rl[9];  // R1^T * R2
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      rl[i * 3 + j] =
          r1[0 * 3 + i] * r2[0 * 3 + j] + r1[1 * 3 + i] * r2[1 * 3 + j] +
          r1[2 * 3 + i] * r2[2 * 3 + j];
  double dt[3] = {t2[0] - t1[0], t2[1] - t1[1], t2[2] - t1[2]};
  double tl[3] = {
      r1[0] * dt[0] + r1[3] * dt[1] + r1[6] * dt[2],
      r1[1] * dt[0] + r1[4] * dt[1] + r1[7] * dt[2],
      r1[2] * dt[0] + r1[5] * dt[1] + r1[8] * dt[2],
  };
  Poly p = make_box(rl, tl, s2);
  for (int axis = 0; axis < 3; ++axis) {
    clip_halfspace(p, axis, +0.5 * s1[axis], +1.0);  // keep p[axis] <= +h
    if (p.faces.empty()) return 0.0;
    clip_halfspace(p, axis, -0.5 * s1[axis], -1.0);  // keep p[axis] >= -h
    if (p.faces.empty()) return 0.0;
  }
  return std::fabs(p.volume());
}

}  // namespace

extern "C" {

double box_iou(const double* r1, const double* t1, const double* s1,
               const double* r2, const double* t2, const double* s2) {
  double inter = intersection_volume(r1, t1, s1, r2, t2, s2);
  double v1 = std::fabs(s1[0] * s1[1] * s1[2]);
  double v2 = std::fabs(s2[0] * s2[1] * s2[2]);
  double uni = v1 + v2 - inter;
  if (uni <= 0) return 0.0;
  double iou = inter / uni;
  return iou > 1.0 ? 1.0 : iou;
}

// rt: row-major 4x4 per box (rotation must be orthonormal; caller normalizes
// scale out, as the mAP harness does). symmetric != 0 applies the 36-rotation
// yaw max to box1.
void batch_iou_sym(const double* rt1, const double* s1, int n1,
                   const double* rt2, const double* s2, int n2, int symmetric,
                   double* out) {
  for (int i = 0; i < n1; ++i) {
    double r1[9], t1[3];
    const double* m1 = rt1 + 16 * i;
    for (int a = 0; a < 3; ++a) {
      for (int b = 0; b < 3; ++b) r1[a * 3 + b] = m1[a * 4 + b];
      t1[a] = m1[a * 4 + 3];
    }
    for (int j = 0; j < n2; ++j) {
      double r2[9], t2[3];
      const double* m2 = rt2 + 16 * j;
      for (int a = 0; a < 3; ++a) {
        for (int b = 0; b < 3; ++b) r2[a * 3 + b] = m2[a * 4 + b];
        t2[a] = m2[a * 4 + 3];
      }
      double best = 0.0;
      if (symmetric) {
        for (int k = 0; k < 36; ++k) {
          double th = 2.0 * M_PI * k / 36.0;
          double c = std::cos(th), s = std::sin(th);
          // r1 @ Ry(th)
          double rr[9];
          for (int a = 0; a < 3; ++a) {
            rr[a * 3 + 0] = r1[a * 3 + 0] * c - r1[a * 3 + 2] * s;
            rr[a * 3 + 1] = r1[a * 3 + 1];
            rr[a * 3 + 2] = r1[a * 3 + 0] * s + r1[a * 3 + 2] * c;
          }
          double v = box_iou(rr, t1, s1 + 3 * i, r2, t2, s2 + 3 * j);
          if (v > best) best = v;
        }
      } else {
        best = box_iou(r1, t1, s1 + 3 * i, r2, t2, s2 + 3 * j);
      }
      out[i * n2 + j] = best;
    }
  }
}

}  // extern "C"

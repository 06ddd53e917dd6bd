// Native CPU reference engines: rigid-body pipeline, Barnes-Hut N-body,
// and coupled SPH+rigid — the measured benchmark denominators for the
// BASELINE.md configs beyond the SPH dam break (which native/sph_ref.cpp
// covers).
//
// Role (BASELINE.md): the upstream reference publishes no numbers, so every
// `vs_baseline` figure needs a measured native denominator. These are
// tight single-threaded C++ engines doing the same work as the reference's
// pipelines:
//   - rigid: broadphase -> convex narrowphase -> warm-started PGS velocity
//     solve -> Baumgarte position solve (reference:
//     src/systems/rigid/rigid_body_collision.cpp:25-53,
//     contact_solver.cpp:449-543, position_solver.cpp:215-325). The
//     broadphase is a uniform grid rather than the reference's quadtree
//     (broadphase.cpp:232-288) and the narrowphase is SAT+clipping rather
//     than GJK/EPA (same contacts for convex shapes, faster) — i.e. this is
//     what a *decent* native engine looks like, a fair or favorable
//     denominator.
//   - nbody: pooled quadtree, mass/COM on insert, theta-criterion walk
//     (reference: src/systems/barnes_hut.cpp:102-312).
//   - coupled: the sph_ref.cpp SPH core plus per-substep two-way rigid
//     coupling (PBD push-out + pressure/drag/buoyancy impulses, reference:
//     src/systems/fluid/fluid_kernels.metal:533-924) and the rigid pipeline
//     per tick, with per-cell rigid candidate lists instead of the
//     reference's O(N_fluid * N_rigid) loop.
//
// Build: native/Makefile (g++ -O3 -shared). Loaded via ctypes
// (lpe_tpu/oracle/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxVerts = 16;
constexpr double kWallMass = 1e29;  // reference static threshold
//                                     (contact_solver.cpp:42-47)

struct RigidWorld {
  int n = 0;
  std::vector<double> px, py, vx, vy, ang, om;
  std::vector<double> inv_m, inv_i, radius;
  std::vector<uint8_t> circle, wall;
  std::vector<int> nv;
  std::vector<double> lx, ly;        // [n*kMaxVerts] local verts
  std::vector<double> wx, wy;        // world verts
  std::vector<double> minx, miny, maxx, maxy;

  void update_world(int i) {
    const double c = std::cos(ang[i]), s = std::sin(ang[i]);
    if (circle[i]) {
      minx[i] = px[i] - radius[i];
      maxx[i] = px[i] + radius[i];
      miny[i] = py[i] - radius[i];
      maxy[i] = py[i] + radius[i];
      return;
    }
    double x0 = 1e300, x1 = -1e300, y0 = 1e300, y1 = -1e300;
    for (int k = 0; k < nv[i]; ++k) {
      const double X = lx[i * kMaxVerts + k], Y = ly[i * kMaxVerts + k];
      const double wxk = px[i] + c * X - s * Y;
      const double wyk = py[i] + s * X + c * Y;
      wx[i * kMaxVerts + k] = wxk;
      wy[i * kMaxVerts + k] = wyk;
      x0 = wxk < x0 ? wxk : x0;
      x1 = wxk > x1 ? wxk : x1;
      y0 = wyk < y0 ? wyk : y0;
      y1 = wyk > y1 ? wyk : y1;
    }
    minx[i] = x0;
    maxx[i] = x1;
    miny[i] = y0;
    maxy[i] = y1;
  }
};

struct Contact {
  int a, b;
  double nx, ny;            // contact normal (from a to b)
  double p1x, p1y, p2x, p2y;  // up to 2 points
  double pen1, pen2;
  int count;
  // solver state
  double jn1, jn2, jt1, jt2;
};

struct WarmEntry {
  double jn1, jn2, jt1, jt2;
};

// ---------------------------------------------------------------------
// Broadphase: uniform grid of body indices by AABB; oversized bodies
// (walls spanning the universe) go to a separate "big" list checked
// against everyone, mirroring lpe_tpu's grid broadphase big-solid block.
// ---------------------------------------------------------------------
void broadphase(const RigidWorld& w, double universe,
                std::vector<std::pair<int, int>>& pairs) {
  pairs.clear();
  const int n = w.n;
  double max_half = 0.0;
  std::vector<int> small_ids;
  std::vector<int> big_ids;
  small_ids.reserve(n);
  for (int i = 0; i < n; ++i) {
    const double ex = 0.5 * (w.maxx[i] - w.minx[i]);
    const double ey = 0.5 * (w.maxy[i] - w.miny[i]);
    const double h = ex > ey ? ex : ey;
    if (h > 0.05 * universe) {
      big_ids.push_back(i);
    } else {
      small_ids.push_back(i);
      max_half = h > max_half ? h : max_half;
    }
  }
  const double cell = std::max(2.0 * max_half, universe / 1024.0);
  const int g = std::max(1, static_cast<int>(std::floor(universe / cell)));
  const double inv = g / universe;
  std::vector<int> head(g * g, -1);
  std::vector<int> nxt(n, -1);
  std::vector<int> cxi(n), cyi(n);
  for (int i : small_ids) {
    int cx = static_cast<int>((0.5 * (w.minx[i] + w.maxx[i])) * inv);
    int cy = static_cast<int>((0.5 * (w.miny[i] + w.maxy[i])) * inv);
    cx = cx < 0 ? 0 : (cx >= g ? g - 1 : cx);
    cy = cy < 0 ? 0 : (cy >= g ? g - 1 : cy);
    cxi[i] = cx;
    cyi[i] = cy;
    const int c = cy * g + cx;
    nxt[i] = head[c];
    head[c] = i;
  }
  auto overlap = [&](int i, int j) {
    return w.minx[i] <= w.maxx[j] && w.maxx[i] >= w.minx[j] &&
           w.miny[i] <= w.maxy[j] && w.maxy[i] >= w.miny[j];
  };
  for (int i : small_ids) {
    for (int dy = -1; dy <= 1; ++dy) {
      const int cy = cyi[i] + dy;
      if (cy < 0 || cy >= g) continue;
      for (int dx = -1; dx <= 1; ++dx) {
        const int cx = cxi[i] + dx;
        if (cx < 0 || cx >= g) continue;
        for (int j = head[cy * g + cx]; j >= 0; j = nxt[j]) {
          if (j <= i) continue;
          if (w.wall[i] && w.wall[j]) continue;
          if (overlap(i, j)) pairs.emplace_back(i, j);
        }
      }
    }
  }
  for (size_t bi = 0; bi < big_ids.size(); ++bi) {
    const int i = big_ids[bi];
    for (int j : small_ids) {
      if (w.wall[i] && w.wall[j]) continue;
      if (overlap(i, j)) {
        pairs.emplace_back(i < j ? i : j, i < j ? j : i);
      }
    }
    for (size_t bj = bi + 1; bj < big_ids.size(); ++bj) {
      const int j = big_ids[bj];
      if (w.wall[i] && w.wall[j]) continue;
      if (overlap(i, j)) {
        pairs.emplace_back(i < j ? i : j, i < j ? j : i);
      }
    }
  }
}

// ---------------------------------------------------------------------
// Narrowphase: SAT + reference-face clipping for convex polygons,
// analytic circle cases. Produces up to 2 contact points per pair.
// ---------------------------------------------------------------------
bool sat_min_axis(const RigidWorld& w, int a, int b, double& best_sep,
                  int& best_edge) {
  // max over a's edge normals of the separation of b; negative = overlap
  best_sep = -1e300;
  best_edge = -1;
  const int na = w.nv[a];
  for (int e = 0; e < na; ++e) {
    const int e2 = (e + 1) % na;
    const double ex = w.wx[a * kMaxVerts + e2] - w.wx[a * kMaxVerts + e];
    const double ey = w.wy[a * kMaxVerts + e2] - w.wy[a * kMaxVerts + e];
    const double len = std::hypot(ex, ey);
    if (len < 1e-12) continue;
    const double nx = ey / len, ny = -ex / len;  // outward for CCW winding
    // support of b along -n
    double mn = 1e300;
    for (int k = 0; k < w.nv[b]; ++k) {
      const double d = nx * w.wx[b * kMaxVerts + k] +
                       ny * w.wy[b * kMaxVerts + k];
      mn = d < mn ? d : mn;
    }
    const double sep = mn - (nx * w.wx[a * kMaxVerts + e] +
                             ny * w.wy[a * kMaxVerts + e]);
    if (sep > best_sep) {
      best_sep = sep;
      best_edge = e;
    }
    if (sep > 0.0) return false;  // separating axis
  }
  return true;
}

bool make_contact(const RigidWorld& w, int a, int b, Contact& c) {
  const bool ca = w.circle[a] != 0, cb = w.circle[b] != 0;
  if (ca && cb) {
    const double dx = w.px[b] - w.px[a], dy = w.py[b] - w.py[a];
    const double d = std::hypot(dx, dy);
    const double r = w.radius[a] + w.radius[b];
    if (d >= r || d < 1e-12) return false;
    c.a = a;
    c.b = b;
    c.nx = dx / d;
    c.ny = dy / d;
    c.p1x = w.px[a] + c.nx * w.radius[a];
    c.p1y = w.py[a] + c.ny * w.radius[a];
    c.pen1 = r - d;
    c.count = 1;
    return true;
  }
  if (ca || cb) {
    const int poly = ca ? b : a;
    const int cir = ca ? a : b;
    // closest point on polygon to circle center
    double bestd2 = 1e300, qx = 0, qy = 0;
    bool inside = true;
    const int np = w.nv[poly];
    for (int e = 0; e < np; ++e) {
      const int e2 = (e + 1) % np;
      const double ax = w.wx[poly * kMaxVerts + e],
                   ay = w.wy[poly * kMaxVerts + e];
      const double bx = w.wx[poly * kMaxVerts + e2],
                   by = w.wy[poly * kMaxVerts + e2];
      const double ex = bx - ax, ey = by - ay;
      const double len2 = ex * ex + ey * ey;
      double t = len2 > 0 ? ((w.px[cir] - ax) * ex + (w.py[cir] - ay) * ey) /
                                len2
                          : 0.0;
      t = t < 0 ? 0 : (t > 1 ? 1 : t);
      const double cxp = ax + t * ex, cyp = ay + t * ey;
      const double d2 = (w.px[cir] - cxp) * (w.px[cir] - cxp) +
                        (w.py[cir] - cyp) * (w.py[cir] - cyp);
      if (d2 < bestd2) {
        bestd2 = d2;
        qx = cxp;
        qy = cyp;
      }
      // inside test: CCW winding, point left of every edge
      const double cr = ex * (w.py[cir] - ay) - ey * (w.px[cir] - ax);
      if (cr < 0.0) inside = false;
    }
    const double d = std::sqrt(bestd2);
    const double r = w.radius[cir];
    if (!inside && d >= r) return false;
    double nx, ny;
    if (d > 1e-12) {
      nx = (w.px[cir] - qx) / d;
      ny = (w.py[cir] - qy) / d;
      if (inside) {
        nx = -nx;
        ny = -ny;
      }
    } else {
      nx = 0;
      ny = -1;
    }
    // normal from a to b
    if (poly == a) {
      c.nx = nx;
      c.ny = ny;
    } else {
      c.nx = -nx;
      c.ny = -ny;
    }
    c.a = a;
    c.b = b;
    c.p1x = qx;
    c.p1y = qy;
    c.pen1 = inside ? (r + d) : (r - d);
    c.count = 1;
    return true;
  }
  // polygon-polygon SAT
  double sepA, sepB;
  int edgeA, edgeB;
  if (!sat_min_axis(w, a, b, sepA, edgeA)) return false;
  if (!sat_min_axis(w, b, a, sepB, edgeB)) return false;
  int ref, inc, refEdge;
  bool flip;
  if (sepA >= sepB) {
    ref = a;
    inc = b;
    refEdge = edgeA;
    flip = false;
  } else {
    ref = b;
    inc = a;
    refEdge = edgeB;
    flip = true;
  }
  const int nr = w.nv[ref];
  const int r2 = (refEdge + 1) % nr;
  const double rax = w.wx[ref * kMaxVerts + refEdge],
               ray = w.wy[ref * kMaxVerts + refEdge];
  const double rbx = w.wx[ref * kMaxVerts + r2],
               rby = w.wy[ref * kMaxVerts + r2];
  double tx = rbx - rax, ty = rby - ray;
  const double tl = std::hypot(tx, ty);
  if (tl < 1e-12) return false;
  tx /= tl;
  ty /= tl;
  const double nx = ty, ny = -tx;  // outward reference normal
  // incident edge: most anti-parallel edge of inc
  const int ni = w.nv[inc];
  int incEdge = 0;
  double mind = 1e300;
  for (int e = 0; e < ni; ++e) {
    const int e2 = (e + 1) % ni;
    const double ex = w.wx[inc * kMaxVerts + e2] - w.wx[inc * kMaxVerts + e];
    const double ey = w.wy[inc * kMaxVerts + e2] - w.wy[inc * kMaxVerts + e];
    const double el = std::hypot(ex, ey);
    if (el < 1e-12) continue;
    // dot(normal_of_e, refNormal): normal of edge e is (ey,-ex)/el
    const double dot = (ey / el) * nx + (-ex / el) * ny;
    if (dot < mind) {
      mind = dot;
      incEdge = e;
    }
  }
  (void)mind;
  const int i2 = (incEdge + 1) % ni;
  double v1x = w.wx[inc * kMaxVerts + incEdge],
         v1y = w.wy[inc * kMaxVerts + incEdge];
  double v2x = w.wx[inc * kMaxVerts + i2], v2y = w.wy[inc * kMaxVerts + i2];
  // clip incident segment to the reference edge's side planes
  auto clip = [&](double px_, double py_, double off, double& ax,
                  double& ay, double& bx, double& by) -> bool {
    const double da = px_ * ax + py_ * ay - off;
    const double db = px_ * bx + py_ * by - off;
    if (da < 0 && db < 0) return false;
    if (da < 0 || db < 0) {
      const double t = da / (da - db);
      const double ix = ax + t * (bx - ax), iy = ay + t * (by - ay);
      if (da < 0) {
        ax = ix;
        ay = iy;
      } else {
        bx = ix;
        by = iy;
      }
    }
    return true;
  };
  // keep t.p >= t.ra (inside the ra side plane) and t.p <= t.rb
  const double off1 = tx * rax + ty * ray;
  if (!clip(tx, ty, off1, v1x, v1y, v2x, v2y)) return false;
  const double off2 = -(tx * rbx + ty * rby);
  if (!clip(-tx, -ty, off2, v1x, v1y, v2x, v2y)) return false;
  // keep points at or below the reference face
  const double faceOff = nx * rax + ny * ray;
  c.a = a;
  c.b = b;
  c.count = 0;
  const double s1 = nx * v1x + ny * v1y - faceOff;
  const double s2 = nx * v2x + ny * v2y - faceOff;
  if (s1 <= 0) {
    c.p1x = v1x;
    c.p1y = v1y;
    c.pen1 = -s1;
    c.count = 1;
  }
  if (s2 <= 0) {
    if (c.count == 0) {
      c.p1x = v2x;
      c.p1y = v2y;
      c.pen1 = -s2;
      c.count = 1;
    } else {
      c.p2x = v2x;
      c.p2y = v2y;
      c.pen2 = -s2;
      c.count = 2;
    }
  }
  if (c.count == 0) return false;
  // normal points from a to b
  if (!flip) {
    c.nx = nx;
    c.ny = ny;
  } else {
    c.nx = -nx;
    c.ny = -ny;
  }
  return true;
}

// ---------------------------------------------------------------------
// Solvers: warm-started PGS (velocity) + Baumgarte push-out (position).
// ---------------------------------------------------------------------
void solve_velocity(RigidWorld& w, std::vector<Contact>& contacts,
                    int iters, double mu) {
  struct Row {
    int a, b;
    double rax, ray, rbx, rby;
    double nx, ny;
    double mass_n, mass_t;
    double* jn;
    double* jt;
  };
  std::vector<Row> rows;
  rows.reserve(contacts.size() * 2);
  for (auto& c : contacts) {
    for (int k = 0; k < c.count; ++k) {
      Row r;
      r.a = c.a;
      r.b = c.b;
      const double pxk = k == 0 ? c.p1x : c.p2x;
      const double pyk = k == 0 ? c.p1y : c.p2y;
      r.rax = pxk - w.px[c.a];
      r.ray = pyk - w.py[c.a];
      r.rbx = pxk - w.px[c.b];
      r.rby = pyk - w.py[c.b];
      r.nx = c.nx;
      r.ny = c.ny;
      const double rna = r.rax * c.ny - r.ray * c.nx;
      const double rnb = r.rbx * c.ny - r.rby * c.nx;
      double kn = w.inv_m[c.a] + w.inv_m[c.b] + rna * rna * w.inv_i[c.a] +
                  rnb * rnb * w.inv_i[c.b];
      r.mass_n = kn > 1e-12 ? 1.0 / kn : 0.0;
      const double txv = -c.ny, tyv = c.nx;
      const double rta = r.rax * tyv - r.ray * txv;
      const double rtb = r.rbx * tyv - r.rby * txv;
      double kt = w.inv_m[c.a] + w.inv_m[c.b] + rta * rta * w.inv_i[c.a] +
                  rtb * rtb * w.inv_i[c.b];
      r.mass_t = kt > 1e-12 ? 1.0 / kt : 0.0;
      r.jn = k == 0 ? &c.jn1 : &c.jn2;
      r.jt = k == 0 ? &c.jt1 : &c.jt2;
      rows.push_back(r);
    }
  }
  // warm-start impulses
  for (auto& r : rows) {
    const double jx = r.nx * (*r.jn) + (-r.ny) * (*r.jt);
    const double jy = r.ny * (*r.jn) + (r.nx) * (*r.jt);
    w.vx[r.a] -= jx * w.inv_m[r.a];
    w.vy[r.a] -= jy * w.inv_m[r.a];
    w.om[r.a] -= (r.rax * jy - r.ray * jx) * w.inv_i[r.a];
    w.vx[r.b] += jx * w.inv_m[r.b];
    w.vy[r.b] += jy * w.inv_m[r.b];
    w.om[r.b] += (r.rbx * jy - r.rby * jx) * w.inv_i[r.b];
  }
  for (int it = 0; it < iters; ++it) {
    for (auto& r : rows) {
      // relative velocity at contact
      double rvx = w.vx[r.b] - w.om[r.b] * r.rby -
                   (w.vx[r.a] - w.om[r.a] * r.ray);
      double rvy = w.vy[r.b] + w.om[r.b] * r.rbx -
                   (w.vy[r.a] + w.om[r.a] * r.rax);
      const double vn = rvx * r.nx + rvy * r.ny;
      double djn = -vn * r.mass_n;
      const double jn0 = *r.jn;
      double jn1 = jn0 + djn;
      jn1 = jn1 > 0 ? jn1 : 0;
      djn = jn1 - jn0;
      *r.jn = jn1;
      double jx = r.nx * djn, jy = r.ny * djn;
      w.vx[r.a] -= jx * w.inv_m[r.a];
      w.vy[r.a] -= jy * w.inv_m[r.a];
      w.om[r.a] -= (r.rax * jy - r.ray * jx) * w.inv_i[r.a];
      w.vx[r.b] += jx * w.inv_m[r.b];
      w.vy[r.b] += jy * w.inv_m[r.b];
      w.om[r.b] += (r.rbx * jy - r.rby * jx) * w.inv_i[r.b];
      // friction row
      rvx = w.vx[r.b] - w.om[r.b] * r.rby - (w.vx[r.a] - w.om[r.a] * r.ray);
      rvy = w.vy[r.b] + w.om[r.b] * r.rbx - (w.vy[r.a] + w.om[r.a] * r.rax);
      const double txv = -r.ny, tyv = r.nx;
      const double vt = rvx * txv + rvy * tyv;
      double djt = -vt * r.mass_t;
      const double cap = mu * (*r.jn);
      const double jt0 = *r.jt;
      double jt1 = jt0 + djt;
      jt1 = jt1 > cap ? cap : (jt1 < -cap ? -cap : jt1);
      djt = jt1 - jt0;
      *r.jt = jt1;
      jx = txv * djt;
      jy = tyv * djt;
      w.vx[r.a] -= jx * w.inv_m[r.a];
      w.vy[r.a] -= jy * w.inv_m[r.a];
      w.om[r.a] -= (r.rax * jy - r.ray * jx) * w.inv_i[r.a];
      w.vx[r.b] += jx * w.inv_m[r.b];
      w.vy[r.b] += jy * w.inv_m[r.b];
      w.om[r.b] += (r.rbx * jy - r.rby * jx) * w.inv_i[r.b];
    }
  }
}

void solve_position(RigidWorld& w, const std::vector<Contact>& contacts,
                    int iters, double beta, double slop) {
  // per-contact remaining penetration, decremented by applied pushes
  std::vector<double> pen;
  pen.reserve(contacts.size() * 2);
  for (const auto& c : contacts) {
    pen.push_back(c.pen1);
    if (c.count > 1) pen.push_back(c.pen2);
  }
  for (int it = 0; it < iters; ++it) {
    size_t pi = 0;
    for (const auto& c : contacts) {
      for (int k = 0; k < c.count; ++k, ++pi) {
        const double p = pen[pi] - slop;
        if (p <= 0) continue;
        const double pxk = k == 0 ? c.p1x : c.p2x;
        const double pyk = k == 0 ? c.p1y : c.p2y;
        const double rax = pxk - w.px[c.a], ray = pyk - w.py[c.a];
        const double rbx = pxk - w.px[c.b], rby = pyk - w.py[c.b];
        const double rna = rax * c.ny - ray * c.nx;
        const double rnb = rbx * c.ny - rby * c.nx;
        const double km = w.inv_m[c.a] + w.inv_m[c.b] +
                          rna * rna * w.inv_i[c.a] +
                          rnb * rnb * w.inv_i[c.b];
        if (km < 1e-12) continue;
        const double corr = beta * p / km;
        pen[pi] -= beta * p;
        w.px[c.a] -= c.nx * corr * w.inv_m[c.a];
        w.py[c.a] -= c.ny * corr * w.inv_m[c.a];
        w.ang[c.a] -= rna * corr * w.inv_i[c.a];
        w.px[c.b] += c.nx * corr * w.inv_m[c.b];
        w.py[c.b] += c.ny * corr * w.inv_m[c.b];
        w.ang[c.b] += rnb * corr * w.inv_i[c.b];
      }
    }
  }
}

void rigid_tick(RigidWorld& w, std::unordered_map<uint64_t, WarmEntry>& warm,
                std::vector<std::pair<int, int>>& pairs,
                std::vector<Contact>& contacts, double gravity, double dt,
                double universe, double margin, double bounce_damping,
                double max_speed, int vel_iters, int pos_iters, double mu,
                double beta, double slop) {
  const int n = w.n;
  for (int i = 0; i < n; ++i) {
    if (!w.wall[i]) w.vy[i] += gravity * dt;
    w.update_world(i);
  }
  broadphase(w, universe, pairs);
  contacts.clear();
  for (auto& pr : pairs) {
    Contact c;
    c.jn1 = c.jn2 = c.jt1 = c.jt2 = 0.0;
    if (make_contact(w, pr.first, pr.second, c)) {
      const uint64_t key =
          (static_cast<uint64_t>(c.a) << 32) | static_cast<uint32_t>(c.b);
      auto it = warm.find(key);
      if (it != warm.end()) {
        c.jn1 = it->second.jn1;
        c.jn2 = it->second.jn2;
        c.jt1 = it->second.jt1;
        c.jt2 = it->second.jt2;
      }
      contacts.push_back(c);
    }
  }
  if (!contacts.empty()) {
    solve_velocity(w, contacts, vel_iters, mu);
    solve_position(w, contacts, pos_iters, beta, slop);
  }
  warm.clear();
  for (const auto& c : contacts) {
    const uint64_t key =
        (static_cast<uint64_t>(c.a) << 32) | static_cast<uint32_t>(c.b);
    warm[key] = {c.jn1, c.jn2, c.jt1, c.jt2};
  }
  // integrate + boundary bounce (reference: movement.cpp, boundary.cpp,
  // rotation.cpp angular damping/clamp)
  const double lo = margin, hi = universe - margin;
  for (int i = 0; i < n; ++i) {
    if (w.wall[i]) continue;
    w.px[i] += w.vx[i] * dt;
    w.py[i] += w.vy[i] * dt;
    w.om[i] *= 0.98;
    w.om[i] = w.om[i] > 20 ? 20 : (w.om[i] < -20 ? -20 : w.om[i]);
    w.ang[i] += w.om[i] * dt;
    bool bounced = false;
    if (w.px[i] < lo) {
      w.px[i] = lo;
      w.vx[i] = std::fabs(w.vx[i]) * bounce_damping;
      bounced = true;
    } else if (w.px[i] > hi) {
      w.px[i] = hi;
      w.vx[i] = -std::fabs(w.vx[i]) * bounce_damping;
      bounced = true;
    }
    if (w.py[i] < lo) {
      w.py[i] = lo;
      w.vy[i] = std::fabs(w.vy[i]) * bounce_damping;
      bounced = true;
    } else if (w.py[i] > hi) {
      w.py[i] = hi;
      w.vy[i] = -std::fabs(w.vy[i]) * bounce_damping;
      bounced = true;
    }
    if (bounced) {
      const double sp = std::hypot(w.vx[i], w.vy[i]);
      if (sp > max_speed) {
        const double f = max_speed / sp;
        w.vx[i] *= f;
        w.vy[i] *= f;
      }
    }
  }
}

void load_world(RigidWorld& w, int n, const double* pos, const double* vel,
                const double* angle, const double* omega, const double* mass,
                const double* inertia, const double* verts, const int* nverts,
                const double* radius, const uint8_t* is_circle,
                const uint8_t* is_wall) {
  w.n = n;
  w.px.resize(n);
  w.py.resize(n);
  w.vx.resize(n);
  w.vy.resize(n);
  w.ang.resize(n);
  w.om.resize(n);
  w.inv_m.resize(n);
  w.inv_i.resize(n);
  w.radius.resize(n);
  w.circle.resize(n);
  w.wall.resize(n);
  w.nv.resize(n);
  w.lx.resize(n * kMaxVerts);
  w.ly.resize(n * kMaxVerts);
  w.wx.resize(n * kMaxVerts);
  w.wy.resize(n * kMaxVerts);
  w.minx.resize(n);
  w.miny.resize(n);
  w.maxx.resize(n);
  w.maxy.resize(n);
  for (int i = 0; i < n; ++i) {
    w.px[i] = pos[2 * i];
    w.py[i] = pos[2 * i + 1];
    w.vx[i] = vel[2 * i];
    w.vy[i] = vel[2 * i + 1];
    w.ang[i] = angle[i];
    w.om[i] = omega[i];
    const bool stat = is_wall[i] || mass[i] >= kWallMass;
    w.inv_m[i] = stat ? 0.0 : 1.0 / mass[i];
    w.inv_i[i] = stat || inertia[i] <= 0 ? 0.0 : 1.0 / inertia[i];
    w.radius[i] = radius[i];
    w.circle[i] = is_circle[i];
    w.wall[i] = is_wall[i];
    w.nv[i] = nverts[i] > kMaxVerts ? kMaxVerts : nverts[i];
    for (int k = 0; k < w.nv[i]; ++k) {
      w.lx[i * kMaxVerts + k] = verts[(i * kMaxVerts + k) * 2];
      w.ly[i * kMaxVerts + k] = verts[(i * kMaxVerts + k) * 2 + 1];
    }
    w.update_world(i);
  }
}

void store_world(const RigidWorld& w, double* pos, double* vel, double* angle,
                 double* omega) {
  for (int i = 0; i < w.n; ++i) {
    pos[2 * i] = w.px[i];
    pos[2 * i + 1] = w.py[i];
    vel[2 * i] = w.vx[i];
    vel[2 * i + 1] = w.vy[i];
    angle[i] = w.ang[i];
    omega[i] = w.om[i];
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Rigid pipeline: `ticks` ticks of gravity -> broadphase -> narrowphase ->
// warm-started PGS -> position solve -> integrate + boundary. In place.
// ---------------------------------------------------------------------
int lpe_rigid_run(int n, double* pos, double* vel, double* angle,
                  double* omega, const double* mass, const double* inertia,
                  const double* verts, const int* nverts,
                  const double* radius, const uint8_t* is_circle,
                  const uint8_t* is_wall, double gravity, double dt,
                  double universe, double margin, double bounce_damping,
                  double max_speed, int vel_iters, int pos_iters, double mu,
                  double beta, double slop, int ticks) {
  if (n <= 0 || ticks < 0) return 1;
  RigidWorld w;
  load_world(w, n, pos, vel, angle, omega, mass, inertia, verts, nverts,
             radius, is_circle, is_wall);
  std::unordered_map<uint64_t, WarmEntry> warm;
  std::vector<std::pair<int, int>> pairs;
  std::vector<Contact> contacts;
  for (int t = 0; t < ticks; ++t) {
    rigid_tick(w, warm, pairs, contacts, gravity, dt, universe, margin,
               bounce_damping, max_speed, vel_iters, pos_iters, mu, beta,
               slop);
  }
  store_world(w, pos, vel, angle, omega);
  return 0;
}

// ---------------------------------------------------------------------
// Barnes-Hut N-body: pooled quadtree, mass/COM aggregated on insert,
// theta-criterion force walk with softening, dv applied to velocities,
// then drift. Mirrors src/systems/barnes_hut.cpp:102-312 semantics.
// ---------------------------------------------------------------------
int lpe_nbody_run(int n, double* pos, double* vel, const double* mass,
                  double G, double soft, double theta, double dt,
                  double universe, int ticks) {
  if (n <= 0 || ticks < 0) return 1;
  struct Node {
    double cx, cy, half;
    double m, comx, comy;
    int child0;  // -1 = leaf; children are child0..child0+3
    int body;    // body index for singleton leaves, -1 otherwise
  };
  std::vector<Node> pool;
  pool.reserve(4 * n);
  const double soft2 = soft * soft;
  const double theta2 = theta * theta;
  std::vector<int> stack;
  stack.reserve(256);
  for (int t = 0; t < ticks; ++t) {
    pool.clear();
    pool.push_back({0.5 * universe, 0.5 * universe, 0.5 * universe, 0.0, 0.0,
                    0.0, -1, -1});
    // insert
    for (int i = 0; i < n; ++i) {
      const double x = pos[2 * i], y = pos[2 * i + 1];
      if (x < 0 || x >= universe || y < 0 || y >= universe) continue;
      const double mi = mass[i];
      int node = 0;
      for (;;) {
        Node& nd = pool[node];
        nd.comx = (nd.comx * nd.m + x * mi) / (nd.m + mi);
        nd.comy = (nd.comy * nd.m + y * mi) / (nd.m + mi);
        nd.m += mi;
        if (nd.child0 < 0) {
          if (nd.body < 0 && nd.m == mi) {
            nd.body = i;
            break;
          }
          if (nd.half < 1e-12 * universe) break;  // degenerate pile-up
          // split: push existing body down
          const int c0 = static_cast<int>(pool.size());
          Node& nd2 = pool[node];
          nd2.child0 = c0;
          const double h2 = 0.5 * nd2.half;
          const double cx = nd2.cx, cy = nd2.cy;
          pool.push_back({cx - h2, cy - h2, h2, 0, 0, 0, -1, -1});
          pool.push_back({cx + h2, cy - h2, h2, 0, 0, 0, -1, -1});
          pool.push_back({cx - h2, cy + h2, h2, 0, 0, 0, -1, -1});
          pool.push_back({cx + h2, cy + h2, h2, 0, 0, 0, -1, -1});
          const int ob = pool[node].body;
          pool[node].body = -1;
          if (ob >= 0) {
            const double ox = pos[2 * ob], oy = pos[2 * ob + 1];
            const int q = (ox >= cx ? 1 : 0) | (oy >= cy ? 2 : 0);
            Node& cn = pool[c0 + q];
            cn.m = mass[ob];
            cn.comx = ox;
            cn.comy = oy;
            cn.body = ob;
          }
          const int q = (x >= pool[node].cx ? 1 : 0) |
                        (y >= pool[node].cy ? 2 : 0);
          node = pool[node].child0 + q;
          // continue loop: will aggregate into the child
        } else {
          const int q = (x >= nd.cx ? 1 : 0) | (y >= nd.cy ? 2 : 0);
          node = nd.child0 + q;
        }
      }
    }
    // force walk + kick + drift
    for (int i = 0; i < n; ++i) {
      const double x = pos[2 * i], y = pos[2 * i + 1];
      double ax = 0.0, ay = 0.0;
      stack.clear();
      stack.push_back(0);
      while (!stack.empty()) {
        const int ni = stack.back();
        stack.pop_back();
        const Node& nd = pool[ni];
        if (nd.m <= 0.0) continue;
        const double dx = nd.comx - x, dy = nd.comy - y;
        const double d2 = dx * dx + dy * dy + soft2;
        const double w2 = 4.0 * nd.half * nd.half;  // (2*half)^2
        if (nd.child0 < 0 || w2 < theta2 * d2) {
          if (nd.child0 < 0 && nd.body == i) continue;
          // exclude self from aggregates approximately like the
          // reference (it skips the node containing only self)
          const double inv = 1.0 / (d2 * std::sqrt(d2));
          double m = nd.m;
          if (nd.child0 >= 0 && d2 < w2) {
            // crude self-containment guard for deep aggregates
            m -= 0.0;
          }
          ax += m * dx * inv;
          ay += m * dy * inv;
        } else {
          stack.push_back(nd.child0);
          stack.push_back(nd.child0 + 1);
          stack.push_back(nd.child0 + 2);
          stack.push_back(nd.child0 + 3);
        }
      }
      vel[2 * i] += G * ax * dt;
      vel[2 * i + 1] += G * ay * dt;
    }
    for (int i = 0; i < n; ++i) {
      pos[2 * i] += vel[2 * i] * dt;
      pos[2 * i + 1] += vel[2 * i + 1] * dt;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// Coupled SPH + rigid: sph_ref.cpp's SPH core with per-substep two-way
// rigid coupling (PBD push-out + pressure/drag impulses, accumulated
// force/torque applied to rigids once per tick) plus the rigid pipeline.
// Per-cell rigid candidate lists replace the reference's O(Nf*Nr) loop.
// Ballistic "gas" particles (integrate+boundary only) ride along so the
// highlight-reel config has a complete native denominator.
// ---------------------------------------------------------------------
int lpe_coupled_run(
    // fluid
    int nf, double* fpos, double* fvel, const double* fmass,
    // rigid
    int nr, double* rpos, double* rvel, double* rangle, double* romega,
    const double* rmass, const double* rinertia, const double* rverts,
    const int* rnverts, const double* rradius, const uint8_t* ris_circle,
    const uint8_t* ris_wall,
    // gas (ballistic)
    int ng, double* gpos, double* gvel,
    // sph params
    double h, double rest_density, double stiffness, double viscosity,
    double gravity, double dt_tick, int num_sub_steps,
    // boundary
    double universe, double margin, double bounce_damping, double max_speed,
    // rigid solver params
    int vel_iters, int pos_iters, double mu, double beta, double slop,
    // coupling params
    double relax, double max_correction, double drag,
    int ticks) {
  if (nf <= 0 || ticks < 0) return 1;
  const double poly6 = 4.0 / (M_PI * std::pow(h, 8));
  const double spiky = -30.0 / (M_PI * std::pow(h, 5));
  const double viscK = 40.0 / (M_PI * std::pow(h, 5));
  const double h2 = h * h;
  const double dt = dt_tick / num_sub_steps;
  const double half_dt = 0.5 * dt;

  RigidWorld w;
  std::unordered_map<uint64_t, WarmEntry> warm;
  std::vector<std::pair<int, int>> rpairs;
  std::vector<Contact> rcontacts;
  if (nr > 0) {
    load_world(w, nr, rpos, rvel, rangle, romega, rmass, rinertia, rverts,
               rnverts, rradius, ris_circle, ris_wall);
  }

  std::vector<double> ax(nf, 0.0), ay(nf, 0.0);
  std::vector<double> vhx(nf), vhy(nf);
  std::vector<double> rho(nf, 0.0), pres(nf, 0.0);
  std::vector<double> accFx(nr, 0.0), accFy(nr, 0.0), accTq(nr, 0.0);

  // fluid grid (counting sort, cell = h) — same as sph_ref.cpp
  const double inv_cell = 1.0 / h;
  const int gnx = static_cast<int>(std::ceil(universe / h)) + 4;
  const int gn = gnx * gnx;
  std::vector<int> start(gn + 1), order(nf), cix(nf), ciy(nf), cursor(gn);
  // per-cell rigid candidate list (rebuilt per tick; rigids move per tick)
  std::vector<std::vector<int>> cellrig;

  for (int t = 0; t < ticks; ++t) {
    // rigid candidates per fluid cell (AABB inflated by one cell)
    if (nr > 0) {
      for (int i = 0; i < nr; ++i) w.update_world(i);
      cellrig.assign(gn, {});
      for (int r = 0; r < nr; ++r) {
        int gx0 = static_cast<int>(std::floor(w.minx[r] * inv_cell)) + 1;
        int gy0 = static_cast<int>(std::floor(w.miny[r] * inv_cell)) + 1;
        int gx1 = static_cast<int>(std::floor(w.maxx[r] * inv_cell)) + 3;
        int gy1 = static_cast<int>(std::floor(w.maxy[r] * inv_cell)) + 3;
        gx0 = gx0 < 0 ? 0 : gx0;
        gy0 = gy0 < 0 ? 0 : gy0;
        gx1 = gx1 >= gnx ? gnx - 1 : gx1;
        gy1 = gy1 >= gnx ? gnx - 1 : gy1;
        for (int gy = gy0; gy <= gy1; ++gy)
          for (int gx = gx0; gx <= gx1; ++gx)
            cellrig[gy * gnx + gx].push_back(r);
      }
      std::fill(accFx.begin(), accFx.end(), 0.0);
      std::fill(accFy.begin(), accFy.end(), 0.0);
      std::fill(accTq.begin(), accTq.end(), 0.0);
    }
    for (int s = 0; s < num_sub_steps; ++s) {
      // kick-drift
      for (int i = 0; i < nf; ++i) {
        vhx[i] = fvel[2 * i] + half_dt * ax[i];
        vhy[i] = fvel[2 * i + 1] + half_dt * ay[i];
        fpos[2 * i] += vhx[i] * dt;
        fpos[2 * i + 1] += vhy[i] * dt;
      }
      // grid build
      std::fill(start.begin(), start.end(), 0);
      for (int i = 0; i < nf; ++i) {
        int gx = static_cast<int>(std::floor(fpos[2 * i] * inv_cell)) + 2;
        int gy = static_cast<int>(std::floor(fpos[2 * i + 1] * inv_cell)) + 2;
        gx = gx < 0 ? 0 : (gx >= gnx ? gnx - 1 : gx);
        gy = gy < 0 ? 0 : (gy >= gnx ? gnx - 1 : gy);
        cix[i] = gx;
        ciy[i] = gy;
        start[gy * gnx + gx + 1]++;
      }
      for (int c = 0; c < gn; ++c) start[c + 1] += start[c];
      for (int c = 0; c < gn; ++c) cursor[c] = start[c];
      for (int i = 0; i < nf; ++i)
        order[cursor[ciy[i] * gnx + cix[i]]++] = i;
      // density + EOS
      for (int i = 0; i < nf; ++i) {
        const double xi = fpos[2 * i], yi = fpos[2 * i + 1];
        double acc = 0.0;
        for (int dy = -1; dy <= 1; ++dy) {
          const int gy = ciy[i] + dy;
          if (gy < 0 || gy >= gnx) continue;
          for (int dx = -1; dx <= 1; ++dx) {
            const int gx = cix[i] + dx;
            if (gx < 0 || gx >= gnx) continue;
            const int c = gy * gnx + gx;
            for (int k = start[c]; k < start[c + 1]; ++k) {
              const int j = order[k];
              const double ddx = xi - fpos[2 * j];
              const double ddy = yi - fpos[2 * j + 1];
              const double r2 = ddx * ddx + ddy * ddy;
              if (r2 < h2) {
                const double q = h2 - r2;
                acc += fmass[j] * poly6 * q * q * q;
              }
            }
          }
        }
        rho[i] = acc;
        const double p = stiffness * (acc - rest_density);
        pres[i] = p > 0.0 ? p : 0.0;
      }
      // forces
      for (int i = 0; i < nf; ++i) {
        const double xi = fpos[2 * i], yi = fpos[2 * i + 1];
        const double vxi = fvel[2 * i], vyi = fvel[2 * i + 1];
        const double rhoi = rho[i];
        double fx = 0.0, fy = 0.0;
        if (rhoi >= 1e-12) {
          const double pi_term = pres[i] / (rhoi * rhoi);
          for (int dy = -1; dy <= 1; ++dy) {
            const int gy = ciy[i] + dy;
            if (gy < 0 || gy >= gnx) continue;
            for (int dx = -1; dx <= 1; ++dx) {
              const int gx = cix[i] + dx;
              if (gx < 0 || gx >= gnx) continue;
              const int c = gy * gnx + gx;
              for (int k = start[c]; k < start[c + 1]; ++k) {
                const int j = order[k];
                if (j == i) continue;
                const double ddx = xi - fpos[2 * j];
                const double ddy = yi - fpos[2 * j + 1];
                const double r2 = ddx * ddx + ddy * ddy;
                if (r2 < 1e-14 || r2 >= h2 || rho[j] < 1e-12) continue;
                const double r = std::sqrt(r2);
                const double term = pi_term + pres[j] / (rho[j] * rho[j]);
                const double hr = h - r;
                const double w_s = spiky * hr * hr;
                const double f_p = -fmass[j] * term * w_s;
                fx += f_p * ddx / r;
                fy += f_p * ddy / r;
                const double f_v = viscosity * fmass[j] * (viscK * hr /
                                                           rho[j]);
                fx -= f_v * (vxi - fvel[2 * j]);
                fy -= f_v * (vyi - fvel[2 * j + 1]);
              }
            }
          }
        }
        ax[i] = fx;
        ay[i] = fy;
      }
      // second kick
      for (int i = 0; i < nf; ++i) {
        fvel[2 * i] = vhx[i] + half_dt * ax[i];
        fvel[2 * i + 1] = vhy[i] + half_dt * ay[i];
      }
      // two-way coupling: push-out + impulses against rigid candidates
      if (nr > 0) {
        for (int i = 0; i < nf; ++i) {
          const int c = ciy[i] * gnx + cix[i];
          const auto& cands = cellrig[c];
          if (cands.empty()) continue;
          double xi = fpos[2 * i], yi = fpos[2 * i + 1];
          for (int r : cands) {
            if (xi < w.minx[r] || xi > w.maxx[r] || yi < w.miny[r] ||
                yi > w.maxy[r])
              continue;
            // inside/normal/penetration
            double nxv = 0, nyv = 0, pen = 0;
            bool inside = false;
            if (w.circle[r]) {
              const double dx = xi - w.px[r], dy = yi - w.py[r];
              const double d = std::hypot(dx, dy);
              if (d < w.radius[r] && d > 1e-12) {
                inside = true;
                nxv = dx / d;
                nyv = dy / d;
                pen = w.radius[r] - d;
              }
            } else {
              // point-in-polygon + nearest edge (CCW winding)
              bool in = true;
              double bestd = 1e300, bnx = 0, bny = 0;
              const int np = w.nv[r];
              for (int e = 0; e < np; ++e) {
                const int e2 = (e + 1) % np;
                const double axp = w.wx[r * kMaxVerts + e],
                             ayp = w.wy[r * kMaxVerts + e];
                const double bxp = w.wx[r * kMaxVerts + e2],
                             byp = w.wy[r * kMaxVerts + e2];
                const double ex = bxp - axp, ey = byp - ayp;
                const double cr = ex * (yi - ayp) - ey * (xi - axp);
                if (cr < 0) {
                  in = false;
                  break;
                }
                const double len2 = ex * ex + ey * ey;
                double tt = len2 > 0
                                ? ((xi - axp) * ex + (yi - ayp) * ey) / len2
                                : 0.0;
                tt = tt < 0 ? 0 : (tt > 1 ? 1 : tt);
                const double qx = axp + tt * ex, qy = ayp + tt * ey;
                const double d2e = (xi - qx) * (xi - qx) +
                                   (yi - qy) * (yi - qy);
                if (d2e < bestd) {
                  bestd = d2e;
                  const double d = std::sqrt(d2e);
                  if (d > 1e-12) {
                    bnx = (xi - qx) / d;
                    bny = (yi - qy) / d;
                  } else {
                    bnx = 0;
                    bny = -1;
                  }
                }
              }
              if (in) {
                inside = true;
                nxv = bnx;
                nyv = bny;
                pen = std::sqrt(bestd);  // the reference's distance-to-
                //                          boundary quirk (metal:616,788)
              }
            }
            if (!inside) continue;
            // PBD push-out (reference: metal:533-668)
            double corr = relax * pen;
            corr = corr > max_correction ? max_correction : corr;
            xi += nxv * corr;
            yi += nyv * corr;
            // kill inward velocity; viscous drag impulse on both sides
            const double rxc = xi - w.px[r], ryc = yi - w.py[r];
            const double rvx = fvel[2 * i] -
                               (w.vx[r] - w.om[r] * ryc);
            const double rvy = fvel[2 * i + 1] -
                               (w.vy[r] + w.om[r] * rxc);
            const double vn = rvx * nxv + rvy * nyv;
            double fxp = 0.0, fyp = 0.0;
            if (vn < 0.0) {
              fvel[2 * i] -= vn * nxv;
              fvel[2 * i + 1] -= vn * nyv;
              const double jimp = -vn * fmass[i];
              fxp -= jimp * nxv / dt;
              fyp -= jimp * nyv / dt;
            }
            // tangential drag (reference impulse solver viscosity term)
            const double vtx = rvx - vn * nxv, vty = rvy - vn * nyv;
            fvel[2 * i] -= drag * vtx;
            fvel[2 * i + 1] -= drag * vty;
            fxp += drag * vtx * fmass[i] / dt;
            fyp += drag * vty * fmass[i] / dt;
            accFx[r] += fxp;
            accFy[r] += fyp;
            accTq[r] += rxc * fyp - ryc * fxp;
          }
          fpos[2 * i] = xi;
          fpos[2 * i + 1] = yi;
        }
      }
    }
    // fluid boundary + gravity once per tick (reference tick order)
    const double lo = margin, hi = universe - margin;
    for (int i = 0; i < nf; ++i) {
      bool bounced = false;
      for (int axn = 0; axn < 2; ++axn) {
        double& p = fpos[2 * i + axn];
        double& v = fvel[2 * i + axn];
        if (p < lo) {
          p = lo;
          v = std::fabs(v) * bounce_damping;
          bounced = true;
        } else if (p > hi) {
          p = hi;
          v = -std::fabs(v) * bounce_damping;
          bounced = true;
        }
      }
      if (bounced) {
        const double sp = std::hypot(fvel[2 * i], fvel[2 * i + 1]);
        if (sp > max_speed) {
          const double f = max_speed / sp;
          fvel[2 * i] *= f;
          fvel[2 * i + 1] *= f;
        }
      }
      fvel[2 * i + 1] += gravity * dt_tick;
    }
    // rigid writeback (accumulated coupling force -> dv once per tick,
    // reference: fluid.cpp:526-580) then the rigid pipeline tick
    if (nr > 0) {
      for (int r = 0; r < nr; ++r) {
        w.vx[r] += accFx[r] * w.inv_m[r] * dt_tick;
        w.vy[r] += accFy[r] * w.inv_m[r] * dt_tick;
        w.om[r] += accTq[r] * w.inv_i[r] * dt_tick;
      }
      rigid_tick(w, warm, rpairs, rcontacts, gravity, dt_tick, universe,
                 margin, bounce_damping, max_speed, vel_iters, pos_iters,
                 mu, beta, slop);
    }
    // gas: ballistic drift + boundary
    for (int i = 0; i < ng; ++i) {
      gvel[2 * i + 1] += gravity * dt_tick;
      gpos[2 * i] += gvel[2 * i] * dt_tick;
      gpos[2 * i + 1] += gvel[2 * i + 1] * dt_tick;
      for (int axn = 0; axn < 2; ++axn) {
        double& p = gpos[2 * i + axn];
        double& v = gvel[2 * i + axn];
        if (p < lo) {
          p = lo;
          v = std::fabs(v) * bounce_damping;
        } else if (p > hi) {
          p = hi;
          v = -std::fabs(v) * bounce_damping;
        }
      }
    }
  }
  if (nr > 0) store_world(w, rpos, rvel, rangle, romega);
  return 0;
}

}  // extern "C"

// Optimized CPU reference SPH engine.
//
// Role (SURVEY.md §6, BASELINE.md): the upstream reference publishes no
// performance numbers, so the benchmark denominator must be *measured*. This
// is a tight, cache-friendly C++ implementation of the same SPH tick the
// TPU path runs — uniform-grid neighbor search (counting sort, cell = h),
// poly6 density + EOS clamp (reference: fluid_kernels.metal:246-307),
// symmetrized spiky pressure + viscosity Laplacian forces (metal:312-403),
// kick-drift-kick integration (metal:408-441), then the boundary bounce
// (src/systems/boundary.cpp:13-71) and uniform gravity once per tick.
// It is what a careful native port of the reference's solver to a CPU looks
// like, and doubles as a second, independent golden-trajectory oracle.
//
// Build: see native/Makefile (g++ -O3 -shared). Loaded via ctypes
// (lpe_tpu/oracle/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Grid {
  int nx = 0, ny = 0;
  double cell = 0.0, inv_cell = 0.0;
  // counting-sort layout: start[c]..start[c+1] indexes into `order`
  std::vector<int> start;   // ncells + 1
  std::vector<int> order;   // n
  std::vector<int> cix, ciy;  // per-particle cell coords (clamped)

  void build(int n, const double* px, const double* py, double h,
             double universe) {
    cell = h;
    inv_cell = 1.0 / cell;
    // 2-cell apron on each side, clamp strays into the edge cells
    nx = static_cast<int>(std::ceil(universe / cell)) + 4;
    ny = nx;
    const int ncells = nx * ny;
    start.assign(ncells + 1, 0);
    order.resize(n);
    cix.resize(n);
    ciy.resize(n);
    for (int i = 0; i < n; ++i) {
      int gx = static_cast<int>(std::floor(px[i] * inv_cell)) + 2;
      int gy = static_cast<int>(std::floor(py[i] * inv_cell)) + 2;
      gx = gx < 0 ? 0 : (gx >= nx ? nx - 1 : gx);
      gy = gy < 0 ? 0 : (gy >= ny ? ny - 1 : gy);
      cix[i] = gx;
      ciy[i] = gy;
      start[gy * nx + gx + 1]++;
    }
    for (int c = 0; c < ncells; ++c) start[c + 1] += start[c];
    std::vector<int> cursor(start.begin(), start.end() - 1);
    for (int i = 0; i < n; ++i) {
      order[cursor[ciy[i] * nx + cix[i]]++] = i;
    }
  }
};

}  // namespace

extern "C" {

// Runs `ticks` full ticks in place. Arrays: pos/vel are [n][2] interleaved,
// mass/rho/pres are [n]. Returns 0 on success.
int lpe_sph_run(int n, double* pos, double* vel, const double* mass,
                double* rho_out, double* pres_out,
                // solver params (FluidConfig mirror)
                double h, double rest_density, double stiffness,
                double viscosity, double gravity, double dt_tick,
                int num_sub_steps,
                // boundary params (BoundaryConfig mirror)
                double universe, double margin, double bounce_damping,
                double max_speed,
                // numerical guards (FluidNumericalConfig mirror)
                double min_dist2, double min_density,
                int ticks) {
  if (n <= 0 || ticks < 0) return 1;
  const double poly6 = 4.0 / (M_PI * std::pow(h, 8));
  const double spiky = -30.0 / (M_PI * std::pow(h, 5));
  const double visc = 40.0 / (M_PI * std::pow(h, 5));
  const double h2 = h * h;
  const double dt = dt_tick / num_sub_steps;
  const double half_dt = 0.5 * dt;

  std::vector<double> ax(n, 0.0), ay(n, 0.0);
  std::vector<double> rho(n, 0.0), pres(n, 0.0);
  Grid grid;

  for (int t = 0; t < ticks; ++t) {
    for (int s = 0; s < num_sub_steps; ++s) {
      // kick-drift (half velocity, full position)
      for (int i = 0; i < n; ++i) {
        const double vhx = vel[2 * i] + half_dt * ax[i];
        const double vhy = vel[2 * i + 1] + half_dt * ay[i];
        pos[2 * i] += vhx * dt;
        pos[2 * i + 1] += vhy * dt;
        // stash half-velocity in ax/ay temporarily? keep separate:
        ax[i] = vhx;  // reuse as vhalf storage until re-computed below
        ay[i] = vhy;
      }
      // rebuild grid on drifted positions (strided views of pos)
      {
        std::vector<double> px(n), py(n);
        for (int i = 0; i < n; ++i) {
          px[i] = pos[2 * i];
          py[i] = pos[2 * i + 1];
        }
        grid.build(n, px.data(), py.data(), h, universe);
      }
      const int nx = grid.nx;
      // density + pressure
      for (int i = 0; i < n; ++i) {
        const double xi = pos[2 * i], yi = pos[2 * i + 1];
        double acc = 0.0;
        for (int dy = -1; dy <= 1; ++dy) {
          const int gy = grid.ciy[i] + dy;
          if (gy < 0 || gy >= grid.ny) continue;
          for (int dx = -1; dx <= 1; ++dx) {
            const int gx = grid.cix[i] + dx;
            if (gx < 0 || gx >= nx) continue;
            const int c = gy * nx + gx;
            for (int k = grid.start[c]; k < grid.start[c + 1]; ++k) {
              const int j = grid.order[k];
              const double ddx = xi - pos[2 * j];
              const double ddy = yi - pos[2 * j + 1];
              const double r2 = ddx * ddx + ddy * ddy;
              if (r2 < h2) {
                const double q = h2 - r2;
                acc += mass[j] * poly6 * q * q * q;
              }
            }
          }
        }
        rho[i] = acc;
        const double p = stiffness * (acc - rest_density);
        pres[i] = p > 0.0 ? p : 0.0;
      }
      // forces (pressure + viscosity); note: uses pre-kick velocities like
      // the device path (force pass reads cr.vx, the start-of-substep v)
      std::vector<double> vhx(ax), vhy(ay);  // half velocities stashed above
      for (int i = 0; i < n; ++i) {
        const double xi = pos[2 * i], yi = pos[2 * i + 1];
        const double vxi = vel[2 * i], vyi = vel[2 * i + 1];
        const double rhoi = rho[i];
        double fx = 0.0, fy = 0.0;
        if (rhoi >= min_density) {
          const double pi_term = pres[i] / (rhoi * rhoi);
          for (int dy = -1; dy <= 1; ++dy) {
            const int gy = grid.ciy[i] + dy;
            if (gy < 0 || gy >= grid.ny) continue;
            for (int dx = -1; dx <= 1; ++dx) {
              const int gx = grid.cix[i] + dx;
              if (gx < 0 || gx >= nx) continue;
              const int c = gy * nx + gx;
              for (int k = grid.start[c]; k < grid.start[c + 1]; ++k) {
                const int j = grid.order[k];
                if (j == i) continue;
                const double ddx = xi - pos[2 * j];
                const double ddy = yi - pos[2 * j + 1];
                const double r2 = ddx * ddx + ddy * ddy;
                if (r2 < min_dist2 || r2 >= h2 || rho[j] < min_density)
                  continue;
                const double r = std::sqrt(r2);
                const double term = pi_term + pres[j] / (rho[j] * rho[j]);
                const double hr = h - r;
                const double w_spiky = spiky * hr * hr;
                const double f_press = -mass[j] * term * w_spiky;
                fx += f_press * ddx / r;
                fy += f_press * ddy / r;
                const double f_visc =
                    viscosity * mass[j] * (visc * hr / rho[j]);
                fx -= f_visc * (vxi - vel[2 * j]);
                fy -= f_visc * (vyi - vel[2 * j + 1]);
              }
            }
          }
        }
        ax[i] = fx;
        ay[i] = fy;
      }
      // second kick
      for (int i = 0; i < n; ++i) {
        vel[2 * i] = vhx[i] + half_dt * ax[i];
        vel[2 * i + 1] = vhy[i] + half_dt * ay[i];
      }
    }
    // boundary bounce (margin clamp, damping, speed cap) then gravity
    const double lo = margin, hi = universe - margin;
    for (int i = 0; i < n; ++i) {
      bool bounced = false;
      for (int axn = 0; axn < 2; ++axn) {
        double& p = pos[2 * i + axn];
        double& v = vel[2 * i + axn];
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
        const double sp = std::hypot(vel[2 * i], vel[2 * i + 1]);
        if (sp > max_speed) {
          const double f = max_speed / sp;
          vel[2 * i] *= f;
          vel[2 * i + 1] *= f;
        }
      }
      vel[2 * i + 1] += gravity * dt_tick;
    }
  }
  if (rho_out) std::memcpy(rho_out, rho.data(), n * sizeof(double));
  if (pres_out) std::memcpy(pres_out, pres.data(), n * sizeof(double));
  return 0;
}

}  // extern "C"

"""Contact solvers: velocity LCP and Baumgarte position correction.

The reference solves a global LCP with Projected Gauss-Seidel — inherently
sequential over contacts (reference: src/systems/rigid/contact_solver.cpp:381-440)
— and a 10-iteration positional push-out (position_solver.cpp:215-325).

TPU-native replacement: **mass-splitting projected Jacobi** (each body is
virtually split across its contacts, so the per-row effective mass uses
``invMass * degree``; full impulses then sum to an average — the classic
convergent parallel PGS substitute). Iterations run under ``lax.fori_loop``;
impulse scatter is a deterministic ``.at[].add`` (no atomics, no races).

Indexed ops (gathers/scatter-adds over the contact rows) are the per-
iteration cost on TPU, so body state is packed as ``u = [vx, vy, omega]``
([S,3]) — one gather per body side per sweep instead of one per component.

Row construction matches the reference:
- normal rows bounded [0, inf), no restitution (contact_solver.cpp:142-151)
- friction rows bounded [-mu*lambda_n, +mu*lambda_n] with the *current*
  normal impulse, global mu (contact_solver.cpp:404-427)
- effective mass 1/(sum invM + (r x d)^2 invI) (contact_solver.cpp:226-264)
- infinite mass = m > 1e29; rotatable = inertia in (1e-12, 1e29)
  (contact_solver.cpp:42-57)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.config import ContactSolverConfig, PositionSolverConfig


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _contact_degree(ia, ib, valid, n_bodies):
    ones = valid.astype(jnp.float32)
    d = jnp.zeros((n_bodies,), jnp.float32).at[ia].add(ones)
    d = d.at[ib].add(ones)
    return jnp.maximum(d, 1.0)


def _eff_mass(dirv, ra, rb, im_a, im_b, ii_a, ii_b):
    ra_x = _cross2(ra, dirv)
    rb_x = _cross2(rb, dirv)
    s = im_a + im_b + ra_x * ra_x * ii_a + rb_x * rb_x * ii_b
    return jnp.where(s < 1e-12, 0.0, 1.0 / jnp.maximum(s, 1e-12))


def solve_velocity(pos, vel, omega, inv_m, inv_i, ia, ib, n, pt, valid,
                   lam_n0, lam_t0, cfg: ContactSolverConfig):
    """Returns (vel, omega, lam_n, lam_t)."""
    S = pos.shape[0]
    nrm = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
    tan = jnp.stack([-nrm[:, 1], nrm[:, 0]], axis=-1)
    ra = pt - pos[ia]
    rb = pt - pos[ib]
    deg = _contact_degree(ia, ib, valid, S)
    im_a, im_b = inv_m[ia], inv_m[ib]
    ii_a, ii_b = inv_i[ia], inv_i[ib]
    dg_a, dg_b = deg[ia], deg[ib]
    eff_n = _eff_mass(nrm, ra, rb, im_a * dg_a, im_b * dg_b,
                      ii_a * dg_a, ii_b * dg_b) * valid
    eff_t = _eff_mass(tan, ra, rb, im_a * dg_a, im_b * dg_b,
                      ii_a * dg_a, ii_b * dg_b) * valid

    def rel_vel2(u):
        """Relative contact velocity along BOTH directions from one gather
        pair (gathers are the per-iteration floor on TPU, not flops)."""
        ua = u[ia]                                      # [rows, 3]
        ub = u[ib]
        va = ua[:, :2] + jnp.stack([-ua[:, 2] * ra[:, 1],
                                    ua[:, 2] * ra[:, 0]], -1)
        vb = ub[:, :2] + jnp.stack([-ub[:, 2] * rb[:, 1],
                                    ub[:, 2] * rb[:, 0]], -1)
        rv = vb - va
        return (rv * nrm).sum(-1), (rv * tan).sum(-1)

    def apply2(u, dln, dlt):
        """One scatter pair applying the normal and tangent impulses."""
        imp = nrm * dln[:, None] + tan * dlt[:, None]
        da = jnp.concatenate(
            [-imp * im_a[:, None],
             (-(_cross2(ra, nrm) * dln + _cross2(ra, tan) * dlt)
              * ii_a)[:, None]], axis=1)
        db = jnp.concatenate(
            [imp * im_b[:, None],
             ((_cross2(rb, nrm) * dln + _cross2(rb, tan) * dlt)
              * ii_b)[:, None]], axis=1)
        return u.at[ia].add(da).at[ib].add(db)

    relax = cfg.relaxation
    mu = cfg.friction_coeff
    # own-contact normal->tangent velocity coupling (n.t = 0, so only the
    # rotational terms survive): applying dln changes this contact's tangent
    # velocity by dln * ctn. Folding it in analytically lets the friction
    # update see its own contact's fresh normal impulse from the same gather
    # (the reference's sequential sweeps see it through memory,
    # contact_solver.cpp:397-439).
    ctn = (_cross2(ra, nrm) * _cross2(ra, tan) * ii_a
           + _cross2(rb, nrm) * _cross2(rb, tan) * ii_b)

    u = jnp.concatenate([vel, omega[:, None]], axis=1)  # [S, 3]

    # Warm start: cached impulses must be applied up front so the clamp
    # accumulators (which start at lam_*0) stay consistent with what the
    # velocities have actually received. Only contacts that are still
    # approaching (vn <= 0) are warm-started: a separating contact's cached
    # impulse is last tick's *impact*, and pre-applying it injects a second
    # bounce that the bounded Jacobi iterations cannot fully unload (a
    # sequential PGS unloads it contact-by-contact; the parallel solver
    # removes only part per iteration). Resting/pressed contacts — where
    # warm starting is what keeps stacks from sinking — have vn ~ 0 and
    # keep their cache.
    vn0, _ = rel_vel2(u)
    warm_ok = valid & (vn0 <= 0.0)
    lam_n0 = jnp.where(warm_ok, lam_n0, 0.0)
    lam_t0 = jnp.where(warm_ok, lam_t0, 0.0)
    u = apply2(u, lam_n0, lam_t0)

    def body(_, carry):
        u, ln, lt = carry
        vn, vt = rel_vel2(u)
        # normal row
        dl = -eff_n * vn * relax
        new_ln = jnp.maximum(ln + dl, 0.0)
        dln = jnp.where(valid, new_ln - ln, 0.0)
        # friction row: limit uses the fresh normal impulse; tangent velocity
        # sees the fresh own-contact normal impulse through ctn
        lim = mu * new_ln
        vt = vt + dln * ctn
        dlt_raw = -eff_t * vt * relax
        new_lt = jnp.clip(lt + dlt_raw, -lim, lim)
        dlt = jnp.where(valid, new_lt - lt, 0.0)
        u = apply2(u, dln, dlt)
        ln = jnp.where(valid, new_ln, ln)
        lt = jnp.where(valid, new_lt, lt)
        return u, ln, lt

    u, ln, lt = jax.lax.fori_loop(
        0, cfg.iterations, body, (u, lam_n0, lam_t0))
    return u[:, :2], u[:, 2], ln, lt


def solve_position(pos, angle, inv_m, inv_i, ia, ib, n, pt, pen, valid,
                   cfg: PositionSolverConfig):
    """Baumgarte positional correction; lever arms track the moving bodies,
    penetration stays frozen, exactly like the reference
    (position_solver.cpp:215-290). Returns (pos, angle)."""
    S = pos.shape[0]
    nrm = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
    act = valid & ((pen - cfg.slop) > 0.0)
    corr = cfg.baumgarte * (pen - cfg.slop)
    deg = _contact_degree(ia, ib, act, S)
    im_a, im_b = inv_m[ia], inv_m[ib]
    ii_a, ii_b = inv_i[ia], inv_i[ib]
    dg_a, dg_b = deg[ia], deg[ib]

    q0 = jnp.concatenate([pos, angle[:, None]], axis=1)  # [S, 3]

    def body(_, q):
        qa = q[ia]
        qb = q[ib]
        ra = pt - qa[:, :2]
        rb = pt - qb[:, :2]
        ra_x = _cross2(ra, nrm)
        rb_x = _cross2(rb, nrm)
        denom = (im_a * dg_a + im_b * dg_b +
                 ra_x * ra_x * ii_a * dg_a + rb_x * rb_x * ii_b * dg_b)
        scalar = jnp.where(act & (denom > 1e-12),
                           corr / jnp.maximum(denom, 1e-12), 0.0)
        d = nrm * scalar[:, None]
        da = jnp.concatenate([-d * im_a[:, None],
                              (-ra_x * scalar * ii_a)[:, None]], axis=1)
        db = jnp.concatenate([d * im_b[:, None],
                              (rb_x * scalar * ii_b)[:, None]], axis=1)
        return q.at[ia].add(da).at[ib].add(db)

    q = jax.lax.fori_loop(0, cfg.iterations, body, q0)
    return q[:, :2], q[:, 2]

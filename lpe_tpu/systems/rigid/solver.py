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


def match_warm_impulses(pts, nrm, cpt, cn, cln, clt, pair_ok,
                        tol: float = 1e-3, normal_cos: float = 0.95,
                        slot_fallback: bool = True):
    """Position-matched warm-start lookup (the reference ContactManager's
    semantics, contact_manager.cpp:164-248, un-neutered):

    - a pair's cached manifold is discarded when its normal rotated past
      ``cos < normal_cos`` (contact_manager.cpp:202-209);
    - each new contact point takes the impulse of the first cached point
      within ``tol`` (dist^2 < tol^2, contact_manager.cpp:222-234) —
      impulses follow *points*, so a slot-order flip between ticks (e.g.
      two clipped contacts whose penetration order swapped) keeps its
      accumulated impulses;
    - with ``slot_fallback`` (default), a point with NO positional match
      falls back to its *slot's* cached impulse instead of the
      reference's cold start. Divergence, on purpose: the reference's
      sequential PGS converges fine from zero, while the plain-Jacobi
      (stages=1) solver leans on warm starts for stack convergence —
      during settling, contact points move more than 1e-3/tick (Baumgarte
      corrections alone exceed it) and strict matching would cold-start
      exactly when stacks need the cache most (measured: the 5-box stack
      never calms under stages=1). ``slot_fallback=False`` is the strict
      reference semantics (cold start on no match), viable once the
      staged solver converges fast enough on its own
      (RigidBodyConfig.warm_slot_fallback).

    pts [P, C, 2] new points; nrm [P, 2] new normals (unit);
    cpt [P, C, 2] cached points; cn [P, 2] cached normals;
    cln/clt [P, C] cached impulses (slot-aligned); pair_ok [P] bool.
    Returns (ln0, lt0) each [P, C].
    """
    ndot = (cn * nrm).sum(-1)
    ok = pair_ok & (ndot >= normal_cos)
    d2 = ((pts[:, :, None, :] - cpt[:, None, :, :]) ** 2).sum(-1)
    m = d2 < tol * tol                                   # [P, C, C']
    first = m & (jnp.cumsum(m.astype(jnp.int32), axis=2) == 1)
    matched = m.any(2)
    ln0 = jnp.where(first, cln[:, None, :], 0.0).sum(2)
    lt0 = jnp.where(first, clt[:, None, :], 0.0).sum(2)
    if slot_fallback:
        ln0 = jnp.where(matched, ln0, cln)
        lt0 = jnp.where(matched, lt0, clt)
    keep = ok[:, None]
    return jnp.where(keep, ln0, 0.0), jnp.where(keep, lt0, 0.0)


def solve_velocity(pos, vel, omega, inv_m, inv_i, ia, ib, n, pt, valid,
                   lam_n0, lam_t0, cfg: ContactSolverConfig):
    """Returns (vel, omega, lam_n, lam_t).

    Staged (block) projected Jacobi: the contact rows are split round-robin
    into ``cfg.stages`` segments (row r -> segment r % NB); one iteration
    applies the segments *sequentially*, each a mass-splitting Jacobi step
    over its own rows that sees the velocities already updated by earlier
    segments. This interpolates between plain Jacobi (stages=1, the previous
    scheme, still available) and Gauss-Seidel (stages=rows, the reference's
    sequential sweep, contact_solver.cpp:397-439) at the SAME indexed-op
    volume per iteration — the gathers/scatters are merely sliced into NB
    chunks. Round-robin is deliberately anti-correlated with row adjacency:
    compacted rows come pair-major, so a pair's two manifold points (which
    share both bodies) always land in different segments, and neighboring
    pairs in a stack usually do too — most of the sequential-coupling
    benefit of graph coloring without computing a coloring.

    The mass-splitting degree is computed PER SEGMENT (a body split across
    segments takes full-size steps within each), which is what makes staging
    converge faster than one global-degree Jacobi sweep.
    """
    S = pos.shape[0]
    R = ia.shape[0]
    NB = max(1, min(int(getattr(cfg, "stages", 1)), R))
    Rp = -(-R // NB) * NB
    if Rp != R:                      # pad to a multiple of NB (static)
        padr = Rp - R
        ia = jnp.concatenate([ia, jnp.zeros((padr,), ia.dtype)])
        ib = jnp.concatenate([ib, jnp.zeros((padr,), ib.dtype)])
        n = jnp.concatenate([n, jnp.ones((padr, 2), n.dtype)])
        pt = jnp.concatenate([pt, jnp.zeros((padr, 2), pt.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padr,), bool)])
        lam_n0 = jnp.concatenate([lam_n0, jnp.zeros((padr,), lam_n0.dtype)])
        lam_t0 = jnp.concatenate([lam_t0, jnp.zeros((padr,), lam_t0.dtype)])

    nrm = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
    tan = jnp.stack([-nrm[:, 1], nrm[:, 0]], axis=-1)
    ra = pt - pos[ia]
    rb = pt - pos[ib]
    im_a, im_b = inv_m[ia], inv_m[ib]
    ii_a, ii_b = inv_i[ia], inv_i[ib]

    relax = cfg.relaxation
    mu = cfg.friction_coeff
    # friction_stages == 1 under staging: friction rows stay one
    # synchronous Jacobi update per iteration (the validated stages=1
    # behavior for sliding contacts) while normal rows run staged.
    fr_jacobi = NB > 1 and int(getattr(cfg, "friction_stages", 0)) == 1
    if fr_jacobi:
        deg_g = _contact_degree(ia, ib, valid, S)

    def seg(v, s):
        return v[s::NB]

    segs = []
    for s in range(NB):
        v_s = seg(valid, s)
        deg = _contact_degree(seg(ia, s), seg(ib, s), v_s, S)
        dg_a, dg_b = deg[seg(ia, s)], deg[seg(ib, s)]
        g = dict(
            ia=seg(ia, s), ib=seg(ib, s), valid=v_s,
            nrm=seg(nrm, s), tan=seg(tan, s),
            ra=seg(ra, s), rb=seg(rb, s),
            im_a=seg(im_a, s), im_b=seg(im_b, s),
            ii_a=seg(ii_a, s), ii_b=seg(ii_b, s),
        )
        g["eff_n"] = _eff_mass(g["nrm"], g["ra"], g["rb"],
                               g["im_a"] * dg_a, g["im_b"] * dg_b,
                               g["ii_a"] * dg_a, g["ii_b"] * dg_b) * v_s
        g["eff_t"] = _eff_mass(g["tan"], g["ra"], g["rb"],
                               g["im_a"] * dg_a, g["im_b"] * dg_b,
                               g["ii_a"] * dg_a, g["ii_b"] * dg_b) * v_s
        # own-contact normal->tangent velocity coupling (n.t = 0, so only
        # the rotational terms survive): applying dln changes this contact's
        # tangent velocity by dln * ctn, letting the friction update see its
        # own contact's fresh normal impulse from the same gather (the
        # reference's sequential sweeps see it through memory,
        # contact_solver.cpp:397-439).
        g["ctn"] = (_cross2(g["ra"], g["nrm"]) * _cross2(g["ra"], g["tan"])
                    * g["ii_a"]
                    + _cross2(g["rb"], g["nrm"]) * _cross2(g["rb"], g["tan"])
                    * g["ii_b"])
        if fr_jacobi:
            # synchronous-friction effective mass needs the GLOBAL body
            # degree (all of a body's contacts update friction at once)
            dg_ga, dg_gb = deg_g[g["ia"]], deg_g[g["ib"]]
            g["eff_t_g"] = _eff_mass(g["tan"], g["ra"], g["rb"],
                                     g["im_a"] * dg_ga, g["im_b"] * dg_gb,
                                     g["ii_a"] * dg_ga,
                                     g["ii_b"] * dg_gb) * v_s
        segs.append(g)

    def rel_vel2(u, g):
        """Relative contact velocity along BOTH directions from one gather
        pair (gathers are the per-iteration floor on TPU, not flops)."""
        ua = u[g["ia"]]                                 # [rows, 3]
        ub = u[g["ib"]]
        va = ua[:, :2] + jnp.stack([-ua[:, 2] * g["ra"][:, 1],
                                    ua[:, 2] * g["ra"][:, 0]], -1)
        vb = ub[:, :2] + jnp.stack([-ub[:, 2] * g["rb"][:, 1],
                                    ub[:, 2] * g["rb"][:, 0]], -1)
        rv = vb - va
        return (rv * g["nrm"]).sum(-1), (rv * g["tan"]).sum(-1)

    def apply2(u, g, dln, dlt):
        """One scatter pair applying the normal and tangent impulses."""
        imp = g["nrm"] * dln[:, None] + g["tan"] * dlt[:, None]
        da = jnp.concatenate(
            [-imp * g["im_a"][:, None],
             (-(_cross2(g["ra"], g["nrm"]) * dln
                + _cross2(g["ra"], g["tan"]) * dlt)
              * g["ii_a"])[:, None]], axis=1)
        db = jnp.concatenate(
            [imp * g["im_b"][:, None],
             ((_cross2(g["rb"], g["nrm"]) * dln
               + _cross2(g["rb"], g["tan"]) * dlt)
              * g["ii_b"])[:, None]], axis=1)
        return u.at[g["ia"]].add(da).at[g["ib"]].add(db)

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
    ln_segs, lt_segs = [], []
    for s in range(NB):
        g = segs[s]
        vn0, _ = rel_vel2(u, g)
        warm_ok = g["valid"] & (vn0 <= 0.0)
        ln_s = jnp.where(warm_ok, seg(lam_n0, s), 0.0)
        lt_s = jnp.where(warm_ok, seg(lam_t0, s), 0.0)
        u = apply2(u, g, ln_s, lt_s)
        ln_segs.append(ln_s)
        lt_segs.append(lt_s)

    def sweep(u, lns, lts, order):
        if fr_jacobi:
            # staged NORMAL sweeps (stack convergence), then one
            # synchronous Jacobi FRICTION update over all rows computed
            # from the same post-normal velocities — the same indexed-op
            # volume, merely regrouped.
            for s in order:
                g = segs[s]
                ln = lns[s]
                vn, _ = rel_vel2(u, g)
                dl = -g["eff_n"] * vn * relax
                new_ln = jnp.maximum(ln + dl, 0.0)
                dln = jnp.where(g["valid"], new_ln - ln, 0.0)
                u = apply2(u, g, dln, jnp.zeros_like(dln))
                lns[s] = jnp.where(g["valid"], new_ln, ln)
            upd = []
            for s in order:
                g = segs[s]
                _, vt = rel_vel2(u, g)
                lim = mu * lns[s]
                dlt_raw = -g["eff_t_g"] * vt * relax
                new_lt = jnp.clip(lts[s] + dlt_raw, -lim, lim)
                upd.append(jnp.where(g["valid"], new_lt, lts[s]))
            for s, new_lt in zip(order, upd):
                g = segs[s]
                dlt = jnp.where(g["valid"], new_lt - lts[s], 0.0)
                u = apply2(u, g, jnp.zeros_like(dlt), dlt)
                lts[s] = new_lt
            return u, lns, lts
        for s in order:
            g = segs[s]
            ln, lt = lns[s], lts[s]
            vn, vt = rel_vel2(u, g)
            # normal row
            dl = -g["eff_n"] * vn * relax
            new_ln = jnp.maximum(ln + dl, 0.0)
            dln = jnp.where(g["valid"], new_ln - ln, 0.0)
            # friction row: limit uses the fresh normal impulse; tangent
            # velocity sees the fresh own-contact normal impulse through ctn
            lim = mu * new_ln
            vt = vt + dln * g["ctn"]
            dlt_raw = -g["eff_t"] * vt * relax
            new_lt = jnp.clip(lt + dlt_raw, -lim, lim)
            dlt = jnp.where(g["valid"], new_lt - lt, 0.0)
            u = apply2(u, g, dln, dlt)
            lns[s] = jnp.where(g["valid"], new_ln, ln)
            lts[s] = jnp.where(g["valid"], new_lt, lt)
        return u, lns, lts

    # One-way (fixed-order) sweeps, on measurement: alternating forward/
    # reverse orders — the textbook symmetric-GS bias fix — measured
    # strictly worse on deep stacks (penetration and lateral creep both
    # grew), so the simple fixed order stays.
    def body(_, carry):
        u, lns, lts = carry
        u, lns, lts = sweep(u, list(lns), list(lts), range(NB))
        return u, tuple(lns), tuple(lts)

    u, ln_segs, lt_segs = jax.lax.fori_loop(
        0, cfg.iterations, body, (u, tuple(ln_segs), tuple(lt_segs)))
    # reassemble round-robin segments: row r = NB*k + s <- segs[s][k]
    ln = jnp.stack(ln_segs, axis=1).reshape(Rp)[:R]
    lt = jnp.stack(lt_segs, axis=1).reshape(Rp)[:R]
    return u[:, :2], u[:, 2], ln, lt


def solve_position(pos, angle, inv_m, inv_i, ia, ib, n, pt, pen, valid,
                   cfg: PositionSolverConfig):
    """Baumgarte positional correction; lever arms track the moving bodies,
    penetration stays frozen, exactly like the reference
    (position_solver.cpp:215-290). Staged round-robin like solve_velocity.
    Returns (pos, angle)."""
    S = pos.shape[0]
    R = ia.shape[0]
    NB = max(1, min(int(getattr(cfg, "stages", 1)), R))
    Rp = -(-R // NB) * NB
    if Rp != R:
        padr = Rp - R
        ia = jnp.concatenate([ia, jnp.zeros((padr,), ia.dtype)])
        ib = jnp.concatenate([ib, jnp.zeros((padr,), ib.dtype)])
        n = jnp.concatenate([n, jnp.ones((padr, 2), n.dtype)])
        pt = jnp.concatenate([pt, jnp.zeros((padr, 2), pt.dtype)])
        pen = jnp.concatenate([pen, jnp.zeros((padr,), pen.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padr,), bool)])

    nrm = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
    act = valid & ((pen - cfg.slop) > 0.0)
    corr = cfg.baumgarte * (pen - cfg.slop)

    segs = []
    for s in range(NB):
        sl = slice(s, Rp, NB)
        a_s = act[sl]
        deg = _contact_degree(ia[sl], ib[sl], a_s, S)
        segs.append(dict(
            ia=ia[sl], ib=ib[sl], act=a_s, nrm=nrm[sl], pt=pt[sl],
            corr=corr[sl], im_a=inv_m[ia[sl]], im_b=inv_m[ib[sl]],
            ii_a=inv_i[ia[sl]], ii_b=inv_i[ib[sl]],
            dg_a=deg[ia[sl]], dg_b=deg[ib[sl]]))

    q0 = jnp.concatenate([pos, angle[:, None]], axis=1)  # [S, 3]

    def half(q, order):
        for s in order:
            g = segs[s]
            qa = q[g["ia"]]
            qb = q[g["ib"]]
            ra = g["pt"] - qa[:, :2]
            rb = g["pt"] - qb[:, :2]
            ra_x = _cross2(ra, g["nrm"])
            rb_x = _cross2(rb, g["nrm"])
            denom = (g["im_a"] * g["dg_a"] + g["im_b"] * g["dg_b"]
                     + ra_x * ra_x * g["ii_a"] * g["dg_a"]
                     + rb_x * rb_x * g["ii_b"] * g["dg_b"])
            scalar = jnp.where(g["act"] & (denom > 1e-12),
                               g["corr"] / jnp.maximum(denom, 1e-12), 0.0)
            d = g["nrm"] * scalar[:, None]
            da = jnp.concatenate([-d * g["im_a"][:, None],
                                  (-ra_x * scalar * g["ii_a"])[:, None]],
                                 axis=1)
            db = jnp.concatenate([d * g["im_b"][:, None],
                                  (rb_x * scalar * g["ii_b"])[:, None]],
                                 axis=1)
            q = q.at[g["ia"]].add(da).at[g["ib"]].add(db)
        return q

    def body(_, q):
        return half(q, range(NB))

    q = jax.lax.fori_loop(0, cfg.iterations, body, q0)
    return q[:, :2], q[:, 2]

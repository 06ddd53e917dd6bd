"""Rigid-body collision pipeline orchestration.

Reference pipeline per tick (src/systems/rigid/rigid_body_collision.cpp:25-53):
broadphase -> narrowphase (GJK/EPA + clipping) -> velocity LCP -> position
solver. Here every stage is fixed-shape and fused into the jitted tick:

- **Broadphase**: the reference builds a per-tick quadtree over solid AABBs
  (broadphase.cpp:205-288). On TPU an all-pairs AABB overlap matrix over the
  (static) solid slice is a dense VPU job — for the reference's own workload
  sizes it beats tree construction by orders of magnitude. Candidate pairs
  are compacted to a fixed capacity (drop policy mirrors the reference's
  silent per-cell caps). Pair filters are identical: id-ordered dedup, skip
  boundary-boundary, skip small-small (broadphase.cpp:262-283).
- **Narrowphase**: vmapped GJK -> EPA -> contact generation
  (single contact for circle cases, reference-face clipping for poly-poly,
  narrowphase.cpp:352-420).
- **Solvers**: see solver.py.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from ...core.config import ScenarioSystemConfig
from ...core.constants import MAX_POLY_VERTS, ShapeKind
from ...scene import SceneSpec
from ...state import SimState
from . import geometry as geo
from .solver import match_warm_impulses, solve_position, solve_velocity

INF = 1e30


def _solid_shapes(b, S, VS=MAX_POLY_VERTS):
    """``VS`` = the scene's static max solid vertex count
    (SceneSpec.max_solid_verts): narrowphase vertex loops size to the actual
    shapes, not the 16-vert cap."""
    vmask = jnp.arange(VS)[None, :] < b.nverts[:S, None]
    return dict(
        pos=b.pos[:S], angle=b.angle[:S],
        is_circle=b.shape_kind[:S] == int(ShapeKind.CIRCLE),
        radius=b.radius[:S], verts=b.verts[:S, :VS], vmask=vmask,
        nverts=b.nverts[:S],
    )


def _aabbs(sh):
    """World AABBs (reference: broadphase.cpp:164-199)."""
    c = jnp.cos(sh["angle"])[:, None]
    s = jnp.sin(sh["angle"])[:, None]
    v = sh["verts"]
    wx = sh["pos"][:, None, 0] + v[..., 0] * c - v[..., 1] * s
    wy = sh["pos"][:, None, 1] + v[..., 0] * s + v[..., 1] * c
    m = sh["vmask"]
    pminx = jnp.where(m, wx, INF).min(1)
    pmaxx = jnp.where(m, wx, -INF).max(1)
    pminy = jnp.where(m, wy, INF).min(1)
    pmaxy = jnp.where(m, wy, -INF).max(1)
    r = sh["radius"]
    cir = sh["is_circle"]
    minx = jnp.where(cir, sh["pos"][:, 0] - r, pminx)
    maxx = jnp.where(cir, sh["pos"][:, 0] + r, pmaxx)
    miny = jnp.where(cir, sh["pos"][:, 1] - r, pminy)
    maxy = jnp.where(cir, sh["pos"][:, 1] + r, pmaxy)
    return minx, miny, maxx, maxy


def _gather_shape(sh, idx):
    return {k: v[idx] for k, v in sh.items()}


def _pair_contacts(sa, sb, normal, pen, max_contacts):
    """Contact generation for one pair (narrowphase.cpp:352-420)."""
    C = max_contacts
    a_cir, b_cir = sa["is_circle"], sb["is_circle"]
    # single-contact cases
    pt_bc = sb["pos"] - normal * sb["radius"]     # B is circle
    pt_ac = sa["pos"] + normal * sa["radius"]     # A circle, B poly
    single_pt = jnp.where(b_cir, pt_bc, pt_ac)
    any_circle = a_cir | b_cir

    pts_pp, pen_pp, val_pp = geo.polygon_contacts(sa, sb, normal, C)

    pts_sc = jnp.zeros((C, 2), normal.dtype).at[0].set(single_pt)
    pen_sc = jnp.zeros((C,), normal.dtype).at[0].set(pen)
    val_sc = jnp.zeros((C,), bool).at[0].set(True)

    pts = jnp.where(any_circle, pts_sc, pts_pp)
    pens = jnp.where(any_circle, pen_sc, pen_pp)
    valid = jnp.where(any_circle, val_sc, val_pp)
    return pts, pens, valid


def make_rigid_system(spec: SceneSpec, cfg: ScenarioSystemConfig):
    S = spec.n_solid
    rc = cfg.rigid
    bp = rc.broadphase
    MAX_PAIRS = min(bp.max_pairs, max(1, S * (S - 1) // 2))
    C = rc.max_contacts_per_pair
    size = cfg.shared.universe_size_m
    buf = bp.boundary_buffer
    use_grid_bp = S > bp.dense_max_solids
    slack = float(bp.persist_slack_m)

    if use_grid_bp:
        # static grid geometry: cells sized so every non-"big" AABB fits in
        # one cell (bounding radii are rotation-invariant, computed at scene
        # build; overlapping small-small pairs are then always within the
        # 3x3 neighborhood — exact, like the dense matrix)
        Kb = bp.grid_max_per_cell
        # +slack: expanded AABBs (persist_slack_m) must still fit one cell
        # for the 3x3-neighborhood exactness argument below
        cellb = spec.solid_cell_size + slack
        # the grid spans the universe plus one apron cell per side;
        # out-of-universe bodies clamp into the apron cells (conservative —
        # they still pair with each other and with edge cells). The
        # reference's +-500 m tree buffer (broadphase.hpp:25-33) is handled
        # by the in_root filter instead of by gridding empty space.
        nbx = max(1, int(math.ceil(size / cellb))) + 2
        while nbx * nbx > (1 << 20):        # cap table size; cell grows
            cellb *= 2.0
            nbx = max(1, int(math.ceil(size / cellb))) + 2
        ncells_b = nbx * nbx
        BIG = spec.solid_big_idx
        NBIG = len(BIG)
        big_ids = jnp.asarray(BIG, jnp.int32).reshape(NBIG)
        is_big = jnp.zeros((S,), bool)
        if NBIG:
            is_big = is_big.at[jnp.asarray(BIG, jnp.int32)].set(True)

    def _grid_broadphase(b, minx, miny, maxx, maxy, filt):
        """Candidate pairs via a uniform grid over solid centers, plus a
        dense block against the NBIG oversized solids. Exact for AABB
        overlap (replaces the reference's quadtree query contract,
        broadphase.cpp:232-288) up to the Kb per-cell cap."""
        cx = b.pos[:S, 0]
        cy = b.pos[:S, 1]
        gx = jnp.clip(jnp.floor(cx / cellb).astype(jnp.int32) + 1,
                      0, nbx - 1)
        gy = jnp.clip(jnp.floor(cy / cellb).astype(jnp.int32) + 1,
                      0, nbx - 1)
        cid = jnp.where(is_big, ncells_b, gy * nbx + gx)
        order = jnp.argsort(cid, stable=False)
        counts = jnp.zeros((ncells_b + 1,), jnp.int32).at[cid].add(1)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(counts[:-1], dtype=jnp.int32)])
        sc = cid[order]
        rank_sorted = jnp.arange(S) - start[jnp.clip(sc, 0, ncells_b)]
        tvalid = (sc < ncells_b) & (rank_sorted < Kb)
        # table has one extra all-empty row: out-of-bounds neighbor reads
        # clamp into it; invalid scatters go past the end (mode="drop")
        slot = jnp.where(tvalid, sc * Kb + rank_sorted, (ncells_b + 1) * Kb)
        table = jnp.full(((ncells_b + 1) * Kb,), S, jnp.int32)
        table = table.at[slot].set(order.astype(jnp.int32), mode="drop")
        my_rank = jnp.zeros((S,), jnp.int32).at[order].set(rank_sorted)

        kb = jnp.arange(Kb)
        cands = []
        cmask = []
        # forward half-stencil: same cell + E, SW, S, SE neighbors — each
        # unordered cell pair is generated exactly once
        for dx, dy in ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)):
            jx = gx + dx
            jy = gy + dy
            ok = (jx >= 0) & (jx < nbx) & (jy >= 0) & (jy < nbx) & ~is_big
            ncid = jnp.where(ok, jy * nbx + jx, ncells_b)
            rows = table[ncid[:, None] * Kb + kb[None, :]]      # [S, Kb]
            valid = rows < S
            if (dx, dy) == (0, 0):
                # same cell: table rows are rank-ordered, so "rank_j >
                # rank_i" dedups without a gather
                valid = valid & (kb[None, :] > my_rank[:, None])
            cands.append(rows)
            cmask.append(valid)
        if NBIG:
            rows = jnp.broadcast_to(big_ids[None, :], (S, NBIG))
            i_idx = jnp.arange(S)[:, None]
            # big-big pairs only once (i < j); big-small always from small i
            valid = jnp.where(is_big[:, None], i_idx < rows, i_idx != rows)
            cands.append(rows)
            cmask.append(valid)
        cand = jnp.concatenate(cands, axis=1)                   # [S, W]
        valid = jnp.concatenate(cmask, axis=1)
        W = cand.shape[1]

        # per-pair filters: gather the partner's packed AABB+flags row once
        packed = jnp.stack([minx, miny, maxx, maxy,
                            filt.astype(minx.dtype)], axis=1)   # [S, 5]
        pj = packed[jnp.clip(cand, 0, S - 1)]                   # [S, W, 5]
        ox = (minx[:, None] <= pj[..., 2]) & (pj[..., 0] <= maxx[:, None])
        oy = (miny[:, None] <= pj[..., 3]) & (pj[..., 1] <= maxy[:, None])
        # filt bit 0: boundary, bit 1: small, bit 2: in_root
        fj = pj[..., 4].astype(jnp.int32)
        fi = filt[:, None].astype(jnp.int32)
        both_bnd = ((fi & 1) & (fj & 1)) > 0
        both_small = ((fi >> 1) & 1 & ((fj >> 1) & 1)) > 0
        in_both = (((fi >> 2) & 1) & ((fj >> 2) & 1)) > 0
        m = valid & ox & oy & ~both_bnd & ~both_small & in_both
        (flat,) = jnp.nonzero(m.ravel(), size=MAX_PAIRS,
                              fill_value=S * W)
        pvalid = flat < S * W
        flat = jnp.where(pvalid, flat, 0)
        i0 = flat // W
        j0 = cand.ravel()[flat]
        ia = jnp.minimum(i0, j0)
        ib = jnp.maximum(i0, j0)
        ia = jnp.where(pvalid, ia, 0)
        ib = jnp.where(pvalid, ib, 0)
        return ia, ib, pvalid

    def _broadphase(b, sh):
        """One candidate-pair build: AABBs (expanded by slack/2 under
        persistence, so the pair set stays valid while bodies move less
        than slack/2) -> filters -> grid or dense compaction."""
        minx, miny, maxx, maxy = _aabbs(sh)
        bnd = b.boundary[:S]
        # filters from the UNexpanded boxes (small/in_root classification
        # must not depend on the persistence slack)
        ext = jnp.maximum(maxx - minx, maxy - miny)
        small = ext < bp.small_particle_threshold
        in_root = (maxx >= -buf) & (minx <= size + buf) & \
                  (maxy >= -buf) & (miny <= size + buf)
        if slack > 0:
            e = slack * 0.5
            minx, miny, maxx, maxy = minx - e, miny - e, maxx + e, maxy + e
        if use_grid_bp:
            filt = (bnd.astype(jnp.int32)
                    | (small.astype(jnp.int32) << 1)
                    | (in_root.astype(jnp.int32) << 2))
            ia, ib, pvalid = _grid_broadphase(b, minx, miny, maxx, maxy,
                                              filt)
        else:
            ox = (minx[:, None] <= maxx[None, :]) & \
                 (minx[None, :] <= maxx[:, None])
            oy = (miny[:, None] <= maxy[None, :]) & \
                 (miny[None, :] <= maxy[:, None])
            iu = jnp.arange(S)[:, None] < jnp.arange(S)[None, :]
            both_bnd = bnd[:, None] & bnd[None, :]
            both_small = small[:, None] & small[None, :]
            in_both = in_root[:, None] & in_root[None, :]
            m = ox & oy & iu & ~both_bnd & ~both_small & in_both
            (flat,) = jnp.nonzero(m.ravel(), size=MAX_PAIRS,
                                  fill_value=S * S)
            pvalid = flat < S * S
            flat = jnp.where(pvalid, flat, 0)
            ia = flat // S
            ib = flat % S
        return ia, ib, pvalid

    _ablate = os.environ.get("LPE_RIGID_ABLATE", "")  # perf triage only

    def step(state: SimState) -> SimState:
        b = state.bodies
        sh = _solid_shapes(b, S, spec.max_solid_verts)
        # --- broadphase -------------------------------------------------
        if slack > 0:
            # displacement guard: rebuild when any solid's worst-case
            # surface motion (translation + rotation * bounding radius)
            # since the anchor pose exceeds the slack half-width. +inf
            # anchors (fresh state) always rebuild.
            br = jnp.where(sh["is_circle"], sh["radius"],
                           jnp.sqrt((sh["verts"] ** 2).sum(-1))
                           .max(-1, initial=0.0, where=sh["vmask"]))
            dp = jnp.abs(b.pos[:S] - state.bp_anchor_pos[:S]).max(-1)
            da = jnp.abs(b.angle[:S] - state.bp_anchor_ang[:S])
            disp = (dp + da * br).max()
            need = ~(disp <= slack * 0.5)

            def build(_):
                ia, ib, pv = _broadphase(b, sh)
                return (jnp.where(pv, ia, -1).astype(jnp.int32),
                        jnp.where(pv, ib, -1).astype(jnp.int32),
                        b.pos[:S], b.angle[:S])

            def reuse(_):
                return (state.bp_ia[:MAX_PAIRS], state.bp_ib[:MAX_PAIRS],
                        state.bp_anchor_pos[:S], state.bp_anchor_ang[:S])

            ia_c8, ib_c8, anc_p, anc_a = jax.lax.cond(need, build, reuse,
                                                      None)
            pvalid = ia_c8 >= 0
            ia = jnp.maximum(ia_c8, 0)
            ib = jnp.maximum(ib_c8, 0)
        else:
            ia, ib, pvalid = _broadphase(b, sh)

        if _ablate == "broadphase":   # triage: stop after broadphase
            dep = (ia.sum() + ib.sum() + pvalid.sum()).astype(b.pos.dtype)
            return state.replace(bodies=b.replace(
                pos=b.pos.at[0, 0].add(1e-30 * dep)))

        # --- narrowphase --------------------------------------------------
        sa = _gather_shape(sh, ia)
        sb = _gather_shape(sh, ib)
        hit, simplex = jax.vmap(
            lambda a_, b_: geo.gjk(a_, b_, rc.gjk_iterations))(sa, sb)
        evalid, nrm, pen = jax.vmap(
            lambda a_, b_, s_: geo.epa(a_, b_, s_, rc.epa_iterations))(
                sa, sb, simplex)
        # Circle-circle pairs have a closed form (exact where iterative EPA
        # is only ~1e-3 accurate in f32 on smooth boundaries); the reference
        # runs GJK/EPA even for circles (narrowphase.cpp:352-420) but the
        # contact itself is the same analytic point.
        both_circ = sa["is_circle"] & sb["is_circle"]
        dcc = sb["pos"] - sa["pos"]
        dlen = jnp.sqrt((dcc * dcc).sum(-1))
        rsum = sa["radius"] + sb["radius"]
        ncc = dcc / jnp.maximum(dlen, 1e-12)[:, None]
        ncc = jnp.where((dlen > 1e-12)[:, None], ncc,
                        jnp.broadcast_to(jnp.array([1.0, 0.0], dcc.dtype),
                                         ncc.shape))
        hit = jnp.where(both_circ, dlen < rsum, hit)
        evalid = jnp.where(both_circ, dlen < rsum, evalid)
        nrm = jnp.where(both_circ[:, None], ncc, nrm)
        pen = jnp.where(both_circ, rsum - dlen, pen)
        coll = pvalid & hit & evalid
        pts, pens, cvalid = jax.vmap(
            lambda a_, b_, n_, p_: _pair_contacts(a_, b_, n_, p_, C))(
                sa, sb, nrm, pen)
        valid_r = (coll[:, None] & cvalid).reshape(-1)
        ia_r = jnp.repeat(ia, C)
        ib_r = jnp.repeat(ib, C)
        n_r = jnp.repeat(nrm, C, axis=0)
        pt_r = pts.reshape(-1, 2)
        pen_r = pens.reshape(-1)

        # --- active-row compaction ----------------------------------------
        # Solver iterations pay per capacity row (gathers/scatter-adds are
        # the TPU floor); only a fraction of the max_pairs*C rows are real
        # contacts, so compact them to a smaller fixed capacity first.
        # Keep each pair's 2 deepest contacts for the solve (polygon_contacts
        # emits deepest-first): a 2D convex pair needs at most 2 manifold
        # points for a full-rank contact constraint, and the bound makes the
        # auto compaction cap below overflow-free.
        solver_rows = valid_r & (jnp.tile(jnp.arange(C), MAX_PAIRS) < 2)
        ROWS = MAX_PAIRS * C
        ACT = min(rc.max_active_contacts or 2 * MAX_PAIRS, ROWS)
        (rid,) = jnp.nonzero(solver_rows, size=ACT, fill_value=ROWS)
        avalid = rid < ROWS
        rid_s = jnp.where(avalid, rid, 0)
        ia_c = ia_r[rid_s]
        ib_c = ib_r[rid_s]
        n_c = n_r[rid_s]
        pt_c = pt_r[rid_s]
        pen_c = pen_r[rid_s]

        if _ablate == "narrow":       # triage: stop after narrow+compaction
            dep = ((ia_c + ib_c).sum().astype(b.pos.dtype)
                   + n_c.sum() + pt_c.sum() + pen_c.sum())
            return state.replace(bodies=b.replace(
                pos=b.pos.at[0, 0].add(1e-30 * dep)))

        # --- solvers -------------------------------------------------------
        mass = b.mass[:S]
        inertia = b.inertia[:S]
        inv_m = jnp.where(mass > 1e29, 0.0, 1.0 / jnp.maximum(mass, 1e-30))
        inv_i = jnp.where((inertia > 1e-12) & (inertia < 1e29),
                          1.0 / jnp.maximum(inertia, 1e-30), 0.0)
        if rc.warm_start:
            if state.warm_normal.shape[0] < MAX_PAIRS or \
                    state.warm_normal.shape[1] != C:
                raise ValueError(
                    f"warm-start cache {state.warm_normal.shape} does not fit "
                    f"(max_pairs={MAX_PAIRS}, max_contacts={C}); the state "
                    "was built with a different RigidBodyConfig — rebuild the "
                    "scene with the same config or set warm_start=False")
            # Match cached impulses by pair IDENTITY, not slot alone:
            # nonzero compaction shifts every downstream slot when a
            # candidate pair appears/disappears, which would cold-start
            # whole stacks. The reference matches manifolds by entity pair
            # + point position (contact_manager.cpp:164-248); pair id +
            # deterministic deepest-first contact order gives the same
            # correspondence. Lookup = one hash-table scatter + gather; a
            # same-slot match is always honored first, so a hash collision
            # (the .max keeps only the higher colliding slot) can only
            # cold-start a pair that ALSO moved slots this tick — never a
            # wrong match: the slot's pair ids are verified either way.
            H = 1 << max(4, (8 * MAX_PAIRS - 1).bit_length())
            def _hash(a_, b_):
                # Knuth multiplicative (2654435761 as wrapped int32);
                # int32 mul wraps two's-complement, & masks to [0, H)
                return ((a_ * jnp.int32(-1640531535) ^ b_) *
                        jnp.int32(40503)) & jnp.int32(H - 1)
            pia = state.warm_ia[:MAX_PAIRS]
            pib = state.warm_ib[:MAX_PAIRS]
            tbl = jnp.full((H,), -1, jnp.int32)
            tbl = tbl.at[_hash(pia, pib)].max(
                jnp.where(pia >= 0, jnp.arange(MAX_PAIRS, dtype=jnp.int32),
                          -1))
            hslot = tbl[_hash(ia.astype(jnp.int32), ib.astype(jnp.int32))]
            in_slot = (pia == ia) & (pib == ib)
            slot = jnp.where(in_slot,
                             jnp.arange(MAX_PAIRS, dtype=jnp.int32), hslot)
            sc_ = jnp.clip(slot, 0)
            same = in_slot | (
                (slot >= 0) & (pia[sc_] == ia) & (pib[sc_] == ib))
            # Within the matched pair, impulses follow contact POINTS
            # (reference semantics: position match within 1e-3 + normal-
            # rotation manifold reset) — robust to slot-order flips
            # between ticks. See solver.match_warm_impulses.
            nh = nrm / jnp.maximum(
                jnp.sqrt((nrm * nrm).sum(-1, keepdims=True)), 1e-30)
            ln0_m, lt0_m = match_warm_impulses(
                pts, nh, state.warm_pt[:MAX_PAIRS][sc_],
                state.warm_n[:MAX_PAIRS][sc_],
                state.warm_normal[:MAX_PAIRS][sc_],
                state.warm_tangent[:MAX_PAIRS][sc_],
                same, tol=rc.warm_position_tolerance,
                slot_fallback=rc.warm_slot_fallback)
            ln0 = jnp.where(avalid, ln0_m.reshape(-1)[rid_s], 0.0)
            lt0 = jnp.where(avalid, lt0_m.reshape(-1)[rid_s], 0.0)
        else:
            ln0 = jnp.zeros_like(pen_c)
            lt0 = jnp.zeros_like(pen_c)
        if _ablate == "novel":        # triage: skip the velocity solve
            vel, omega = b.vel[:S], b.omega[:S]
            ln_c, lt_c = ln0, lt0
        else:
            vel, omega, ln_c, lt_c = solve_velocity(
                b.pos[:S], b.vel[:S], b.omega[:S], inv_m, inv_i,
                ia_c, ib_c, n_c, pt_c, avalid, ln0, lt0, rc.solver)
        if _ablate == "nopos":        # triage: skip the position solve
            pos, angle = b.pos[:S], b.angle[:S]
        else:
            pos, angle = solve_position(
                b.pos[:S], b.angle[:S], inv_m, inv_i,
                ia_c, ib_c, n_c, pt_c, pen_c, avalid, rc.position)
        # scatter compacted impulses back to capacity rows (warm cache)
        if rc.warm_start:
            ridx = jnp.where(avalid, rid, ROWS)
            ln = jnp.zeros((ROWS + 1,), ln_c.dtype).at[ridx].set(
                ln_c, mode="drop")[:ROWS]
            lt = jnp.zeros((ROWS + 1,), lt_c.dtype).at[ridx].set(
                lt_c, mode="drop")[:ROWS]

        nb = b.replace(
            pos=b.pos.at[:S].set(pos),
            vel=b.vel.at[:S].set(vel),
            angle=b.angle.at[:S].set(angle),
            omega=b.omega.at[:S].set(omega),
        )
        st = state.replace(bodies=nb)
        if slack > 0:
            # NOTE: anchors reference PRE-solve poses; the solve's own
            # push-out this tick is covered because next tick's guard
            # measures the post-solve positions against these anchors.
            st = st.replace(
                bp_ia=state.bp_ia.at[:MAX_PAIRS].set(ia_c8),
                bp_ib=state.bp_ib.at[:MAX_PAIRS].set(ib_c8),
                bp_anchor_pos=state.bp_anchor_pos.at[:S].set(anc_p),
                bp_anchor_ang=state.bp_anchor_ang.at[:S].set(anc_a))
        if rc.warm_start:
            st = st.replace(
                warm_normal=state.warm_normal.at[:MAX_PAIRS].set(
                    ln.reshape(MAX_PAIRS, C)),
                warm_tangent=state.warm_tangent.at[:MAX_PAIRS].set(
                    lt.reshape(MAX_PAIRS, C)),
                warm_ia=state.warm_ia.at[:MAX_PAIRS].set(
                    jnp.where(pvalid, ia, -1).astype(jnp.int32)),
                warm_ib=state.warm_ib.at[:MAX_PAIRS].set(
                    jnp.where(pvalid, ib, -1).astype(jnp.int32)),
                # far sentinel on invalid rows: they can never match
                warm_pt=state.warm_pt.at[:MAX_PAIRS].set(
                    jnp.where(valid_r.reshape(MAX_PAIRS, C)[..., None],
                              pts, 1e30)),
                warm_n=state.warm_n.at[:MAX_PAIRS].set(nh))
        return st

    return step

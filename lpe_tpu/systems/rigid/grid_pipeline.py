"""Grid-resident rigid pipeline: the big-scene (10k-body) TPU design.

The XLA pipeline in pipeline.py keeps contacts as one compacted row LIST and
pays an indexed gather/scatter per body side per solver sweep — the measured
floor at 10k bodies (VERDICT r2 weak #1: 43 ms velocity solve + 17 ms
position solve + 30 ms broadphase of a 114 ms tick). This module removes
every per-iteration indexed op by giving the rigid side the same dense-grid
structure that won 11x on the fluid side:

- **Bodies live in a dense [cell, slot] grid** (cell = broadphase cell, slot
  < KB), rebuilt only when the displacement guard trips (same slack logic as
  the list pipeline's candidate persistence, pipeline.py:256-283).
- **Candidate pairs are per-cell row tensors** [ncells, R] with a static
  class layout over the forward half-stencil (same cell, E, S, SW, SE — each
  unordered pair generated once, mirroring pipeline._grid_broadphase) plus a
  "big solid" class for the wall-sized bodies kept off-grid. Rows hold only
  (lo slot, partner slot); partner CELLS are implied by the row's static
  class — neighbor access is a grid roll, not a gather.
- **Narrowphase is closed-form SAT** (geometry.sat_contact) + the incident-
  edge clip, vmapped over the dense row tensor. The reference reaches the
  same normal/depth iteratively via GJK->EPA (src/systems/rigid/epa.cpp:
  31-119); for convex polygons the answers agree (tests/test_geometry_sat).
- **Both solvers iterate entirely on dense tensors**: body velocity
  [ncells, KB, 3], per-row one-hot slot selects executed as broadcast-reduce
  (VPU), partner cells via jnp.roll. One class pass = one mass-splitting
  projected-Jacobi step over its rows; the 6 class passes apply sequentially
  per iteration (staged Gauss-Seidel, the solver.py ``stages`` scheme with
  spatially-disjoint segments). Solver math (row bounds, effective masses,
  warm-start gating, friction coupling) matches solver.py, which matches the
  reference (src/systems/rigid/contact_solver.cpp:142-264,397-439;
  position_solver.cpp:215-290).

Capacity policy mirrors the reference's silent per-cell caps
(fluid_kernels.metal:60,237-240): candidates beyond a row-class capacity are
dropped deterministically (kb-ascending), bodies beyond KB in one cell drop
out of collision for that rebuild window.
"""
from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

from ...core.config import ScenarioSystemConfig
from ...core.constants import ShapeKind
from ...scene import SceneSpec
from ...state import SimState
from . import geometry as geo
from .pipeline import _pair_contacts
from .solver import match_warm_impulses

INF = 1e30
# forward half-stencil (dx, dy): each unordered cell pair exactly once
OFFS = ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))


def grid_dims(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """Static grid geometry shared by scene.finalize (state sizing) and
    make_grid_rigid_system. Returns None when the grid pipeline is off."""
    rc = cfg.rigid
    bp = rc.broadphase
    S = spec.n_solid
    mode = getattr(rc, "grid_pipeline", "auto")
    on = (mode == "on" or (mode == "auto" and S > bp.dense_max_solids))
    if not on or S < 2:
        return None
    # big (off-grid) solids are frozen contact partners in the solvers —
    # exact for infinite-mass boundary walls, wrong for a dynamic oversized
    # body: those scenes keep the list pipeline
    if not spec.solid_big_all_boundary:
        return None
    slack = float(bp.persist_slack_m)
    cellb = spec.solid_cell_size + slack
    if cellb <= 0:
        return None
    size = cfg.shared.universe_size_m
    nbx = max(1, int(math.ceil(size / cellb))) + 2
    occ0 = int(getattr(spec, "solid_max_cell_occ0", 0))
    while nbx * nbx > (1 << 18):
        cellb *= 2.0
        occ0 *= 4          # each doubling quadruples expected cell occupancy
        nbx = max(1, int(math.ceil(size / cellb))) + 2
    # round the row count up to a multiple of 8: the flat [NC] cell axis
    # then splits into whole y-row bands on any 1/2/4/8-device mesh
    # (parallel/sharded.py shards the rg_* state on it), and power-of-two
    # row counts tile better everywhere. Extra rows are empty border cells
    # (positions clip to the original extent) — physics unchanged.
    nbx = -(-nbx // 8) * 8
    # Per-cell slot capacity. Auto-sizing is DENSITY-DRIVEN: 3x the scene's
    # initial max per-cell count (headroom for piling under gravity/fluid
    # ploughing), floored at 8 and never above the old worst-case constant.
    # A 13 m north-star tank (0.6 bodies/cell) sizes to KB=8-16 instead of
    # 48 — every narrowphase/solver select scales with KB, measured ~7x of
    # the tick at the oversized setting. Saturation (bodies dropped beyond
    # KB, rows beyond the class caps) is observable: core.telemetry
    # .capacity_report counts it and the bench scenes assert ~0.
    worst = max(8, (3 * bp.grid_max_per_cell) // 2)
    auto_kb = min(worst, max(8, -(-3 * occ0 // 8) * 8)) if occ0 > 0 else worst
    KB = getattr(rc, "grid_slots_per_cell", 0) or auto_kb
    # candidate packing stores (kb | ka << 8): slot ids must fit in 8 bits
    if KB > 256:
        raise ValueError(
            f"grid rigid pipeline: KB={KB} slots/cell exceeds the 8-bit "
            "candidate packing (max 256); lower rigid.grid_slots_per_cell "
            "or broadphase.grid_max_per_cell")
    r00 = getattr(rc, "grid_rows_same", 0) or KB
    rax = getattr(rc, "grid_rows_axis", 0) or max(4, KB // 2)
    rdg = getattr(rc, "grid_rows_diag", 0) or max(4, KB // 3)
    nbig = len(spec.solid_big_idx)
    # floor cells pair every resident body against the floor wall: the big
    # class needs up to KB rows (capped at the old 16 default for scenes
    # with huge KB)
    rbig = (getattr(rc, "grid_rows_big", 0) or min(KB, 16)) if nbig else 0
    # class layout over the row axis: [same | E | SW | S | SE | big]
    caps = (r00, rax, rdg, rax, rdg) + ((rbig,) if nbig else ())
    return dict(nbx=nbx, cellb=cellb, KB=KB, caps=caps, nbig=nbig,
                R=sum(caps), NC=nbx * nbx)


def _sel(grid_flat, k, kmax):
    """[NC, Rc, ...] <- one-hot(k) . grid[NC, kmax, ...]: broadcast-reduce
    (stays a fused VPU reduction; batched one-hot matmuls pad N to 128 on
    the MXU and dynamic gathers run at the chip's indexed-op floor)."""
    m = k[..., None] == jnp.arange(kmax, dtype=k.dtype)[None, None, :]
    g = grid_flat[:, None]
    while m.ndim < g.ndim:
        m = m[..., None]
    return jnp.where(m, g, 0).sum(2)


def _scat(val, k, kmax):
    """[NC, kmax, ...] <- sum_rows one-hot(k) . val[NC, Rc, ...]."""
    m = k[:, :, None] == jnp.arange(kmax, dtype=k.dtype)[None, None, :]
    v = val[:, :, None]
    while m.ndim < v.ndim:
        m = m[..., None]
    return jnp.where(m, v, 0).sum(1)


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def make_grid_rigid_system(spec: SceneSpec, cfg: ScenarioSystemConfig):
    gd = grid_dims(spec, cfg)
    assert gd is not None
    S = spec.n_solid
    rc = cfg.rigid
    bp = rc.broadphase
    slack = float(bp.persist_slack_m)
    nbx, cellb, KB, caps = gd["nbx"], gd["cellb"], gd["KB"], gd["caps"]
    NC, R = gd["NC"], gd["R"]
    VS = spec.max_solid_verts
    C = rc.max_contacts_per_pair
    NBIG = gd["nbig"]
    big_ids = jnp.asarray(spec.solid_big_idx, jnp.int32).reshape(NBIG)
    is_big = jnp.zeros((S,), bool)
    if NBIG:
        is_big = is_big.at[big_ids].set(True)
    size = cfg.shared.universe_size_m
    buf = bp.boundary_buffer
    mu = rc.solver.friction_coeff
    relax = rc.solver.relaxation
    dtype = jnp.float32

    # per-class static facts
    classes = []
    base = 0
    for ci, (dx, dy) in enumerate(OFFS):
        classes.append(dict(kind="off", dx=dx, dy=dy, base=base,
                            cap=caps[ci]))
        base += caps[ci]
    if NBIG:
        classes.append(dict(kind="big", dx=0, dy=0, base=base, cap=caps[5]))
        base += caps[5]
    assert base == R
    # per-(lo-slot) stage-1 caps (see rebuild): bound how many rows one
    # body can own per class before the per-cell compaction
    RK = {"same": max(6, caps[0] // 4), "off": max(4, caps[1] // 4),
          "big": min(4, NBIG) if NBIG else 0}

    kiota = jnp.arange(KB, dtype=jnp.int32)
    _ablate = os.environ.get("LPE_RIGID_ABLATE", "")  # perf triage only

    # Pallas narrowphase (SAT + clip fused in VMEM): the vmapped XLA pair
    # materializes ~65 GB/tick of [N, 2V, V] projection intermediates at
    # north-star scale (82 of 150 ms — scripts/north_rigid_trace.py).
    # Poly-poly only; circle scenes and C != 2 keep the XLA path.
    nb = getattr(rc, "narrowphase_backend", "auto")
    use_np_kernel = (C == 2 and not spec.any_rigid_circle
                     and (nb == "pallas" or
                          (nb == "auto"
                           and jax.default_backend() == "tpu")))
    if use_np_kernel:
        from ...ops.pallas_rigid import make_narrowphase
        _pl_narrow = make_narrowphase(
            VS, interpret=jax.default_backend() != "tpu")

    # ---------------------------------------------------------------- rebuild
    def _aabbs_bodies(b):
        """World AABBs of all solids (reference: broadphase.cpp:164-199)."""
        c = jnp.cos(b.angle[:S])[:, None]
        s = jnp.sin(b.angle[:S])[:, None]
        v = b.verts[:S, :VS]
        vmask = jnp.arange(VS)[None, :] < b.nverts[:S, None]
        wx = b.pos[:S, None, 0] + v[..., 0] * c - v[..., 1] * s
        wy = b.pos[:S, None, 1] + v[..., 0] * s + v[..., 1] * c
        pminx = jnp.where(vmask, wx, INF).min(1)
        pmaxx = jnp.where(vmask, wx, -INF).max(1)
        pminy = jnp.where(vmask, wy, INF).min(1)
        pmaxy = jnp.where(vmask, wy, -INF).max(1)
        r = b.radius[:S]
        cir = b.shape_kind[:S] == int(ShapeKind.CIRCLE)
        minx = jnp.where(cir, b.pos[:S, 0] - r, pminx)
        maxx = jnp.where(cir, b.pos[:S, 0] + r, pmaxx)
        miny = jnp.where(cir, b.pos[:S, 1] - r, pminy)
        maxy = jnp.where(cir, b.pos[:S, 1] + r, pmaxy)
        return minx, miny, maxx, maxy

    def _place(mask, attr, cap):
        """Rank-compact ``mask``'s True positions along the LAST axis into
        ``cap`` slots, carrying ``attr`` (same shape as mask, int32).
        Returns (out_attr [..., cap] int32 with -1 empties, out_valid).
        Deterministic (ascending), mirroring the reference's silent
        per-cell caps. Pure dense ops: cumsum + cap unrolled reductions."""
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        outs = []
        for slot in range(cap):
            pick = mask & (rank == slot + 1)
            outs.append(jnp.where(pick, attr, 0).sum(-1)
                        + jnp.where(pick.any(-1), 0, -1))
        return jnp.stack(outs, axis=-1)

    def _rebuild(b):
        minx, miny, maxx, maxy = _aabbs_bodies(b)
        ext = jnp.maximum(maxx - minx, maxy - miny)
        small = ext < bp.small_particle_threshold
        in_root = (maxx >= -buf) & (minx <= size + buf) & \
                  (maxy >= -buf) & (miny <= size + buf)
        bnd = b.boundary[:S]
        if slack > 0:
            e = slack * 0.5
            minx, miny, maxx, maxy = minx - e, miny - e, maxx + e, maxy + e

        # ---- body -> (cell, slot) assignment (counting order) ----
        gx = jnp.clip(jnp.floor(b.pos[:S, 0] / cellb).astype(jnp.int32) + 1,
                      0, nbx - 1)
        gy = jnp.clip(jnp.floor(b.pos[:S, 1] / cellb).astype(jnp.int32) + 1,
                      0, nbx - 1)
        cid = jnp.where(is_big, NC, gy * nbx + gx)
        order = jnp.argsort(cid, stable=False)
        counts = jnp.zeros((NC + 1,), jnp.int32).at[cid].add(1)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(counts[:-1], dtype=jnp.int32)])
        sc = cid[order]
        rank_sorted = jnp.arange(S, dtype=jnp.int32) - start[
            jnp.clip(sc, 0, NC)]
        tvalid = (sc < NC) & (rank_sorted < KB)
        slot_of_sorted = jnp.where(tvalid, rank_sorted, -1)
        slot = jnp.zeros((S,), jnp.int32).at[order].set(slot_of_sorted)
        flat = jnp.where(slot >= 0, cid * KB + slot, -1)
        table = jnp.full((NC * KB + 1,), S, jnp.int32)
        table = table.at[jnp.where(flat >= 0, flat, NC * KB)].set(
            jnp.arange(S, dtype=jnp.int32), mode="drop")[:NC * KB]

        # ---- static per-rebuild body grids ----
        def sg(vals, fill=0.0):
            shp = (NC * KB + 1,) + vals.shape[1:]
            g = jnp.full(shp, fill, vals.dtype)
            return g.at[jnp.where(flat >= 0, flat, NC * KB)].set(
                vals, mode="drop")[:NC * KB]

        g_aabb = sg(jnp.stack([minx, miny, maxx, maxy], axis=1),
                    fill=jnp.float32(2 * INF))
        # filter bits: 0 boundary, 1 small, 2 in_root
        fbits = (bnd.astype(jnp.int32) | (small.astype(jnp.int32) << 1)
                 | (in_root.astype(jnp.int32) << 2))
        g_fbits = sg(fbits, fill=0)
        g_occ = sg(jnp.ones((S,), bool), fill=False)

        # ---- candidate masks + two-stage compaction per class ----
        def overlap(a, bgrid):
            """a [NC,KB,1,4] vs bgrid [NC,1,KBn,4]: AABB + filters."""
            ox = (a[..., 0] <= bgrid[..., 2]) & (bgrid[..., 0] <= a[..., 2])
            oy = (a[..., 1] <= bgrid[..., 3]) & (bgrid[..., 1] <= a[..., 3])
            return ox & oy

        def filt_ok(fa, fb):
            both_bnd = ((fa & 1) & (fb & 1)) > 0
            both_small = (((fa >> 1) & 1) & ((fb >> 1) & 1)) > 0
            in_both = (((fa >> 2) & 1) & ((fb >> 2) & 1)) > 0
            return ~both_bnd & ~both_small & in_both

        A4 = g_aabb.reshape(nbx, nbx, KB, 4)
        F = g_fbits.reshape(nbx, nbx, KB)
        OCC = g_occ.reshape(nbx, nbx, KB)
        # out-of-grid guard: rolls wrap; a wrapped neighbor row/col must not
        # pair. Mask by zeroing occupancy of wrapped cells per class below.
        ka_cols, kb_cols, va_cols = [], [], []
        for cls in classes:
            if cls["kind"] == "big":
                continue
            dx, dy = cls["dx"], cls["dy"]
            if (dx, dy) == (0, 0):
                m = (overlap(A4[:, :, :, None, :], A4[:, :, None, :, :])
                     & filt_ok(F[:, :, :, None], F[:, :, None, :])
                     & OCC[:, :, :, None] & OCC[:, :, None, :]
                     & (kiota[None, :] > kiota[:, None])[None, None])
            else:
                An = jnp.roll(A4, (-dy, -dx), axis=(0, 1))
                Fn = jnp.roll(F, (-dy, -dx), axis=(0, 1))
                On = jnp.roll(OCC, (-dy, -dx), axis=(0, 1))
                # zero wrapped rows/cols of the rolled-in neighbor
                yi = jnp.arange(nbx)[:, None, None]
                xi = jnp.arange(nbx)[None, :, None]
                inb = jnp.ones((nbx, nbx, 1), bool)
                if dy > 0:
                    inb = inb & (yi < nbx - dy)
                if dx > 0:
                    inb = inb & (xi < nbx - dx)
                if dx < 0:
                    inb = inb & (xi >= -dx)
                On = On & inb
                m = (overlap(A4[:, :, :, None, :], An[:, :, None, :, :])
                     & filt_ok(F[:, :, :, None], Fn[:, :, None, :])
                     & OCC[:, :, :, None] & On[:, :, None, :])
            # stage 1: per (cell, lo-slot) keep first rk partners
            rk = RK["same"] if (dx, dy) == (0, 0) else RK["off"]
            m = m.reshape(NC, KB, KB)
            kb_s1 = _place(m, jnp.broadcast_to(kiota[None, None, :],
                                               m.shape), rk)   # [NC,KB,rk]
            # stage 2: per cell, flatten (lo-slot, s1) and keep first cap
            v1 = kb_s1 >= 0
            ka_full = jnp.broadcast_to(kiota[None, :, None],
                                       v1.shape)
            cap = cls["cap"]
            both = (kb_s1.astype(jnp.int32) & 0xFF) | (ka_full << 8)
            packed = _place(v1.reshape(NC, KB * rk),
                            both.reshape(NC, KB * rk), cap)    # [NC,cap]
            valid = packed >= 0
            pk = jnp.maximum(packed, 0)
            ka_cols.append(jnp.where(valid, pk >> 8, 0).astype(jnp.int32))
            kb_cols.append(jnp.where(valid, pk & 0xFF, 0).astype(jnp.int32))
            va_cols.append(valid)
        if NBIG:
            bm = jnp.stack([minx[big_ids], miny[big_ids], maxx[big_ids],
                            maxy[big_ids]], axis=1)            # [NBIG,4]
            fb = fbits[big_ids]
            m = (overlap(A4.reshape(NC, KB, 1, 4), bm[None, None, :, :])
                 & filt_ok(F.reshape(NC, KB, 1), fb[None, None, :])
                 & OCC.reshape(NC, KB, 1))
            gi = jnp.broadcast_to(
                jnp.arange(NBIG, dtype=jnp.int32)[None, None, :], m.shape)
            kb_s1 = _place(m, gi, RK["big"])                   # [NC,KB,rk]
            v1 = kb_s1 >= 0
            ka_full = jnp.broadcast_to(kiota[None, :, None], v1.shape)
            both = (jnp.maximum(kb_s1, 0) & 0xFF) | (ka_full << 8)
            packed = _place(v1.reshape(NC, -1), both.reshape(NC, -1),
                            caps[5])
            valid = packed >= 0
            pk = jnp.maximum(packed, 0)
            ka_cols.append(jnp.where(valid, pk >> 8, 0).astype(jnp.int32))
            kb_cols.append(jnp.where(valid, pk & 0xFF, 0).astype(jnp.int32))
            va_cols.append(valid)

        rg_ka = jnp.concatenate(ka_cols, axis=1)
        rg_kb = jnp.concatenate(kb_cols, axis=1)
        rg_valid = jnp.concatenate(va_cols, axis=1)
        return (flat, table, rg_ka, rg_kb, rg_valid,
                sg(b.verts[:S, :VS]), sg(b.nverts[:S]), sg(b.radius[:S]),
                sg(b.shape_kind[:S] == int(ShapeKind.CIRCLE), fill=False),
                sg(_inv_mass(b)), sg(_inv_inertia(b)),
                b.pos[:S], b.angle[:S],
                jnp.zeros((NC, R, C), dtype), jnp.zeros((NC, R, C), dtype),
                jnp.full((NC, R, C, 2), INF, dtype),
                jnp.zeros((NC, R, 2), dtype))

    def _inv_mass(b):
        m = b.mass[:S]
        return jnp.where(m > 1e29, 0.0, 1.0 / jnp.maximum(m, 1e-30))

    def _inv_inertia(b):
        i = b.inertia[:S]
        return jnp.where((i > 1e-12) & (i < 1e29),
                         1.0 / jnp.maximum(i, 1e-30), 0.0)

    # ------------------------------------------------------------------ tick
    def step(state: SimState) -> SimState:
        b = state.bodies
        # displacement guard (pipeline.py:256-283 semantics)
        vmask = jnp.arange(VS)[None, :] < b.nverts[:S, None]
        br = jnp.where(b.shape_kind[:S] == int(ShapeKind.CIRCLE),
                       b.radius[:S],
                       jnp.sqrt((b.verts[:S, :VS] ** 2).sum(-1))
                       .max(-1, initial=0.0, where=vmask))
        dp = jnp.abs(b.pos[:S] - state.bp_anchor_pos[:S]).max(-1)
        da = jnp.abs(b.angle[:S] - state.bp_anchor_ang[:S])
        disp = (dp + da * br).max()
        need = ~(disp <= slack * 0.5)

        def reuse(_):
            return (state.rg_flat, state.rg_table,
                    state.rg_ka, state.rg_kb, state.rg_valid,
                    state.rg_verts, state.rg_nverts, state.rg_radius,
                    state.rg_iscirc, state.rg_invm, state.rg_invi,
                    state.bp_anchor_pos[:S], state.bp_anchor_ang[:S],
                    state.rg_warm_n, state.rg_warm_t, state.rg_warm_pt,
                    state.rg_warm_nrm)

        (flat, table, rg_ka, rg_kb, rg_valid, g_verts, g_nverts, g_radius,
         g_iscirc, g_invm, g_invi, anc_p, anc_a,
         warm_n, warm_t, warm_pt, warm_nrm) = jax.lax.cond(
            need, lambda _: _rebuild(b), reuse, None)

        # ---- per-tick body grids (pos/angle/vel/omega) ----
        dst = jnp.where(flat >= 0, flat, NC * KB)

        def tg(vals, fill=0.0):
            shp = (NC * KB + 1,) + vals.shape[1:]
            g = jnp.full(shp, fill, dtype)
            return g.at[dst].set(vals.astype(dtype), mode="drop")[:NC * KB]

        g_pos = tg(b.pos[:S])
        g_ang = tg(b.angle[:S])
        g_u = tg(jnp.concatenate([b.vel[:S], b.omega[:S, None]], axis=1))

        if _ablate == "broadphase":
            dep = (rg_ka.sum() + rg_kb.sum()).astype(b.pos.dtype)
            return state.replace(bodies=b.replace(
                pos=b.pos.at[0, 0].add(1e-30 * dep)))

        # ---- per-row shape dicts via class-wise slot selects ----
        if NBIG:
            big_shape = dict(
                pos=b.pos[big_ids].astype(dtype),
                angle=b.angle[big_ids].astype(dtype),
                is_circle=b.shape_kind[big_ids] == int(ShapeKind.CIRCLE),
                radius=b.radius[big_ids].astype(dtype),
                verts=b.verts[big_ids, :VS].astype(dtype),
                nverts=b.nverts[big_ids],
                invm=_inv_mass(b)[big_ids].astype(dtype),
                invi=_inv_inertia(b)[big_ids].astype(dtype),
                u=jnp.concatenate([b.vel[big_ids],
                                   b.omega[big_ids, None]],
                                  axis=1).astype(dtype),
            )

        Gv = g_verts.reshape(NC, KB, VS, 2)
        Gn = g_nverts.reshape(NC, KB)
        Gr = g_radius.reshape(NC, KB)
        Gc = g_iscirc.reshape(NC, KB)
        Gp = g_pos.reshape(NC, KB, 2)
        Ga = g_ang.reshape(NC, KB)
        Gim = g_invm.reshape(NC, KB)
        Gii = g_invi.reshape(NC, KB)

        def roll_cells(g, dx, dy):
            if dx == 0 and dy == 0:
                return g
            g2 = g.reshape((nbx, nbx) + g.shape[1:])
            g2 = jnp.roll(g2, (-dy, -dx), axis=(0, 1))
            return g2.reshape(g.shape)

        def sel_shape(grids, k):
            verts, nv, rad, circ, pos, ang = grids
            return dict(
                pos=_sel(pos, k, KB), angle=_sel(ang, k, KB),
                is_circle=_sel(circ, k, KB).astype(bool),
                radius=_sel(rad, k, KB),
                verts=_sel(verts, k, KB),
                nverts=_sel(nv, k, KB),
            )

        own_grids = (Gv, Gn, Gr, Gc, Gp, Ga)

        sa_parts, sb_parts = [], []
        row_imb, row_iib = [], []
        for cls in classes:
            sl = slice(cls["base"], cls["base"] + cls["cap"])
            ka = rg_ka[:, sl]
            kb = rg_kb[:, sl]
            sa_parts.append(sel_shape(own_grids, ka))
            if cls["kind"] == "big":
                m = kb[..., None] == jnp.arange(NBIG)[None, None, :]
                sb = {kk: jnp.where(
                    m.reshape(m.shape + (1,) * (big_shape[kk].ndim - 1)),
                    big_shape[kk][None, None], 0).sum(2)
                    for kk in ("pos", "angle", "radius", "verts")}
                sb["is_circle"] = jnp.where(
                    m, big_shape["is_circle"][None, None], False).any(2)
                sb["nverts"] = jnp.where(
                    m, big_shape["nverts"][None, None], 0).sum(2)
                sb_parts.append(sb)
                row_imb.append(jnp.where(
                    m, big_shape["invm"][None, None], 0).sum(2))
                row_iib.append(jnp.where(
                    m, big_shape["invi"][None, None], 0).sum(2))
            else:
                dx, dy = cls["dx"], cls["dy"]
                ngrids = tuple(roll_cells(g, dx, dy) for g in own_grids)
                sb_parts.append(sel_shape(ngrids, kb))
                row_imb.append(_sel(roll_cells(Gim, dx, dy), kb, KB))
                row_iib.append(_sel(roll_cells(Gii, dx, dy), kb, KB))

        def cat(parts):
            return {k: jnp.concatenate([p[k] for p in parts], axis=1)
                    for k in parts[0]}

        sa = cat(sa_parts)
        sb = cat(sb_parts)
        sa["vmask"] = jnp.arange(VS)[None, None, :] < sa["nverts"][..., None]
        sb["vmask"] = jnp.arange(VS)[None, None, :] < sb["nverts"][..., None]
        im_b_r = jnp.concatenate(row_imb, axis=1)
        ii_b_r = jnp.concatenate(row_iib, axis=1)
        im_a_r = _sel(Gim, rg_ka, KB)
        ii_a_r = _sel(Gii, rg_ka, KB)

        # ---- narrowphase: SAT + incident-edge clip over [NC*R] rows ----
        flat_sa = jax.tree.map(lambda x: x.reshape((NC * R,) + x.shape[2:]),
                               sa)
        flat_sb = jax.tree.map(lambda x: x.reshape((NC * R,) + x.shape[2:]),
                               sb)
        if use_np_kernel:
            hit, nrm, pen, pts, pens, cval = _pl_narrow(flat_sa, flat_sb)
        else:
            hit, nrm, pen = jax.vmap(partial(
                geo.sat_contact, any_circle=spec.any_rigid_circle))(
                    flat_sa, flat_sb)
            pts, pens, cval = jax.vmap(
                lambda a_, b_, n_, p_: _pair_contacts(a_, b_, n_, p_, C))(
                    flat_sa, flat_sb, nrm, pen)
        nrm = nrm.reshape(NC, R, 2)
        valid = (rg_valid & hit.reshape(NC, R))[..., None] \
            & cval.reshape(NC, R, C)
        # sanitize invalid rows: clipping on garbage slot-0 shapes can emit
        # inf/NaN points, and NaN*0 would leak through the masked scatters
        pts = jnp.where(valid[..., None], pts.reshape(NC, R, C, 2), 0.0)
        pens = jnp.where(valid, pens.reshape(NC, R, C), 0.0)

        if _ablate == "narrow":
            dep = nrm.sum() + pts.sum() + pens.sum() \
                + valid.sum().astype(dtype)
            return state.replace(bodies=b.replace(
                pos=b.pos.at[0, 0].add(1e-30 * dep)))

        # ---- warm start (slot-persistent; point-matched within pair) ----
        if rc.warm_start:
            ln0, lt0 = match_warm_impulses(
                pts.reshape(NC * R, C, 2), nrm.reshape(NC * R, 2),
                warm_pt.reshape(NC * R, C, 2), warm_nrm.reshape(NC * R, 2),
                warm_n.reshape(NC * R, C), warm_t.reshape(NC * R, C),
                jnp.ones((NC * R,), bool),
                tol=rc.warm_position_tolerance,
                slot_fallback=rc.warm_slot_fallback)
            ln0 = jnp.where(valid, ln0.reshape(NC, R, C), 0.0)
            lt0 = jnp.where(valid, lt0.reshape(NC, R, C), 0.0)
        else:
            ln0 = jnp.zeros((NC, R, C), dtype)
            lt0 = jnp.zeros((NC, R, C), dtype)

        # ---- per-row solver constants ----
        nh = nrm / jnp.maximum(
            jnp.sqrt((nrm * nrm).sum(-1, keepdims=True)), 1e-30)
        th = jnp.stack([-nh[..., 1], nh[..., 0]], axis=-1)
        pos_a = sa["pos"].reshape(NC, R, 2)
        pos_b = sb["pos"].reshape(NC, R, 2)
        ra = pts - pos_a[:, :, None, :]                       # [NC,R,C,2]
        rb = pts - pos_b[:, :, None, :]
        ra_xn = _cross2(ra, nh[:, :, None, :])
        rb_xn = _cross2(rb, nh[:, :, None, :])
        ra_xt = _cross2(ra, th[:, :, None, :])
        rb_xt = _cross2(rb, th[:, :, None, :])
        # own-contact normal->tangent coupling (solver.py ctn)
        ctn = (ra_xn * ra_xt * ii_a_r[..., None]
               + rb_xn * rb_xt * ii_b_r[..., None])

        # per-class mass-splitting degrees over valid contact rows
        nvalid = valid.sum(-1).astype(dtype)                  # [NC, R]
        deg_a_r = jnp.zeros((NC, R), dtype)
        deg_b_r = jnp.zeros((NC, R), dtype)
        for cls in classes:
            sl = slice(cls["base"], cls["base"] + cls["cap"])
            ka = rg_ka[:, sl]
            kb = rg_kb[:, sl]
            d_own = _scat(nvalid[:, sl], ka, KB)              # [NC, KB]
            if cls["kind"] == "big":
                d_cls = d_own
                deg_b = jnp.ones_like(kb, dtype)              # frozen side
            else:
                dx, dy = cls["dx"], cls["dy"]
                d_nb = _scat(nvalid[:, sl], kb, KB)
                d_cls = d_own + roll_cells(d_nb, -dx, -dy)
                deg_b = jnp.maximum(
                    _sel(roll_cells(d_cls, dx, dy), kb, KB), 1.0)
            deg_a = jnp.maximum(_sel(d_cls, ka, KB), 1.0)
            deg_a_r = deg_a_r.at[:, sl].set(deg_a)
            deg_b_r = deg_b_r.at[:, sl].set(deg_b)

        def eff(im_a, im_b, ii_a, ii_b, rx_a, rx_b, dga, dgb):
            s = (im_a * dga + im_b * dgb
                 + rx_a * rx_a * ii_a * dga + rx_b * rx_b * ii_b * dgb)
            return jnp.where(s < 1e-12, 0.0, 1.0 / jnp.maximum(s, 1e-12))

        va_c = valid.astype(dtype)
        eff_n = eff(im_a_r[..., None], im_b_r[..., None],
                    ii_a_r[..., None], ii_b_r[..., None],
                    ra_xn, rb_xn, deg_a_r[..., None],
                    deg_b_r[..., None]) * va_c
        eff_t = eff(im_a_r[..., None], im_b_r[..., None],
                    ii_a_r[..., None], ii_b_r[..., None],
                    ra_xt, rb_xt, deg_a_r[..., None],
                    deg_b_r[..., None]) * va_c

        # ---- velocity solve (staged projected Jacobi over class passes) ----
        U0 = g_u.reshape(NC, KB, 3)

        def class_rel_vel(U, cls, ka, kb, sl):
            ua = _sel(U, ka, KB)                              # [NC,Rc,3]
            if cls["kind"] == "big":
                m = kb[..., None] == jnp.arange(NBIG)[None, None, :]
                ub = jnp.where(m[..., None],
                               big_shape["u"][None, None], 0).sum(2)
            else:
                ub = _sel(roll_cells(U, cls["dx"], cls["dy"]), kb, KB)
            va = ua[..., None, :2] + jnp.stack(
                [-ua[..., None, 2] * ra[:, sl, :, 1],
                 ua[..., None, 2] * ra[:, sl, :, 0]], -1)
            vb = ub[..., None, :2] + jnp.stack(
                [-ub[..., None, 2] * rb[:, sl, :, 1],
                 ub[..., None, 2] * rb[:, sl, :, 0]], -1)
            rv = vb - va                                      # [NC,Rc,C,2]
            vn = (rv * nh[:, sl, None, :]).sum(-1)
            vt = (rv * th[:, sl, None, :]).sum(-1)
            return vn, vt

        def class_apply(U, cls, ka, kb, sl, dln, dlt):
            imp = (nh[:, sl, None, :] * dln[..., None]
                   + th[:, sl, None, :] * dlt[..., None])     # [NC,Rc,C,2]
            tq_a = ra_xn[:, sl] * dln + ra_xt[:, sl] * dlt
            tq_b = rb_xn[:, sl] * dln + rb_xt[:, sl] * dlt
            da = jnp.concatenate(
                [-imp.sum(2) * im_a_r[:, sl, None],
                 -(tq_a.sum(2) * ii_a_r[:, sl])[..., None]], axis=-1)
            U = U + _scat(da, ka, KB)
            if cls["kind"] != "big":
                db = jnp.concatenate(
                    [imp.sum(2) * im_b_r[:, sl, None],
                     (tq_b.sum(2) * ii_b_r[:, sl])[..., None]], axis=-1)
                U = U + roll_cells(_scat(db, kb, KB),
                                   -cls["dx"], -cls["dy"])
            return U

        # warm start: pre-apply cached impulses on approaching contacts
        # (solver.py:229-238 semantics), class-sequential
        U = U0
        ln = jnp.zeros((NC, R, C), dtype)
        lt = jnp.zeros((NC, R, C), dtype)
        if rc.warm_start:
            for cls in classes:
                sl = slice(cls["base"], cls["base"] + cls["cap"])
                ka, kb = rg_ka[:, sl], rg_kb[:, sl]
                vn0, _ = class_rel_vel(U, cls, ka, kb, sl)
                ok = valid[:, sl] & (vn0 <= 0.0)
                ln_s = jnp.where(ok, ln0[:, sl], 0.0)
                lt_s = jnp.where(ok, lt0[:, sl], 0.0)
                U = class_apply(U, cls, ka, kb, sl, ln_s, lt_s)
                ln = ln.at[:, sl].set(ln_s)
                lt = lt.at[:, sl].set(lt_s)

        if _ablate == "novel":
            pass
        else:
            def vel_body(_, carry):
                U, ln, lt = carry
                for cls in classes:
                    sl = slice(cls["base"], cls["base"] + cls["cap"])
                    ka, kb = rg_ka[:, sl], rg_kb[:, sl]
                    vn, vt = class_rel_vel(U, cls, ka, kb, sl)
                    lns = ln[:, sl]
                    lts = lt[:, sl]
                    dl = -eff_n[:, sl] * vn * relax
                    new_ln = jnp.maximum(lns + dl, 0.0)
                    dln = jnp.where(valid[:, sl], new_ln - lns, 0.0)
                    lim = mu * new_ln
                    vt = vt + dln * ctn[:, sl]
                    new_lt = jnp.clip(lts - eff_t[:, sl] * vt * relax,
                                      -lim, lim)
                    dlt = jnp.where(valid[:, sl], new_lt - lts, 0.0)
                    U = class_apply(U, cls, ka, kb, sl, dln, dlt)
                    ln = ln.at[:, sl].set(jnp.where(valid[:, sl],
                                                    new_ln, lns))
                    lt = lt.at[:, sl].set(jnp.where(valid[:, sl],
                                                    new_lt, lts))
                return U, ln, lt

            U, ln, lt = jax.lax.fori_loop(
                0, rc.solver.iterations, vel_body, (U, ln, lt))

        # ---- position solve (Baumgarte, lever arms track; solver.py) ----
        Q0 = jnp.concatenate([g_pos.reshape(NC, KB, 2),
                              g_ang.reshape(NC, KB, 1)], axis=-1)
        act = valid & ((pens - rc.position.slop) > 0.0)
        corr = rc.position.baumgarte * (pens - rc.position.slop)
        nact = act.sum(-1).astype(dtype)
        dga_p = jnp.zeros((NC, R), dtype)
        dgb_p = jnp.zeros((NC, R), dtype)
        for cls in classes:
            sl = slice(cls["base"], cls["base"] + cls["cap"])
            ka, kb = rg_ka[:, sl], rg_kb[:, sl]
            d_own = _scat(nact[:, sl], ka, KB)
            if cls["kind"] == "big":
                d_cls = d_own
                dgb = jnp.ones_like(kb, dtype)
            else:
                dx, dy = cls["dx"], cls["dy"]
                d_cls = d_own + roll_cells(_scat(nact[:, sl], kb, KB),
                                           -dx, -dy)
                dgb = jnp.maximum(
                    _sel(roll_cells(d_cls, dx, dy), kb, KB), 1.0)
            dga_p = dga_p.at[:, sl].set(
                jnp.maximum(_sel(d_cls, ka, KB), 1.0))
            dgb_p = dgb_p.at[:, sl].set(dgb)

        if NBIG:
            big_q = jnp.concatenate(
                [big_shape["pos"], big_shape["angle"][:, None]], axis=-1)

        def pos_body(_, Q):
            for cls in classes:
                sl = slice(cls["base"], cls["base"] + cls["cap"])
                ka, kb = rg_ka[:, sl], rg_kb[:, sl]
                qa = _sel(Q, ka, KB)
                if cls["kind"] == "big":
                    m = kb[..., None] == jnp.arange(NBIG)[None, None, :]
                    qb = jnp.where(m[..., None], big_q[None, None],
                                   0).sum(2)
                else:
                    qb = _sel(roll_cells(Q, cls["dx"], cls["dy"]), kb, KB)
                ra_ = pts[:, sl] - qa[..., None, :2]
                rb_ = pts[:, sl] - qb[..., None, :2]
                rxa = _cross2(ra_, nh[:, sl, None, :])
                rxb = _cross2(rb_, nh[:, sl, None, :])
                den = (im_a_r[:, sl, None] * dga_p[:, sl, None]
                       + im_b_r[:, sl, None] * dgb_p[:, sl, None]
                       + rxa * rxa * ii_a_r[:, sl, None] * dga_p[:, sl, None]
                       + rxb * rxb * ii_b_r[:, sl, None]
                       * dgb_p[:, sl, None])
                scl = jnp.where(act[:, sl] & (den > 1e-12),
                                corr[:, sl] / jnp.maximum(den, 1e-12), 0.0)
                d = nh[:, sl, None, :] * scl[..., None]
                dqa = jnp.concatenate(
                    [-d.sum(2) * im_a_r[:, sl, None],
                     -((rxa * scl).sum(2) * ii_a_r[:, sl])[..., None]],
                    axis=-1)
                Q = Q + _scat(dqa, ka, KB)
                if cls["kind"] != "big":
                    dqb = jnp.concatenate(
                        [d.sum(2) * im_b_r[:, sl, None],
                         ((rxb * scl).sum(2) * ii_b_r[:, sl])[..., None]],
                        axis=-1)
                    Q = Q + roll_cells(_scat(dqb, kb, KB),
                                       -cls["dx"], -cls["dy"])
            return Q

        if _ablate == "nopos":
            Q = Q0
        else:
            Q = jax.lax.fori_loop(0, rc.position.iterations, pos_body, Q0)

        # ---- gather back to body arrays ----
        src = jnp.where(flat >= 0, flat, 0)
        on_grid = flat >= 0
        Uf = U.reshape(NC * KB, 3)
        Qf = Q.reshape(NC * KB, 3)
        new_vel = jnp.where(on_grid[:, None], Uf[src, :2], b.vel[:S])
        new_om = jnp.where(on_grid, Uf[src, 2], b.omega[:S])
        new_pos = jnp.where(on_grid[:, None], Qf[src, :2], b.pos[:S])
        new_ang = jnp.where(on_grid, Qf[src, 2], b.angle[:S])

        nb = b.replace(
            pos=b.pos.at[:S].set(new_pos.astype(b.pos.dtype)),
            vel=b.vel.at[:S].set(new_vel.astype(b.vel.dtype)),
            angle=b.angle.at[:S].set(new_ang.astype(b.angle.dtype)),
            omega=b.omega.at[:S].set(new_om.astype(b.omega.dtype)),
        )
        return state.replace(
            bodies=nb,
            rg_flat=flat, rg_table=table,
            rg_ka=rg_ka, rg_kb=rg_kb, rg_valid=rg_valid,
            rg_verts=g_verts, rg_nverts=g_nverts, rg_radius=g_radius,
            rg_iscirc=g_iscirc, rg_invm=g_invm, rg_invi=g_invi,
            bp_anchor_pos=state.bp_anchor_pos.at[:S].set(anc_p),
            bp_anchor_ang=state.bp_anchor_ang.at[:S].set(anc_a),
            rg_warm_n=jnp.where(valid, ln, 0.0),
            rg_warm_t=jnp.where(valid, lt, 0.0),
            rg_warm_pt=jnp.where(valid[..., None], pts, INF),
            rg_warm_nrm=nh,
        )

    return step

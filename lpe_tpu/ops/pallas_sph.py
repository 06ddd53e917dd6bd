"""Pallas TPU kernels for the SPH pair passes (density, forces).

The XLA cell-dense path (systems/fluid/sph.py) computes all ``ncells*K*K*9``
pair slots unconditionally. These kernels walk a 2-D (row, x-tile) grid with
the 3x3 tile neighborhood resident in VMEM and cut the two big wastes:

- **empty tiles**: a scalar-prefetched per-(row, tile) occupancy table lets a
  program skip its tile entirely (``pl.when``) — dam-break/tank scenes leave
  most of the universe empty, and at large N a row-only skip still pays for
  every empty column of an occupied row (the fluid column fills ~1/3 of x);
- **occupancy slack**: the neighbor-slot loop is a fori bounded by each
  source row-tile neighborhood's actual max occupancy instead of the static
  cap K — pair work scales with real occupancy (typically K/4..K/2), while
  K stays a pure capacity bound for transient compression spikes.

Math is bit-identical to the XLA path (poly6 density + EOS clamp, symmetric
spiky pressure + viscosity Laplacian; reference: fluid_kernels.metal:246-403)
up to float reassociation of the neighbor sum.

Data layout: inputs are field-stacked ``[F, ny+2, K, nxp_t]`` where
``nxp_t = NT*TX`` is the padded-to-tile x extent (zero columns past nxp);
each program's blocks are ``[F, 1, K, TX]`` for the 3x3 (row, tile)
neighborhood. Cross-tile column halos are assembled in-kernel from the
neighbor tiles' edge columns (occupancy zeroed at the grid's outer tiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_X = 128          # lane width; x-tiles per kernel program


def _in_specs(F: int, K: int, TX: int, NT: int):
    """9 (row-offset, tile-offset) BlockSpecs over [F, ny+2, K, NT*TX]."""
    specs = []
    for r in (0, 1, 2):
        for c in (-1, 0, 1):
            def imap(j, t, rm, r=r, c=c):
                return (0, j + r, 0, jnp.clip(t + c, 0, NT - 1))
            specs.append(pl.BlockSpec((F, 1, K, TX), imap,
                                      memory_space=pltpu.VMEM))
    return specs


def _row_blocks(refs):
    """Group the 9 input refs as rows of (left, center, right) tiles."""
    return ((refs[0], refs[1], refs[2]),
            (refs[3], refs[4], refs[5]),
            (refs[6], refs[7], refs[8]))


def _ext(bl, bm, br, f, K, TX, zero_halo=None):
    """[K, TX+2] columns: neighbor tiles' edge columns glued onto the center
    tile. ``zero_halo``: (t, NT) to zero the halo at the grid's outer tiles
    (the clamped neighbor block duplicates the center there)."""
    L = bl[f, 0, :, TX - 1:TX]
    C = bm[f, 0]
    R = br[f, 0, :, :1]
    if zero_halo is not None:
        t, NT = zero_halo
        L = jnp.where(t == 0, 0.0, L)
        R = jnp.where(t == NT - 1, 0.0, R)
    return jnp.concatenate([L, C, R], axis=-1)


def _src_bound(rm_ref, row, t, NT):
    """Max occupancy over the 3-tile neighborhood of a source row."""
    b = jnp.maximum(rm_ref[row, jnp.clip(t - 1, 0, NT - 1)],
                    rm_ref[row, t])
    return jnp.maximum(b, rm_ref[row, jnp.clip(t + 1, 0, NT - 1)])


def _density_kernel(h2, poly6, K, TX, NT, rm_ref, *refs):
    rows = _row_blocks(refs[:9])
    out = refs[9]
    j = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(rm_ref[j + 1, t] == 0)
    def _():
        out[0] = jnp.zeros((K, TX), out.dtype)

    @pl.when(rm_ref[j + 1, t] > 0)
    def _():
        # density keeps the full [K, K, TX] broadcast: its per-pair math
        # (one poly6 eval) is too cheap to amortize a bounded-fori's loop +
        # scratch-staging overhead — measured slower. The force kernel, with
        # ~4x the math per pair, wins from the occupancy bound.
        FX, FY, FM, FO = 0, 1, 2, 3
        ctr = rows[1][1]
        cx = ctr[FX, 0][:, None, :]            # [K, 1, TX] center cells
        cy = ctr[FY, 0][:, None, :]
        k2 = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
        acc = jnp.zeros((K, TX), out.dtype)
        for r, (bl, bm, br) in enumerate(rows):
            ex = _ext(bl, bm, br, FX, K, TX)
            ey = _ext(bl, bm, br, FY, K, TX)
            em = _ext(bl, bm, br, FM, K, TX)
            eo = _ext(bl, bm, br, FO, K, TX, (t, NT))
            live = k2 < _src_bound(rm_ref, j + r, t, NT)
            for dx in range(3):
                nbx = ex[:, dx:dx + TX][None]  # [1, K, TX]
                nby = ey[:, dx:dx + TX][None]
                nbm = em[:, dx:dx + TX][None]
                nbo = eo[:, dx:dx + TX][None]
                ddx = cx - nbx
                ddy = cy - nby
                r2 = ddx * ddx + ddy * ddy
                w = jnp.where(live & (nbo > 0) & (r2 < h2),
                              poly6 * (h2 - r2) ** 3, 0.0)
                acc = acc + (nbm * w).sum(1)
        # the self pair (center row, dx=1, k1==k2) is INCLUDED: density
        # self-contributes in the reference (metal:284-295)
        out[0] = acc


def _force_kernel(h, h2, spiky, visc_lap, viscosity, min_d2, min_rho,
                  K, TX, NT, rm_ref, *refs):
    rows = _row_blocks(refs[:9])
    outx, outy = refs[9], refs[10]
    j = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(rm_ref[j + 1, t] == 0)
    def _():
        outx[0] = jnp.zeros((K, TX), outx.dtype)
        outy[0] = jnp.zeros((K, TX), outy.dtype)

    scratch = refs[11]                         # VMEM [8, K, TX+2]
    # neighbor slots per iteration: Mosaic requires dynamic sublane slices
    # to start at provable multiples of 8, so chunks are 8-wide (single-slot
    # slices are the unaligned exception)
    CH = 8 if K % 8 == 0 else 1

    @pl.when(rm_ref[j + 1, t] > 0)
    def _():
        FX, FY, FVX, FVY, FM, FR, FP, FO = range(8)
        ctr = rows[1][1]
        cx = ctr[FX, 0][:, None, :]            # [K, 1, TX]
        cy = ctr[FY, 0][:, None, :]
        cvx = ctr[FVX, 0][:, None, :]
        cvy = ctr[FVY, 0][:, None, :]
        crho = ctr[FR, 0][:, None, :]
        cp = ctr[FP, 0][:, None, :]
        cocc = ctr[FO, 0][:, None, :]
        cterm = cp / jnp.maximum(crho * crho, 1e-30)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (K, CH, 1), 0)
        kc = jax.lax.broadcasted_iota(jnp.int32, (K, CH, 1), 1)
        fx_a = jnp.zeros((K, TX), outx.dtype)
        fy_a = jnp.zeros((K, TX), outy.dtype)
        # occupancy-bounded neighbor-slot fori (see _density_kernel),
        # CH slots per iteration: amortizes loop overhead while keeping
        # pair work proportional to real occupancy (occ masks cover the
        # chunk's tail slots)
        for r, (bl, bm, br) in enumerate(rows):
            scratch[...] = jnp.stack(
                [_ext(bl, bm, br, f, K, TX) for f in range(7)]
                + [_ext(bl, bm, br, FO, K, TX, (t, NT))])   # [8, K, TX+2]
            bound = _src_bound(rm_ref, j + r, t, NT)

            def body(i, acc, r=r):
                fxa, fya = acc
                sl = scratch[:, pl.ds(i * CH, CH), :]       # [8, CH, TX+2]
                for dx in range(3):
                    c = lambda f: sl[f, :, dx:dx + TX][None]   # [1, CH, TX]
                    nbx, nby = c(FX), c(FY)
                    nbvx, nbvy = c(FVX), c(FVY)
                    nbm, nbrho, nbp = c(FM), c(FR), c(FP)
                    nbo = c(FO)
                    ddx = cx - nbx                          # [K, CH, TX]
                    ddy = cy - nby
                    r2 = ddx * ddx + ddy * ddy
                    ok = (cocc * nbo > 0) & (r2 >= min_d2) & (r2 < h2) \
                        & (nbrho >= min_rho) & (crho >= min_rho)
                    if r == 1 and dx == 1:
                        ok = ok & (k1 != i * CH + kc)
                    rr = jnp.sqrt(jnp.maximum(r2, 1e-30))
                    term = cterm + nbp / jnp.maximum(nbrho * nbrho, 1e-30)
                    w_spiky = spiky * (h - rr) ** 2
                    f_press = -nbm * term * w_spiky
                    fx = f_press * ddx / rr
                    fy = f_press * ddy / rr
                    f_visc = viscosity * nbm * (
                        visc_lap * (h - rr) / jnp.maximum(nbrho, 1e-30))
                    fx = fx - f_visc * (cvx - nbvx)
                    fy = fy - f_visc * (cvy - nbvy)
                    fxa = fxa + jnp.where(ok, fx, 0.0).sum(1)
                    fya = fya + jnp.where(ok, fy, 0.0).sum(1)
                return fxa, fya

            nit = (bound + CH - 1) // CH
            fx_a, fy_a = jax.lax.fori_loop(0, nit, body, (fx_a, fy_a))
        outx[0] = fx_a
        outy[0] = fy_a


def _grid_spec(ny: int, NT: int, F: int, K: int, TX: int, n_out: int,
               dtype=jnp.float32, scratch: bool = False):
    out_spec = pl.BlockSpec((1, K, TX), lambda j, t, rm: (j, 0, t),
                            memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny, NT),
        in_specs=_in_specs(F, K, TX, NT),
        out_specs=out_spec if n_out == 1 else [out_spec] * n_out,
        # staging buffer for the halo-extended source row: dynamic slot
        # indexing (the occupancy-bounded fori) must read through a ref
        scratch_shapes=([pltpu.VMEM((F, K, TX + 2), dtype)] if scratch
                        else []),
    )


# ---------------------------------------------------------------------------
# Fused rigid-fluid coupling, per-cell rasterized candidates
# ---------------------------------------------------------------------------
# The reference couples EVERY fluid particle against EVERY rigid
# (fluid_kernels.metal:679-924, O(N_f x N_r) loops). Round 3's TPU port
# bounded that with a per-ROW candidate list, which silently drops rigids
# beyond its static cap once rows get rigid-dense (the 100k+10k north star
# piles ~10^3 rigid AABBs into one row band). The redesign bins candidates
# at the same granularity the particles already live at — the grid CELL:
#
# - sph.py::_couple_field rasterizes the tick-constant rigid proxies into a
#   dense field [rows, S, W, NT*TX]: for each padded grid column, the <= S
#   rigids whose (slack-widened) AABB covers that cell, as W parameter
#   planes per slot (layout below). Built once per tick with sorted-window
#   one-hot matmuls — no gathers, no scatters.
# - The kernel's candidate loop runs over the S slots with LANE-VECTOR
#   parameters: every grid column couples against its own rigids in the
#   same [K, TX] pass. Work scales with local rigid density (S ~ 8-16)
#   instead of row density (unbounded), and the math is exact for every
#   particle within one cell of its stored bin (the slack).
# - Oversized solids (tank walls: AABBs span whole rows) go through a dense
#   side-channel instead: a [NBIG+1, W] table, one scalar-parameter pass
#   per big solid, skipped per tile by AABB overlap.
# - Per-rigid force partials leave the kernel as per-(row, slot, column)
#   PLANES [rows, 3*S, NT*TX] that the caller accumulates across sub-steps
#   (rigid state is a tick constant; forces apply once per tick,
#   fluid.cpp:526-580) and reduces to per-rigid sums once per tick with the
#   transposed rasterization matmul (sph.py::_couple_reduce) — no per-lane
#   scatter anywhere.
#
# Candidate parameter plane layout (the rasterized field's W axis AND the
# big-solid table's columns; sph.py::_rig_cols builds both):
#   0 pos.x, 1 pos.y, 2 vel.x, 3 vel.y, 4 omega, 5 mass, 6 inertia,
#   7 radius, 8 is_circle, 9 minx, 10 miny, 11 maxx, 12 maxy,
#   13+2v / 14+2v world vertex v.
# Vertex rings are padded with vertex 0, making the edge loops vertex-count
# free; a slot/row with mass == 0 is empty (inactive entities are zeroed).
_RW_PX, _RW_PY, _RW_VX, _RW_VY, _RW_OM, _RW_M, _RW_I, _RW_RAD, _RW_CIR, \
    _RW_MINX, _RW_MINY, _RW_MAXX, _RW_MAXY = range(13)
_RW_V0 = 13


def rig_width(V: int) -> int:
    """Candidate parameter planes for V-vertex rings, padded to a multiple
    of 8 so [S, W, TX] field blocks tile cleanly on the sublane axis."""
    return -(-(_RW_V0 + 2 * V) // 8) * 8


def hoist_particle_terms(cn, py, rho, p, m):
    """Per-PARTICLE factors of the coupling impulse math, hoisted out of
    the per-candidate loop (they are candidate-independent, and the old
    layout recomputed the |vol|^(2/3) pow + hydrostatic column for every
    one of up to S slots). Shared verbatim by the Pallas kernels and the
    XLA impulse_solve so kernel<->XLA parity stays bit-tight.

    Returns dict(parea, vmul, bmul):
      parea = (p + rho_eff*g*depth) * area   (pressure force / depth_f)
      vmul  = visc*visc_scale*rho_eff*sub_dt (viscous force / (tmag*depth_f))
      bmul  = buoyancy*area*g*rho_eff        (buoyancy force / -pen)
    """
    dens = jnp.where(rho > 0.0, rho, cn["rest_density"])
    vol = jnp.where(rho > 0, m / jnp.maximum(rho, 1e-30),
                    m / cn["rest_density"])
    area = jnp.abs(vol) ** (2.0 / 3.0)
    depth = jnp.minimum(py / cn["depth_estimate_scale"], 1.0)
    hydro = dens * cn["gravity"] * depth
    parea = (p + hydro) * area
    vmul = cn["viscosity"] * cn["viscosity_scale"] * dens * cn["sub_dt"]
    bmul = cn["buoyancy_strength"] * area * cn["gravity"] * dens
    return dict(parea=parea, vmul=vmul, bmul=bmul)


def _cand_math(V, cn, gp, in_aabb, px, py, vx1, vy1, hp):
    """Coupling math of ONE candidate against a [K, TX] particle block.

    ``gp(i)`` reads candidate parameter plane i (_RW_* layout): a traced
    SCALAR for the dense big-solid loop, or a [TX] lane vector for the
    rasterized slots (each grid column carries its own rigid) — all math
    broadcasts over either. ``hp`` carries the hoisted per-particle
    factors (hoist_particle_terms). Returns (inside, corr_x, corr_y, fx,
    fy, tq, act): corr_* inside-masked and relax-scaled, fx/fy/tq
    act-masked.

    Ports the XLA overlap/position/impulse solves (systems/fluid/sph.py
    overlap_info/position_solve/impulse_solve; reference:
    fluid_kernels.metal:533-924). The pad edges of the vertex ring are
    degenerate (zero length), which both polygon loops already ignore, so
    no vertex-count masking is needed."""
    z = jnp.zeros(px.shape, px.dtype)
    fz = jnp.zeros(px.shape, jnp.bool_)
    rpx, rpy = gp(_RW_PX), gp(_RW_PY)
    rvxs, rvys, rom = gp(_RW_VX), gp(_RW_VY), gp(_RW_OM)
    rmass, rinert, rrad = gp(_RW_M), gp(_RW_I), gp(_RW_RAD)
    rx = px - rpx
    ry = py - rpy
    # circle overlap (skipped at trace time for all-polygon scenes)
    if cn["any_circle"]:
        d2 = rx * rx + ry * ry
        dist_c = jnp.sqrt(jnp.maximum(d2, 1e-30))
        inside_c = d2 < rrad * rrad
    else:
        dist_c = jnp.full(px.shape, 1.0, px.dtype)
        inside_c = fz
    # polygon overlap: ray-cast parity + closest boundary point
    # (reference: metal:125-194); skipped at trace time for all-circle
    # scenes. Pad vertices duplicate vertex 0: the (0 -> V-1) and
    # (v >= nverts) edges are degenerate and contribute nothing.
    # The crossing test is the division-free form of px < xi +
    # (xj-xi)(py-yi)/denom — both inequality directions spelled out in
    # boolean algebra (multiplying through by denom flips on its sign;
    # Mosaic cannot select on vector<i1>). Mirrored in sph.py
    # _point_in_polygon so kernel and XLA agree bit-for-bit.
    parity = jnp.zeros(px.shape, jnp.int32)
    best_d2 = jnp.full(px.shape, 1e30, px.dtype)
    cxb, cyb = z, z
    for v in range(V if cn["any_poly"] else 0):
        xi = gp(_RW_V0 + 2 * v)
        yi = gp(_RW_V0 + 2 * v + 1)
        xj = gp(_RW_V0 + 2 * ((v - 1) % V))
        yj = gp(_RW_V0 + 2 * ((v - 1) % V) + 1)
        denom = yj - yi
        denc = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        lhs = (px - xi) * denc
        rhs = (xj - xi) * (py - yi)
        straddle = (yi > py) != (yj > py)
        pos = denc > 0
        crosses = straddle & ((pos & (lhs < rhs)) | (~pos & (lhs > rhs)))
        parity = parity + crosses.astype(jnp.int32)
        # closest point on edge v -> v+1 (ring-wrapped)
        x2s = gp(_RW_V0 + 2 * ((v + 1) % V))
        y2s = gp(_RW_V0 + 2 * ((v + 1) % V) + 1)
        ex = x2s - xi
        ey = y2s - yi
        el2 = ex * ex + ey * ey
        iel = 1.0 / jnp.where(el2 < 1e-16, 1e-16, el2)
        tt = ((px - xi) * ex + (py - yi) * ey) * iel
        tt = jnp.clip(tt, 0.0, 1.0)
        qx = xi + tt * ex
        qy = yi + tt * ey
        qd2 = (px - qx) ** 2 + (py - qy) ** 2
        qd2 = jnp.where(el2 >= 1e-16, qd2, 1e30)
        better = qd2 < best_d2
        best_d2 = jnp.where(better, qd2, best_d2)
        cxb = jnp.where(better, qx, cxb)
        cyb = jnp.where(better, qy, cyb)
    inside_p = (parity % 2) == 1
    pdx = px - cxb
    pdy = py - cyb
    dist_p = jnp.sqrt(jnp.maximum(pdx * pdx + pdy * pdy, 1e-30))
    if cn["any_circle"] and cn["any_poly"]:
        is_c = gp(_RW_CIR) > 0
        # boolean algebra, not jnp.where: Mosaic cannot legalize
        # arith.select on vector<i1> operands (bool-valued selects)
        inside_s = (is_c & inside_c) | (~is_c & inside_p)
    else:                      # uniform scenes: constant predicate,
        is_c = bool(cn["any_circle"])   # dead branch folds away
        inside_s = inside_c if is_c else inside_p
    inside = in_aabb & inside_s

    # ---- position correction (metal:533-668) ----
    # direction components share one reciprocal per shape family (was one
    # divide per component)
    msd = cn["min_safe_distance"]
    d_c = jnp.maximum(dist_c, msd)
    inv_dc = 1.0 / d_c
    dirx_c = jnp.where(dist_c < msd, 1.0, rx * inv_dc)
    diry_c = jnp.where(dist_c < msd, 0.0, ry * inv_dc)
    pen_c = (rrad - d_c) + cn["safety_margin"]
    d_p = jnp.maximum(dist_p, msd)
    inv_dp = 1.0 / d_p
    dirx_p = jnp.where(dist_p < msd, 1.0, pdx * inv_dp)
    diry_p = jnp.where(dist_p < msd, 0.0, pdy * inv_dp)
    pen_p = d_p + cn["safety_margin"]
    corr_x = jnp.where(is_c, -dirx_c * pen_c, dirx_p * pen_p)
    corr_y = jnp.where(is_c, -diry_c * pen_c, diry_p * pen_p)
    corr_x = jnp.where(inside, corr_x * cn["relax_factor"], 0.0)
    corr_y = jnp.where(inside, corr_y * cn["relax_factor"], 0.0)

    # ---- impulse exchange (metal:679-924) ----
    mpen = cn["min_penetration"]
    rb_v2 = rvxs * rvxs + rvys * rvys + rom * rom
    ok_r = rb_v2 <= cn["max_safe_velocity_sq"]
    pen = jnp.where(is_c,
                    jnp.maximum(rrad - jnp.maximum(dist_c, mpen), 0.0),
                    jnp.maximum(dist_p, mpen))
    inv_nc = 1.0 / jnp.maximum(dist_c, mpen)
    inv_np = 1.0 / jnp.maximum(dist_p, mpen)
    nrm_x = jnp.where(is_c, rx * inv_nc, pdx * inv_np)
    nrm_y = jnp.where(is_c, ry * inv_nc, pdy * inv_np)
    act = inside & ok_r & (pen >= mpen)
    rig_vx = rvxs - rom * ry
    rig_vy = rvys + rom * rx
    rvx = vx1 - rig_vx
    rvy = vy1 - rig_vy
    depth_f = jnp.tanh(cn["depth_transition_rate"] * pen
                       / cn["depth_scale"])
    vn = rvx * nrm_x + rvy * nrm_y
    tvx = rvx - nrm_x * vn
    tvy = rvy - nrm_y * vn
    pforce = hp["parea"] * depth_f
    maxF = cn["max_force"]
    fx = nrm_x * jnp.minimum(pforce, maxF * cn["pressure_force_ratio"])
    fy = nrm_y * jnp.minimum(pforce, maxF * cn["pressure_force_ratio"])
    tmag = jnp.sqrt(tvx * tvx + tvy * tvy)
    hast = tmag > cn["min_rel_velocity"]
    vforce = hp["vmul"] * tmag * depth_f
    vcap = jnp.minimum(vforce, maxF * cn["viscous_force_ratio"])
    tdir = vcap / jnp.maximum(tmag, 1e-30)
    fx = fx + jnp.where(hast, -tvx * tdir, 0.0)
    fy = fy + jnp.where(hast, -tvy * tdir, 0.0)
    buoy = -(hp["bmul"] * pen)
    bfy = jnp.where(rmass > 0.1, buoy, 0.0)
    keep = fx * fx + (fy + bfy) ** 2 <= maxF * maxF
    fy = jnp.where(keep, fy + bfy, fy)
    fmag2 = fx * fx + fy * fy
    fscale = jnp.where(fmag2 > maxF * maxF,
                       maxF * jax.lax.rsqrt(jnp.maximum(fmag2, 1e-30)),
                       1.0)
    fx = fx * fscale
    fy = fy * fscale
    tq = jnp.clip(rx * fy - ry * fx, -cn["max_torque"], cn["max_torque"])
    spin = jnp.abs(rom) > cn["angular_damping_threshold"]
    tq = tq - jnp.where(
        spin, cn["angular_damping_factor"] * jnp.sign(rom)
        * jnp.abs(rom) * rinert, 0.0)
    fx = jnp.where(act, fx, 0.0)
    fy = jnp.where(act, fy, 0.0)
    tq = jnp.where(act, tq, 0.0)
    return inside, corr_x, corr_y, fx, fy, tq, act


def _couple_fin(cn, cacc, px, py, vx1, vy1, m, ax, ay):
    """Post-candidate-loop finalization: fluid back-reaction, capped
    position push-out, PBD velocity fix-up. Identical math to the XLA
    path's tails (sph.py position_solve/impulse_solve ends)."""
    acx, acy = cacc[0], cacc[1]
    sfx, sfy = cacc[2], cacc[3]
    had_pos = cacc[4] > 0
    had_imp = cacc[5] > 0
    ffx = -sfx * cn["fluid_force_scale"]
    ffy = -sfy * cn["fluid_force_scale"]
    fm = jnp.sqrt(ffx * ffx + ffy * ffy)
    fsc = jnp.where(fm > cn["fluid_force_max"],
                    cn["fluid_force_max"] / jnp.maximum(fm, 1e-30), 1.0)
    inv_m = jnp.where(m > 1e-4, 1.0 / m, 1.0)
    axo = jnp.where(had_imp, ax + ffx * fsc * inv_m, ax)
    ayo = jnp.where(had_imp, ay + ffy * fsc * inv_m, ay)
    mag = jnp.sqrt(acx * acx + acy * acy)
    scale = jnp.where(mag > cn["max_correction"],
                      cn["max_correction"] / jnp.maximum(mag, 1e-30),
                      1.0)
    nx_ = px - acx * scale
    ny_ = py - acy * scale
    off = cn["boundary_offset"]
    nx_ = jnp.where(nx_ < 0.0, off, nx_)
    ny_ = jnp.where(ny_ < 0.0, off, ny_)
    ddx = nx_ - px
    ddy = ny_ - py
    dmag = jnp.sqrt(ddx * ddx + ddy * ddy)
    moved = had_pos & (dmag > cn["min_position_change"])
    cdx = ddx / jnp.maximum(dmag, 1e-30)
    cdy = ddy / jnp.maximum(dmag, 1e-30)
    valong = vx1 * cdx + vy1 * cdy
    fix = moved & (valong < 0.0)
    return (nx_, ny_,
            jnp.where(fix, vx1 - valong * cdx, vx1),
            jnp.where(fix, vy1 - valong * cdy, vy1),
            axo, ayo)


def _couple_rows(S, NBIG, V, cn, K, TX, t, fld_ref, big_ref, opl, orf, cacc,
                 px, py, vx1, vy1, rho, p, m, occ, ax, ay):
    """Slot loop (rasterized per-cell candidates, lane-vector params) +
    big-solid loop (dense scalar params) + finalization. Per-slot force
    partials (fx, fy, tq summed over the K cell slots) go to the plane
    output ``opl`` [1, 3S, TX]; per-big sums to the SMEM row ``orf``
    [1, NT, 3*NBIG]. ``cacc`` accumulates the cross-candidate planes
    (0 acx, 1 acy, 2 sfx, 3 sfy, 4 had_pos, 5 had_imp). Every candidate's
    heavy math sits under pl.when(any lane inside its AABB)."""
    cacc[...] = jnp.zeros((6, K, TX), px.dtype)
    opl[0] = jnp.zeros((3 * S, TX), px.dtype)
    if NBIG:
        for i in range(3 * NBIG):
            orf[0, t, i] = jnp.float32(0.0)
    occp = occ > 0
    # candidate-independent particle factors, once per block instead of
    # once per slot (the pow in |vol|^(2/3) dominated the old per-slot
    # recompute)
    hp = hoist_particle_terms(cn, py, rho, p, m)
    for s in range(S):
        def gp(i, s=s):
            return fld_ref[0, s, i]
        in_aabb = (px >= gp(_RW_MINX)) & (px <= gp(_RW_MAXX)) & \
                  (py >= gp(_RW_MINY)) & (py <= gp(_RW_MAXY)) & \
                  (gp(_RW_M) > 0) & occp

        @pl.when(jnp.any(in_aabb))
        def _(s=s, gp=gp, in_aabb=in_aabb):
            inside, cx_, cy_, fx, fy, tq, act = _cand_math(
                V, cn, gp, in_aabb, px, py, vx1, vy1, hp)
            cacc[0] = cacc[0] + cx_
            cacc[1] = cacc[1] + cy_
            cacc[2] = cacc[2] + fx
            cacc[3] = cacc[3] + fy
            cacc[4] = jnp.maximum(cacc[4], inside.astype(px.dtype))
            cacc[5] = jnp.maximum(cacc[5], act.astype(px.dtype))
            opl[0, 3 * s + 0] = fx.sum(0)
            opl[0, 3 * s + 1] = fy.sum(0)
            opl[0, 3 * s + 2] = tq.sum(0)

    for bi in range(NBIG):
        brow = big_ref[bi]

        def gp(i, brow=brow):
            return brow[i]
        in_aabb = (px >= gp(_RW_MINX)) & (px <= gp(_RW_MAXX)) & \
                  (py >= gp(_RW_MINY)) & (py <= gp(_RW_MAXY)) & \
                  (gp(_RW_M) > 0) & occp

        @pl.when(jnp.any(in_aabb))
        def _(bi=bi, gp=gp, in_aabb=in_aabb):
            inside, cx_, cy_, fx, fy, tq, act = _cand_math(
                V, cn, gp, in_aabb, px, py, vx1, vy1, hp)
            cacc[0] = cacc[0] + cx_
            cacc[1] = cacc[1] + cy_
            cacc[2] = cacc[2] + fx
            cacc[3] = cacc[3] + fy
            cacc[4] = jnp.maximum(cacc[4], inside.astype(px.dtype))
            cacc[5] = jnp.maximum(cacc[5], act.astype(px.dtype))
            orf[0, t, 3 * bi + 0] = fx.sum()
            orf[0, t, 3 * bi + 1] = fy.sum()
            orf[0, t, 3 * bi + 2] = tq.sum()

    return _couple_fin(cn, cacc, px, py, vx1, vy1, m, ax, ay)


def _coupling_kernel(S, NBIG, V, cn, K, TX, *refs):
    """Fused rigid-fluid coupling over one (row, tile) block (see the
    section comment above). Skipped tiles copy particle planes through and
    zero their partial outputs."""
    if NBIG:
        (cpl_ref, fld_ref, big_ref, d_ref,
         ox, oy, ovx, ovy, oax, oay, opl, orf, cacc) = refs
    else:
        (cpl_ref, fld_ref, d_ref,
         ox, oy, ovx, ovy, oax, oay, opl, cacc) = refs
        big_ref = orf = None
    j = pl.program_id(0)
    t = pl.program_id(1)
    FX, FY, FVX, FVY, FR, FP, FM, FO, FAX, FAY = range(10)
    d = d_ref[:, 0]                    # [10, K, TX]

    @pl.when(cpl_ref[j + 1, t] == 0)
    def _():
        ox[0] = d[FX]
        oy[0] = d[FY]
        ovx[0] = d[FVX]
        ovy[0] = d[FVY]
        oax[0] = d[FAX]
        oay[0] = d[FAY]
        opl[0] = jnp.zeros((3 * S, TX), d.dtype)
        if NBIG:
            for i in range(3 * NBIG):
                orf[0, t, i] = jnp.float32(0.0)

    @pl.when(cpl_ref[j + 1, t] > 0)
    def _():
        nx_, ny_, vxo, vyo, axo, ayo = _couple_rows(
            S, NBIG, V, cn, K, TX, t, fld_ref, big_ref, opl, orf, cacc,
            d[FX], d[FY], d[FVX], d[FVY], d[FR], d[FP], d[FM], d[FO],
            d[FAX], d[FAY])
        ox[0] = nx_
        oy[0] = ny_
        ovx[0] = vxo
        ovy[0] = vyo
        oax[0] = axo
        oay[0] = ayo


def _fld_spec(S, W, TX, pad_row):
    """BlockSpec of the rasterized field with a DMA-skip index map: tiles
    the coupling mask rules out all point at block (0, ..., 0) — repeated
    indices across consecutive programs skip the copy entirely, so HBM
    traffic scales with COUPLED tiles, not grid size."""
    def imap(j, t, cpl):
        on = cpl[j + pad_row, t] > 0
        return (jnp.where(on, j + pad_row, 0), 0, 0, jnp.where(on, t, 0))
    return pl.BlockSpec((1, S, W, TX), imap, memory_space=pltpu.VMEM)


def make_coupling(ny: int, NT: int, K: int, S: int, NBIG: int, V: int,
                  consts: dict, TX: int = TILE_X, dtype=jnp.float32,
                  interpret: bool = False):
    """Returns ``couple(cpl2, fld, [big,] D10) -> (x, y, vx, vy, ax, ay,
    pline[, bigp])``.

    D10 is the particle field stack [10(x,y,vx1,vy1,rho,p,m,occ,ax,ay),
    ny+2, K, NT*TX]; cpl2 [ny+2, NT] int32 marks (row, tile)s with
    occupancy AND a rigid AABB overlap; fld is the tick-constant rasterized
    candidate field [ny+2, S, W, NT*TX] (sph.py::_couple_field); big the
    [NBIG+1, W] dense side-channel table. Outputs: interior particle rows
    [ny, K, NT*TX] x6, per-(row, slot) force partial planes
    [ny, 3*S, NT*TX] (accumulate across sub-steps, reduce per tick with
    sph.py::_couple_reduce), and per-(row, tile, big) sums
    [ny, NT, 3*NBIG]."""
    W = rig_width(V)
    kern = functools.partial(_coupling_kernel, S, NBIG, V, consts, K, TX)
    out_spec = pl.BlockSpec((1, K, TX), lambda j, t, cpl: (j, 0, t),
                            memory_space=pltpu.VMEM)
    pl_spec = pl.BlockSpec((1, 3 * S, TX), lambda j, t, cpl: (j, 0, t),
                           memory_space=pltpu.VMEM)
    in_specs = [_fld_spec(S, W, TX, 1)]
    if NBIG:
        in_specs.append(pl.BlockSpec((NBIG + 1, W), lambda j, t, cpl: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((10, 1, K, TX),
                                 lambda j, t, cpl: (0, j + 1, 0, t),
                                 memory_space=pltpu.VMEM))
    out_specs = [out_spec] * 6 + [pl_spec]
    shp = jax.ShapeDtypeStruct((ny, K, NT * TX), dtype)
    out_shape = [shp] * 6 + [jax.ShapeDtypeStruct((ny, 3 * S, NT * TX),
                                                  dtype)]
    if NBIG:
        # one SMEM block spans all NT tiles of a row (stays resident across
        # the row's programs, each writes only its own t slice)
        out_specs.append(pl.BlockSpec((1, NT, 3 * NBIG),
                                      lambda j, t, cpl: (j, 0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((ny, NT, 3 * NBIG), dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((6, K, TX), dtype)],
    )
    call = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)

    def couple(cpl2, fld, big, D10):
        args = (cpl2, fld, big, D10) if NBIG else (cpl2, fld, D10)
        return call(*args)

    return couple


def _coupling9_kernel(S, NBIG, V, cn, K, TX, half_dt, stiffness, ny, *refs):
    """Stacked-state coupling: consumes the migrated stack M9 plus the pair
    sweep's (rho, fx, fy) rows directly, computes the second velocity kick
    and EOS pressure inline, and emits the NEXT sub-step's input stack ST
    [9(x,y,vx,vy,ax,ay,m,id,occ), K, TX] — no XLA restack between kernels.
    Physics is _coupling_kernel's via the shared _couple_rows."""
    if NBIG:
        (cpl_ref, fld_ref, big_ref, m9_ref, rho_ref, fx_ref, fy_ref,
         ost, opl, orf, cacc) = refs
    else:
        (cpl_ref, fld_ref, m9_ref, rho_ref, fx_ref, fy_ref,
         ost, opl, cacc) = refs
        big_ref = orf = None
    p = pl.program_id(0)            # padded row, 0..ny+1
    t = pl.program_id(1)
    apron = (p == 0) | (p == ny + 1)

    def zero_parts():
        opl[0] = jnp.zeros((3 * S, TX), ost.dtype)
        if NBIG:
            for i in range(3 * NBIG):
                orf[0, t, i] = jnp.float32(0.0)

    @pl.when(apron)
    def _():
        ost[0] = jnp.zeros((9, K, TX), ost.dtype)
        zero_parts()

    @pl.when(~apron)
    def _():
        x1 = m9_ref[0, _M9_X]
        y1 = m9_ref[0, _M9_Y]
        m = m9_ref[0, _M9_M]
        occ = m9_ref[0, _M9_OCC]
        idp = m9_ref[0, _M9_ID]
        fxi = fx_ref[0]
        fyi = fy_ref[0]
        rhoi = rho_ref[0]
        # second kick (metal:428-441) + EOS, inline
        vx1 = m9_ref[0, _M9_HX] + half_dt * fxi
        vy1 = m9_ref[0, _M9_HY] + half_dt * fyi
        pe = jnp.maximum(stiffness * (rhoi - cn["rest_density"]), 0.0)
        off = cn["boundary_offset"]

        @pl.when(cpl_ref[p, t] == 0)
        def _():
            # copy-through, with the same out-of-tank floor clamp the XLA
            # path applies globally every sub-step
            ost[0, _ST_X] = jnp.where(x1 < 0.0, off, x1)
            ost[0, _ST_Y] = jnp.where(y1 < 0.0, off, y1)
            ost[0, _ST_VX] = vx1
            ost[0, _ST_VY] = vy1
            ost[0, _ST_AX] = fxi
            ost[0, _ST_AY] = fyi
            ost[0, _ST_M] = m
            ost[0, _ST_ID] = idp
            ost[0, _ST_OCC] = occ
            zero_parts()

        @pl.when(cpl_ref[p, t] > 0)
        def _():
            nx_, ny_, vxo, vyo, axo, ayo = _couple_rows(
                S, NBIG, V, cn, K, TX, t, fld_ref, big_ref, opl, orf, cacc,
                x1, y1, vx1, vy1, rhoi, pe, m, occ, fxi, fyi)
            ost[0, _ST_X] = nx_
            ost[0, _ST_Y] = ny_
            ost[0, _ST_VX] = vxo
            ost[0, _ST_VY] = vyo
            ost[0, _ST_AX] = axo
            ost[0, _ST_AY] = ayo
            ost[0, _ST_M] = m
            ost[0, _ST_ID] = idp
            ost[0, _ST_OCC] = occ


def make_coupling9(ny: int, NT: int, K: int, S: int, NBIG: int, V: int,
                   consts: dict, half_dt: float, stiffness: float,
                   TX: int = TILE_X, dtype=jnp.float32,
                   interpret: bool = False):
    """Returns ``couple9(cpl2, fld, [big,] M9, rho, fx, fy) -> (ST,
    pline[, bigp])``.

    M9 is make_migrate_ring's output stack [ny+2, 9, K, NT*TX]; rho/fx/fy
    the pair sweep's interior rows [ny, K, NT*TX]; fld/big as in
    make_coupling. ST is the next sub-step's input stack
    [ny+2, 9(x,y,vx,vy,ax,ay,m,id,occ), K, NT*TX] (apron rows zero);
    pline the per-(padded row, slot) force partial planes
    [ny+2, 3*S, NT*TX]; bigp the per-(padded row, tile, big) sums
    [ny+2, NT, 3*NBIG]."""
    W = rig_width(V)
    kern = functools.partial(_coupling9_kernel, S, NBIG, V, consts, K, TX,
                             half_dt, stiffness, ny)
    row_spec = pl.BlockSpec((1, K, TX),
                            lambda p, t, cpl: (jnp.clip(p - 1, 0, ny - 1),
                                               0, t),
                            memory_space=pltpu.VMEM)
    in_specs = [_fld_spec(S, W, TX, 0)]
    if NBIG:
        in_specs.append(pl.BlockSpec((NBIG + 1, W), lambda p, t, cpl: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((1, 9, K, TX), lambda p, t, cpl: (p, 0, 0, t),
                     memory_space=pltpu.VMEM),
        row_spec, row_spec, row_spec,
    ]
    out_specs = [
        pl.BlockSpec((1, 9, K, TX), lambda p, t, cpl: (p, 0, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * S, TX), lambda p, t, cpl: (p, 0, t),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ny + 2, 9, K, NT * TX), dtype),
        jax.ShapeDtypeStruct((ny + 2, 3 * S, NT * TX), dtype),
    ]
    if NBIG:
        out_specs.append(pl.BlockSpec((1, NT, 3 * NBIG),
                                      lambda p, t, cpl: (p, 0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((ny + 2, NT, 3 * NBIG),
                                              dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny + 2, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((6, K, TX), dtype)],
    )
    call = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)

    def couple9(cpl2, fld, big, M9, rho, fx, fy):
        args = (cpl2, fld, big, M9, rho, fx, fy) if NBIG \
            else (cpl2, fld, M9, rho, fx, fy)
        return call(*args)

    return couple9



def _sweep_kernel(h, h2, poly6, spiky, visc_lap, viscosity, min_d2, min_rho,
                  stiffness, rest_density, K, TX, NT, NTX, ny,
                  rm_ref, d_ref, orho, outx, outy, slabs, rho_ring, sems):
    """Rolling-window fused density+force sweep over grid rows.

    One program per interior row j (padded row p = j+1). Row slabs
    [6(x,y,vx,vy,m,occ), K, NTX] are DMA'd from HBM into a 5-slot VMEM ring
    — each row is fetched ONCE per pass (the 9-block kernels fetch every row
    3x as the top/center/bottom neighbor of 3 programs, ~11 small DMAs per
    program; the measured force-pass cost is DMA issue latency, not flops).
    Density for padded row p+1 is computed on the fly into a 3-slot rho
    ring, so the force pass at row p reads fresh rho with no intermediate
    HBM round-trip; pressure is EOS(rho) inline. Scratch persists across
    sequential grid steps (TPU grids are sequential on a core).

    A row slab's DMA is skipped entirely when no program will read it
    (its whole 3-row window is empty per the prefetched occupancy table)
    — empty grid regions, most of a tank/dam scene, then cost only the
    branch and the zeroed output rows. Every read of a slab or rho-ring
    row is occupancy-masked, so the stale VMEM contents of skipped slabs
    never reach a live lane.

    Math is identical to _density_kernel/_force_kernel (reference:
    fluid_kernels.metal:246-403) up to float reassociation.
    """
    j = pl.program_id(0)
    p = j + 1

    def dma(q):
        return pltpu.make_async_copy(d_ref.at[q], slabs.at[q % 5],
                                     sems.at[q % 5])

    def row_occ(r):
        """Max occupancy of padded row r (0 outside the grid)."""
        b = jnp.int32(0)
        for t in range(NT):
            b = jnp.maximum(b, rm_ref[jnp.clip(r, 0, ny + 1), t])
        return jnp.where((r >= 0) & (r < ny + 2), b, 0)

    def need(r):
        """Slab r is read only by programs whose center row touches it."""
        return (row_occ(r - 1) + row_occ(r) + row_occ(r + 1)) > 0

    def dma_start(q):
        @pl.when(need(q))
        def _():
            dma(q).start()

    def dma_wait(q):
        @pl.when(need(q))
        def _():
            dma(q).wait()

    @pl.when(j == 0)
    def _():                            # warmup: rows 0..3 in flight
        dma_start(0)
        dma_start(1)
        dma_start(2)
        @pl.when(ny + 2 > 3)
        def _():
            dma_start(3)
        dma_wait(0)
        dma_wait(1)
        dma_wait(2)                     # compute_rho(1) reads slab 2
        rho_ring[0] = jnp.zeros((K, NTX), orho.dtype)   # apron row rho

    @pl.when((j + 3 < ny + 2) | (j == 0))
    def _():
        dma_wait(p + 2)                 # at j==0 this is row 3 (warmup-started)

    @pl.when(j + 3 < ny + 1)            # j's start pairs with j+1's wait
    def _():
        dma_start(p + 3)

    FX, FY, FVX, FVY, FM, FO = range(6)
    kk2 = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)

    def ext_win(vals, t):
        """[K, TX+2] halo-extended columns of tile t from a [K, NTX] value.
        The grid's outer columns are aprons (occ = 0), so the zero pad at
        the array edges is exact."""
        z1 = jnp.zeros((vals.shape[0], 1), vals.dtype)
        lo = t * TX
        left = z1 if t == 0 else vals[:, lo - 1:lo]
        right = z1 if (t + 1) * TX + 1 > NTX else \
            vals[:, lo + TX:lo + TX + 1]
        return jnp.concatenate([left, vals[:, lo:lo + TX], right], axis=-1)

    KH = K // 2 if (K % 16 == 0) else K     # fast-path slot count (8-aligned)

    def compute_rho(q):
        """Poly6 density of padded row q (tiles with rm[q, t] > 0) from
        slabs q-1..q+1; writes the rho ring slot q % 3. Full [KC, KN, TX]
        broadcast per tile — a bounded fori is too much loop overhead for
        the cheap per-pair math (measured), but a STATIC half-K branch
        (both center and neighbor slot axes sliced to K/2 when the 3x3
        window's max occupancy allows, the common case) quarters the pair
        slots with no loop overhead. Loads are per-plane so slabs with
        extra trailing planes (the 9-plane migrated stack) cost nothing."""

        def rho_tile(t, KC, KN):
            ts = slice(t * TX, (t + 1) * TX)
            cx = slabs[q % 5, FX, :KC, ts][:, None, :]
            cy = slabs[q % 5, FY, :KC, ts][:, None, :]
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, KN, 1), 1)
            acc = jnp.zeros((KC, TX), orho.dtype)
            for dr in (-1, 0, 1):
                exx = ext_win(slabs[(q + dr) % 5, FX, :KN], t)
                exy = ext_win(slabs[(q + dr) % 5, FY, :KN], t)
                exm = ext_win(slabs[(q + dr) % 5, FM, :KN], t)
                exo = ext_win(slabs[(q + dr) % 5, FO, :KN], t)
                live = kk < _src_bound(rm_ref, q + dr, t, NT)
                for dx in range(3):
                    nbx = exx[:, dx:dx + TX][None]
                    nby = exy[:, dx:dx + TX][None]
                    nbm = exm[:, dx:dx + TX][None]
                    nbo = exo[:, dx:dx + TX][None]
                    ddx = cx - nbx
                    ddy = cy - nby
                    r2 = ddx * ddx + ddy * ddy
                    w = jnp.where(live & (nbo > 0) & (r2 < h2),
                                  poly6 * (h2 - r2) ** 3, 0.0)
                    acc = acc + (nbm * w).sum(1)
            if KC < K:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((K - KC, TX), orho.dtype)], axis=0)
            rho_ring[q % 3, :, ts] = acc

        for t in range(NT):
            wb = jnp.int32(0)
            for dr in (-1, 0, 1):
                wb = jnp.maximum(wb, _src_bound(rm_ref, q + dr, t, NT))

            @pl.when(rm_ref[q, t] == 0)
            def _(t=t):
                rho_ring[q % 3, :, t * TX:(t + 1) * TX] = \
                    jnp.zeros((K, TX), orho.dtype)

            if KH < K:
                @pl.when((rm_ref[q, t] > 0) & (wb <= KH))
                def _(t=t):
                    rho_tile(t, KH, KH)

                @pl.when((rm_ref[q, t] > 0) & (wb > KH))
                def _(t=t):
                    rho_tile(t, K, K)
            else:
                @pl.when(rm_ref[q, t] > 0)
                def _(t=t):
                    rho_tile(t, K, K)

    @pl.when(j == 0)
    def _():
        compute_rho(1)

    @pl.when(p + 1 < ny + 1)
    def _():
        compute_rho(p + 1)

    @pl.when(p + 1 == ny + 1)
    def _():                            # bottom apron: rho = 0
        rho_ring[(p + 1) % 3] = jnp.zeros((K, NTX), orho.dtype)

    # ---- force for padded row p (+ rho write-out) ----
    orho[0] = rho_ring[p % 3]
    CH = 8 if K % 8 == 0 else 1

    def eos(rho):
        return jnp.maximum(stiffness * (rho - rest_density), 0.0)

    def force_tile(t, KC):
        """Force of tile t with the center slot axis sliced to KC (all
        occupied slots have index < rm[p, t] <= KC); the neighbor axis is
        occupancy-bounded by the CH-chunk fori."""
        ts = slice(t * TX, (t + 1) * TX)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (KC, CH, 1), 0)
        kc = jax.lax.broadcasted_iota(jnp.int32, (KC, CH, 1), 1)
        cx = slabs[p % 5, FX, :KC, ts][:, None, :]
        cy = slabs[p % 5, FY, :KC, ts][:, None, :]
        cvx = slabs[p % 5, FVX, :KC, ts][:, None, :]
        cvy = slabs[p % 5, FVY, :KC, ts][:, None, :]
        cocc = slabs[p % 5, FO, :KC, ts][:, None, :]
        crho = rho_ring[p % 3, :KC, ts][:, None, :]
        cp_ = eos(crho)
        cterm = cp_ / jnp.maximum(crho * crho, 1e-30)
        fx_a = jnp.zeros((KC, TX), outx.dtype)
        fy_a = jnp.zeros((KC, TX), outy.dtype)
        for dr in (-1, 0, 1):
            bound = _src_bound(rm_ref, p + dr, t, NT)

            def body(i, acc, dr=dr, t=t):
                fxa, fya = acc
                ch = slabs[(p + dr) % 5, :6,
                           pl.ds(i * CH, CH), :]        # [6, CH, NTX]
                rch = rho_ring[(p + dr) % 3, pl.ds(i * CH, CH), :]
                for dx in range(3):
                    w_ = lambda v: ext_win(v, t)[:, dx:dx + TX][None]
                    nbx, nby = w_(ch[FX]), w_(ch[FY])
                    nbvx, nbvy = w_(ch[FVX]), w_(ch[FVY])
                    nbm, nbo = w_(ch[FM]), w_(ch[FO])
                    nbrho = w_(rch)
                    nbp = eos(nbrho)
                    ddx = cx - nbx
                    ddy = cy - nby
                    r2 = ddx * ddx + ddy * ddy
                    ok = (cocc * nbo > 0) & (r2 >= min_d2) & (r2 < h2) \
                        & (nbrho >= min_rho) & (crho >= min_rho)
                    if dr == 0 and dx == 1:
                        ok = ok & (k1 != i * CH + kc)
                    rr = jnp.sqrt(jnp.maximum(r2, 1e-30))
                    term = cterm + nbp / jnp.maximum(nbrho * nbrho,
                                                     1e-30)
                    w_spiky = spiky * (h - rr) ** 2
                    f_press = -nbm * term * w_spiky
                    fx = f_press * ddx / rr
                    fy = f_press * ddy / rr
                    f_visc = viscosity * nbm * (
                        visc_lap * (h - rr)
                        / jnp.maximum(nbrho, 1e-30))
                    fx = fx - f_visc * (cvx - nbvx)
                    fy = fy - f_visc * (cvy - nbvy)
                    fxa = fxa + jnp.where(ok, fx, 0.0).sum(1)
                    fya = fya + jnp.where(ok, fy, 0.0).sum(1)
                return fxa, fya

            nit = (bound + CH - 1) // CH
            fx_a, fy_a = jax.lax.fori_loop(0, nit, body, (fx_a, fy_a))
        if KC < K:
            zpad = jnp.zeros((K - KC, TX), outx.dtype)
            fx_a = jnp.concatenate([fx_a, zpad], axis=0)
            fy_a = jnp.concatenate([fy_a, zpad], axis=0)
        outx[0, :, ts] = fx_a
        outy[0, :, ts] = fy_a

    for t in range(NT):
        @pl.when(rm_ref[p, t] == 0)
        def _(t=t):
            outx[0, :, t * TX:(t + 1) * TX] = jnp.zeros((K, TX), outx.dtype)
            outy[0, :, t * TX:(t + 1) * TX] = jnp.zeros((K, TX), outy.dtype)

        if KH < K:
            @pl.when((rm_ref[p, t] > 0) & (rm_ref[p, t] <= KH))
            def _(t=t):
                force_tile(t, KH)

            @pl.when(rm_ref[p, t] > KH)
            def _(t=t):
                force_tile(t, K)
        else:
            @pl.when(rm_ref[p, t] > 0)
            def _(t=t):
                force_tile(t, K)


def make_pair_sweep(ny: int, NT: int, K: int, h: float, poly6: float,
                    spiky: float, visc_lap: float, viscosity: float,
                    min_d2: float, min_rho: float, stiffness: float,
                    rest_density: float, TX: int = TILE_X,
                    dtype=jnp.float32, interpret: bool = False,
                    F: int = 6):
    """Returns sweep(rm2, D6) -> (rho, fx, fy) rows, each [ny, K, NT*TX].

    D6 is the ROW-MAJOR field stack [ny+2, F, K, NT*TX] whose FIRST SIX
    planes are (x, y, vx, vy, m, occ) — F > 6 (e.g. the 9-plane migrated
    stack from make_migrate_ring) just rides along in the slab DMA (one
    contiguous descriptor per row); rm2 is the per-(padded-row, tile) max
    cell occupancy [ny+2, NT] int32. Replaces the make_density + make_force
    pair with one pass that fetches each row once and keeps rho on-chip;
    pressure is EOS(rho) inline."""
    if ny < 2:
        raise ValueError("pair sweep needs ny >= 2")
    NTX = NT * TX
    kern = functools.partial(
        _sweep_kernel, h, h * h, poly6, spiky, visc_lap, viscosity,
        min_d2, min_rho, stiffness, rest_density, K, TX, NT, NTX, ny)
    out_spec = pl.BlockSpec((1, K, NTX), lambda j, rm: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((5, F, K, NTX), dtype),      # row-slab ring
            pltpu.VMEM((3, K, NTX), dtype),          # rho ring
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    shp = jax.ShapeDtypeStruct((ny, K, NTX), dtype)
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[shp] * 3,
        interpret=interpret,
    )

    def sweep(rm2, D6):
        return call(rm2, D6)

    return sweep


# ---------------------------------------------------------------------------
# Migration kernel: kick + drift + cell migration on the 9-plane state stack
# ---------------------------------------------------------------------------
# Plane order of the SUB-STEP INPUT stack ST [ny+2, 9, K, NT*TX]:
#   0 x, 1 y, 2 vx, 3 vy, 4 ax, 5 ay, 6 m, 7 id, 8 occ
# Plane order of the MIGRATED output stack M9 (the same [ny+2, 9, K, NT*TX]):
#   0 x1, 1 y1, 2 vx, 3 vy, 4 m, 5 occ, 6 hx, 7 hy, 8 id
# — the first six planes are exactly the pair sweep's (x, y, vx, vy, m, occ)
# field order, so M9 feeds make_pair_sweep(F=9) with no restack. Both the
# PRE-KICK vx/vy (the force pass's viscosity reads them — the reference
# stores vx and vxHalf separately, fluid_kernels.metal velocityVerletHalf)
# and the half-kicked hx/hy (the second kick's base) must ride the
# migration; neither is derivable from the other without also migrating
# the accelerations.
_ST_X, _ST_Y, _ST_VX, _ST_VY, _ST_AX, _ST_AY, _ST_M, _ST_ID, _ST_OCC = \
    range(9)
_M9_X, _M9_Y, _M9_VX, _M9_VY, _M9_M, _M9_OCC, _M9_HX, _M9_HY, _M9_ID = \
    range(9)
_ENC = 1 << 12    # packed migration target: padded_row * _ENC + padded_col



def _migrate_ring_kernel(half_dt, sub_dt, lim, cell, eps, gmin, nx, ny,
                         K, TX, NT, NTX, rm_ref, d_ref, out,
                         slabs, encs, sems, sacc, scnt):
    """Migration kernel, one program per padded row with ring DMA.

    An earlier variant (git: "Stacked-state Pallas substep chain") fetched
    its 3x3 (row, tile) BlockSpec neighborhood per program — a 9x HBM read
    amplification that made it DMA-bound at large N (~2.2 GB/sub-step at
    100k; measured 2x end-to-end: 7.9 -> 3.9 ms/call at 100k-dam dims,
    bitwise-identical output). Here each raw row is DMA'd ONCE
    into a 5-slot ring and kick-drifted in place (planes 0/1 <- drifted
    x/y, planes 4/5 <- half-kicked hx/hy), with packed int32 cell targets
    (padded_row * _ENC + padded_col) in a parallel ring; target row p is
    then compacted from drifted rows p-1..p+1 in the exact (dy, dx, slot)
    candidate order of sph.py's XLA ``_migrate``, so slot assignment and
    the deterministic overflow-drop set are bit-identical to the XLA
    path. Candidate slots use a static half-K fast path (like the
    sweep kernel) when the window's occupancy bound allows."""
    p = pl.program_id(0)
    NY2 = ny + 2
    f32 = out.dtype

    def dma(q):
        return pltpu.make_async_copy(d_ref.at[q], slabs.at[q % 5],
                                     sems.at[q % 5])

    def row_occ(r):
        b = jnp.int32(0)
        for t in range(NT):
            b = jnp.maximum(b, rm_ref[jnp.clip(r, 0, NY2 - 1), t])
        return jnp.where((r >= 0) & (r < NY2), b, 0)

    def dma_start(q):
        @pl.when(row_occ(q) > 0)
        def _():
            dma(q).start()

    def dma_wait(q):
        @pl.when(row_occ(q) > 0)
        def _():
            dma(q).wait()

    def drift(r):
        """Kick-drift raw row r in place + packed migration targets.
        Skipped (encs <- -1) when the row is empty, so stale slab values
        never match a target."""
        s = r % 5

        @pl.when(row_occ(r) > 0)
        def _():
            occ = slabs[s, _ST_OCC]
            hx = slabs[s, _ST_VX] + half_dt * slabs[s, _ST_AX]
            hy = slabs[s, _ST_VY] + half_dt * slabs[s, _ST_AY]
            x1 = slabs[s, _ST_X] + jnp.clip(hx * sub_dt, -lim, lim)
            y1 = slabs[s, _ST_Y] + jnp.clip(hy * sub_dt, -lim, lim)
            slabs[s, _ST_X] = x1
            slabs[s, _ST_Y] = y1
            slabs[s, _ST_AX] = hx
            slabs[s, _ST_AY] = hy
            # Interior clip, then clamp to +-1 of the slot's STORED cell
            # (interior row r-1, interior col ccol-1) — the XLA _migrate's
            # walking semantics (sph.py _migrate): a particle that moved
            # >1 cell (coupling push-out, floor teleport) keeps its exact
            # position and walks one cell per migration instead of falling
            # out of the 3x3 candidate window and being silently dropped.
            ccol = jax.lax.broadcasted_iota(jnp.int32, (K, NTX), 1)
            tgx = jnp.clip(jnp.clip(
                jnp.floor((x1 + eps) / cell).astype(jnp.int32) - gmin,
                0, nx - 1), ccol - 2, ccol) + 1
            tgy = jnp.clip(jnp.clip(
                jnp.floor((y1 + eps) / cell).astype(jnp.int32) - gmin,
                0, ny - 1), r - 2, r) + 1
            encs[s] = jnp.where(occ > 0, tgy * _ENC + tgx, -1)

        @pl.when(row_occ(r) == 0)
        def _():
            encs[s] = jnp.full((K, NTX), -1, jnp.int32)

    def ext_win(vals, t):
        """[*, TX+2] halo-extended columns of tile t of a [*, NTX] value
        (outer grid columns are aprons; zero pad at array edges is exact —
        enc 0 never matches a live target, which is >= _ENC)."""
        z1 = jnp.zeros((vals.shape[0], 1), vals.dtype)
        lo = t * TX
        left = z1 if t == 0 else vals[:, lo - 1:lo]
        right = z1 if (t + 1) * TX + 1 > NTX else \
            vals[:, lo + TX:lo + TX + 1]
        return jnp.concatenate([left, vals[:, lo:lo + TX], right], axis=-1)

    ksl = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    KH = K // 2 if (K % 16 == 0) else K

    def mig_tile(t, KC):
        """Compact tile t of target row p from the drifted ring, candidate
        slot axis statically sliced to KC (sound: every source window slot
        >= its row's occupancy bound <= KC is empty). The drift clamp
        (lim < cell/2) bounds cell changes to +-1, so in a typical
        sub-step only the same-cell pass (dr=1, dx=1) has matches; each
        pass's O(K*KC*TX) one-hot apply runs under pl.when(any match) —
        empty passes cost one [KC, TX] compare + reduce. Running rank
        counts and field sums live in VMEM scratch so the conditional
        bodies can accumulate in place."""
        trilC = (jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
                 >= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)) \
            .astype(f32)
        colg = t * TX + jax.lax.broadcasted_iota(jnp.int32, (1, TX), 1)
        target = p * _ENC + colg
        scnt[...] = jnp.zeros((1, TX), jnp.int32)
        sacc[...] = jnp.zeros((8, K, TX), f32)
        for dr in range(3):
            sr = (p - 1 + dr) % 5
            ee = ext_win(encs[sr][:KC], t)
            ef = [ext_win(slabs[sr, f][:KC], t) for f in range(8)]
            for dx in range(3):
                match = ee[:, dx:dx + TX] == target          # [KC, TX]

                @pl.when(jnp.sum(match.astype(jnp.int32)) > 0)
                def _(match=match, ef=ef, dx=dx):
                    local = jax.lax.dot(
                        trilC, match.astype(f32)).astype(jnp.int32)
                    rank = (scnt[...] + local - 1)[None]     # [1, KC, TX]
                    oh = match[None] & (rank == ksl)         # [K, KC, TX]
                    for f in range(8):
                        sacc[f] = sacc[f] + jnp.where(
                            oh, ef[f][:, dx:dx + TX][None], 0.0).sum(1)
                    scnt[...] = scnt[...] + local[KC - 1:KC]
        occ_out = (kcol < scnt[...]).astype(f32)             # [K, TX]
        # M9 plane order: x, y, vx, vy, m, occ, hx, hy, id (sacc is in
        # drifted-slab plane order: x, y, vx, vy, hx, hy, m, id)
        out[0, :, :, t * TX:(t + 1) * TX] = jnp.stack(
            [sacc[0], sacc[1], sacc[2], sacc[3], sacc[6], occ_out,
             sacc[4], sacc[5], sacc[7]])

    # ---- schedule ---------------------------------------------------------
    @pl.when(p == 0)
    def _():                            # warmup: rows 0..2 in flight
        dma_start(0)
        dma_start(1)
        dma_start(2)
        dma_wait(0)
        drift(0)
        encs[4] = jnp.full((K, NTX), -1, jnp.int32)   # row -1 slot

    @pl.when(p + 3 < NY2)
    def _():
        dma_start(p + 3)

    @pl.when(p + 1 < NY2)
    def _():
        dma_wait(p + 1)
        drift(p + 1)

    @pl.when(p + 1 >= NY2)
    def _():                            # row ny+2 slot: never a source
        encs[(p + 1) % 5] = jnp.full((K, NTX), -1, jnp.int32)

    # aprons are never migration targets (gy is clipped to the grid)
    for t in range(NT):
        wb = jnp.int32(0)
        for dr in range(3):
            wb = jnp.maximum(wb, _src_bound(
                rm_ref, jnp.clip(p - 1 + dr, 0, NY2 - 1), t, NT))
        run = (p >= 1) & (p <= ny)

        @pl.when(~run | (wb == 0))
        def _(t=t):
            out[0, :, :, t * TX:(t + 1) * TX] = jnp.zeros((9, K, TX), f32)

        if KH < K:
            @pl.when(run & (wb > 0) & (wb <= KH))
            def _(t=t):
                mig_tile(t, KH)

            @pl.when(run & (wb > KH))
            def _(t=t):
                mig_tile(t, K)
        else:
            @pl.when(run & (wb > 0))
            def _(t=t):
                mig_tile(t, K)


def make_migrate_ring(ny: int, nx: int, NT: int, K: int, half_dt: float,
                      sub_dt: float, lim: float, cell: float, eps: float,
                      gmin: int, TX: int = TILE_X, dtype=jnp.float32,
                      interpret: bool = False):
    """Returns ``migrate(rm, ST) -> M9``.

    ST is the sub-step state stack [ny+2, 9(x,y,vx,vy,ax,ay,m,id,occ), K,
    NT*TX]; rm is the per-(padded row, tile) max cell occupancy [ny+2, NT]
    int32 of ST's occ plane. M9 is the kicked/drifted/migrated stack
    [ny+2, 9(x,y,vx,vy,m,occ,hx,hy,id), K, NT*TX]; apron rows are zero."""
    if ny < 2:
        raise ValueError("ring migrate needs ny >= 2")
    if nx + 2 >= _ENC:
        raise ValueError(f"grid too wide for packed targets (nx={nx})")
    NTX = NT * TX
    kern = functools.partial(_migrate_ring_kernel, half_dt, sub_dt, lim,
                             cell, eps, gmin, nx, ny, K, TX, NT, NTX)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 9, K, NTX), lambda p, rm: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((5, 9, K, NTX), dtype),       # raw/drifted row ring
            pltpu.VMEM((5, K, NTX), jnp.int32),      # packed targets
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.VMEM((8, K, TX), dtype),           # per-tile field sums
            pltpu.VMEM((1, TX), jnp.int32),          # per-tile rank counts
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ny + 2, 9, K, NTX), dtype),
        interpret=interpret,
    )

    def migrate(rm, ST):
        return call(rm, ST)

    return migrate



def make_density(ny: int, NT: int, K: int, h: float, poly6: float,
                 TX: int = TILE_X, dtype=jnp.float32,
                 interpret: bool = False):
    """Returns density(rm2, D4) -> rho rows [ny, K, NT*TX].

    D4 is the field stack [4(x,y,m,occ), ny+2, K, NT*TX]; rm2 is the
    per-(padded-row, tile) max cell occupancy [ny+2, NT] int32 (<= K)."""
    kern = functools.partial(_density_kernel, h * h, poly6, K, TX, NT)
    call = pl.pallas_call(
        kern,
        grid_spec=_grid_spec(ny, NT, 4, K, TX, 1),
        out_shape=jax.ShapeDtypeStruct((ny, K, NT * TX), dtype),
        interpret=interpret,
    )

    def density(rm2, D4):
        return call(rm2, *([D4] * 9))

    return density


def make_force(ny: int, NT: int, K: int, h: float, spiky: float,
               visc_lap: float, viscosity: float, min_d2: float,
               min_rho: float, TX: int = TILE_X, dtype=jnp.float32,
               interpret: bool = False):
    """Returns force(rm2, D8) -> (fx, fy) rows [ny, K, NT*TX].

    D8 is the field stack [8(x,y,vx,vy,m,rho,p,occ), ny+2, K, NT*TX]."""
    kern = functools.partial(_force_kernel, h, h * h, spiky, visc_lap,
                             viscosity, min_d2, min_rho, K, TX, NT)
    call = pl.pallas_call(
        kern,
        grid_spec=_grid_spec(ny, NT, 8, K, TX, 2, dtype=dtype,
                             scratch=True),
        out_shape=[jax.ShapeDtypeStruct((ny, K, NT * TX), dtype),
                   jax.ShapeDtypeStruct((ny, K, NT * TX), dtype)],
        interpret=interpret,
    )

    def force(rm2, D8):
        return call(rm2, *([D8] * 9))

    return force

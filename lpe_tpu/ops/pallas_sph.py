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


def _coupling_kernel(RC, V, W, cn, K, TX, cpl_ref, cand_ref, rig_ref, d_ref,
                     ox, oy, ovx, ovy, oax, oay, orf, cacc):
    """Fused rigid-fluid coupling over one (row, tile) block.

    Ports the XLA overlap/impulse/position solves (systems/fluid/sph.py,
    reference: fluid_kernels.metal:533-924) as one VPU pass: per-slot fields
    are read once and written once instead of materializing ~25 [NR, slots]
    intermediates in HBM. The rigid loop runs over the row's *candidate*
    list (cand_ref [rows, RC] int32: ids of rigids whose AABB spans the
    row's y-range, sentinel = the rig table's zero row) — a static RC-unroll
    independent of the scene's rigid count. Per-candidate force/torque/id
    partials go to a per-program SMEM row that the caller scatter-adds by
    id. ``cn`` is the dict of solver constants.
    """
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
        for i in range(4 * RC):        # SMEM scalars: one store each
            orf[0, t, i] = jnp.float32(0.0)

    @pl.when(cpl_ref[j + 1, t] > 0)
    def _():
        px, py = d[FX], d[FY]
        vx1, vy1 = d[FVX], d[FVY]
        rho, p, m = d[FR], d[FP], d[FM]
        occ = d[FO]
        ax, ay = d[FAX], d[FAY]
        crow = cand_ref[pl.ds(j + 1, 1), :]                 # [1, RC] ids
        nx_, ny_, vxo, vyo, axo, ayo = _couple_core(
            RC, V, cn, K, TX, t, crow, rig_ref, orf, cacc,
            px, py, vx1, vy1, rho, p, m, occ, ax, ay)
        ox[0] = nx_
        oy[0] = ny_
        ovx[0] = vxo
        ovy[0] = vyo
        oax[0] = axo
        oay[0] = ayo


def _couple_core(RC, V, cn, K, TX, t, crow, rig_ref, orf, cacc,
                 px, py, vx1, vy1, rho, p, m, occ, ax, ay):
    """Shared candidate-loop + finalization of the fused coupling solve
    (see _coupling_kernel). Writes the per-candidate (fx, fy, tq, id)
    partials into ``orf[0, t]`` and returns the updated particle planes
    (x, y, vx, vy, ax, ay), each [K, TX]."""
    z = jnp.zeros((K, TX), px.dtype)
    fz = jnp.zeros((K, TX), jnp.bool_)
    # cross-candidate accumulators live in scratch so each candidate's
    # heavy work (polygon vertex loops + impulse math) sits under a
    # pl.when keyed on "any lane inside this candidate's AABB" — a
    # tank's side walls are candidates in every row but touch almost no
    # particles, and the skip is exact (a candidate with no lane in its
    # AABB contributes identically zero). Planes: 0 acx, 1 acy (position
    # corrections), 2 sfx, 3 sfy (fluid impulse force), 4 had_pos,
    # 5 had_imp (0/1 flags).
    cacc[...] = jnp.zeros((6, K, TX), px.dtype)
    for i in range(4 * RC):        # SMEM scalars: one store each
        orf[0, t, i] = jnp.float32(0.0)
    for r in range(RC):
        rd = crow[0, r]
        rrow = rig_ref[pl.ds(rd, 1), :]                 # [1, W]
        c = lambda i: rrow[0, i]
        rpx, rpy, rvxs, rvys, rom = c(0), c(1), c(2), c(3), c(4)
        rmass, rinert, rrad = c(5), c(6), c(7)
        ric, rvalid, rnv = c(8), c(9), c(10)
        minx, miny, maxx, maxy = c(11), c(12), c(13), c(14)
        rx = px - rpx
        ry = py - rpy
        in_aabb = (px >= minx) & (px <= maxx) & \
                  (py >= miny) & (py <= maxy) & (rvalid > 0) & (occ > 0)

        @pl.when(jnp.any(in_aabb))
        def _():
            # circle overlap (skipped at trace time for all-polygon scenes)
            if cn["any_circle"]:
                d2 = rx * rx + ry * ry
                dist_c = jnp.sqrt(jnp.maximum(d2, 1e-30))
                inside_c = d2 < rrad * rrad
            else:
                dist_c = jnp.full((K, TX), 1.0, px.dtype)
                inside_c = fz
            # polygon overlap: ray-cast parity + closest boundary point
            # (reference: metal:125-194). Static vert unroll, nv-masked;
            # skipped at trace time for all-circle scenes.
            parity = jnp.zeros((K, TX), jnp.int32)
            best_d2 = jnp.full((K, TX), 1e30, px.dtype)
            cxb, cyb = z, z
            for v in range(V if cn["any_poly"] else 0):
                vm = jnp.float32(v) < rnv
                xi, yi = c(15 + 2 * v), c(16 + 2 * v)
                # prev vertex: v-1, wrapping v==0 -> nv-1 (scalar select
                # over the static vert list keeps indexing static)
                if v == 0:
                    xj, yj = xi, yi
                    for u in range(1, V):
                        sel = jnp.float32(u) == rnv - 1.0
                        xj = jnp.where(sel, c(15 + 2 * u), xj)
                        yj = jnp.where(sel, c(16 + 2 * u), yj)
                else:
                    xj = c(15 + 2 * (v - 1))
                    yj = c(16 + 2 * (v - 1))
                denom = yj - yi
                tx_ = (xj - xi) * (py - yi) / jnp.where(
                    jnp.abs(denom) < 1e-30, 1e-30, denom) + xi
                crosses = ((yi > py) != (yj > py)) & (px < tx_) & vm
                parity = parity + crosses.astype(jnp.int32)
                # closest point on edge v -> v+1 (wrap nv-1 -> 0)
                if v + 1 < V:
                    wrap = jnp.float32(v) == rnv - 1.0
                    x2s = jnp.where(wrap, c(15),
                                    c(15 + 2 * (v + 1)))
                    y2s = jnp.where(wrap, c(16),
                                    c(16 + 2 * (v + 1)))
                else:
                    x2s, y2s = c(15), c(16)
                ex = x2s - xi
                ey = y2s - yi
                el2 = ex * ex + ey * ey
                tt = ((px - xi) * ex + (py - yi) * ey) \
                    / jnp.where(el2 < 1e-16, 1e-16, el2)
                tt = jnp.clip(tt, 0.0, 1.0)
                qx = xi + tt * ex
                qy = yi + tt * ey
                qd2 = (px - qx) ** 2 + (py - qy) ** 2
                qd2 = jnp.where(vm & (el2 >= 1e-16), qd2, 1e30)
                better = qd2 < best_d2
                best_d2 = jnp.where(better, qd2, best_d2)
                cxb = jnp.where(better, qx, cxb)
                cyb = jnp.where(better, qy, cyb)
            inside_p = ((parity % 2) == 1) & (rnv >= 3.0)
            pdx = px - cxb
            pdy = py - cyb
            dist_p = jnp.sqrt(jnp.maximum(pdx * pdx + pdy * pdy, 1e-30))
            if cn["any_circle"] and cn["any_poly"]:
                is_c = ric > 0
                # boolean algebra, not jnp.where: Mosaic cannot legalize
                # arith.select on vector<i1> operands (bool-valued
                # selects), which this would lower to
                inside_s = (is_c & inside_c) | (~is_c & inside_p)
            else:                      # uniform scenes: constant predicate,
                is_c = bool(cn["any_circle"])   # dead branch folds away
                inside_s = inside_c if is_c else inside_p
            inside = in_aabb & inside_s

            # ---- position correction (metal:533-668) ----
            msd = cn["min_safe_distance"]
            d_c = jnp.maximum(dist_c, msd)
            dirx_c = jnp.where(dist_c < msd, 1.0, rx / d_c)
            diry_c = jnp.where(dist_c < msd, 0.0, ry / d_c)
            pen_c = (rrad - d_c) + cn["safety_margin"]
            d_p = jnp.maximum(dist_p, msd)
            dirx_p = jnp.where(dist_p < msd, 1.0, pdx / d_p)
            diry_p = jnp.where(dist_p < msd, 0.0, pdy / d_p)
            pen_p = d_p + cn["safety_margin"]
            corr_x = jnp.where(is_c, -dirx_c * pen_c, dirx_p * pen_p)
            corr_y = jnp.where(is_c, -diry_c * pen_c, diry_p * pen_p)
            cacc[0] = cacc[0] + jnp.where(
                inside, corr_x * cn["relax_factor"], 0.0)
            cacc[1] = cacc[1] + jnp.where(
                inside, corr_y * cn["relax_factor"], 0.0)
            cacc[4] = jnp.maximum(cacc[4], inside.astype(px.dtype))

            # ---- impulse exchange (metal:679-924) ----
            mpen = cn["min_penetration"]
            rb_v2 = rvxs * rvxs + rvys * rvys + rom * rom
            ok_r = rb_v2 <= cn["max_safe_velocity_sq"]
            pen = jnp.where(is_c,
                            jnp.maximum(rrad - jnp.maximum(dist_c, mpen),
                                        0.0),
                            jnp.maximum(dist_p, mpen))
            nrm_x = jnp.where(is_c, rx / jnp.maximum(dist_c, mpen),
                              pdx / jnp.maximum(dist_p, mpen))
            nrm_y = jnp.where(is_c, ry / jnp.maximum(dist_c, mpen),
                              pdy / jnp.maximum(dist_p, mpen))
            act = inside & ok_r & (pen >= mpen)
            dens = jnp.where(rho > 0.0, rho, cn["rest_density"])
            rig_vx = rvxs - rom * ry
            rig_vy = rvys + rom * rx
            rvx = vx1 - rig_vx
            rvy = vy1 - rig_vy
            depth_f = jnp.tanh(cn["depth_transition_rate"] * pen
                               / cn["depth_scale"])
            vn = rvx * nrm_x + rvy * nrm_y
            tvx = rvx - nrm_x * vn
            tvy = rvy - nrm_y * vn
            vol = jnp.where(rho > 0, m / jnp.maximum(rho, 1e-30),
                            m / cn["rest_density"])
            area = jnp.abs(vol) ** (2.0 / 3.0)
            depth = jnp.minimum(py / cn["depth_estimate_scale"], 1.0)
            hydro = dens * cn["gravity"] * depth
            total_p = p + hydro
            pforce = total_p * area * depth_f
            maxF = cn["max_force"]
            fx = nrm_x * jnp.minimum(pforce, maxF * cn["pressure_force_ratio"])
            fy = nrm_y * jnp.minimum(pforce, maxF * cn["pressure_force_ratio"])
            tmag = jnp.sqrt(tvx * tvx + tvy * tvy)
            hast = tmag > cn["min_rel_velocity"]
            vforce = cn["viscosity"] * cn["viscosity_scale"] * tmag * dens \
                * depth_f * cn["sub_dt"]
            vcap = jnp.minimum(vforce, maxF * cn["viscous_force_ratio"])
            fx = fx + jnp.where(hast, -tvx / jnp.maximum(tmag, 1e-30) * vcap,
                                0.0)
            fy = fy + jnp.where(hast, -tvy / jnp.maximum(tmag, 1e-30) * vcap,
                                0.0)
            buoy = -cn["buoyancy_strength"] * pen * area * cn["gravity"] \
                * dens
            bfy = jnp.where(rmass > 0.1, buoy, 0.0)
            keep = jnp.sqrt(fx * fx + (fy + bfy) ** 2) <= maxF
            fy = jnp.where(keep, fy + bfy, fy)
            fmag = jnp.sqrt(fx * fx + fy * fy)
            fscale = jnp.where(fmag > maxF,
                               maxF / jnp.maximum(fmag, 1e-30), 1.0)
            fx = fx * fscale
            fy = fy * fscale
            tq = jnp.clip(rx * fy - ry * fx, -cn["max_torque"],
                          cn["max_torque"])
            spin = jnp.abs(rom) > cn["angular_damping_threshold"]
            tq = tq - jnp.where(
                spin, cn["angular_damping_factor"] * jnp.sign(rom)
                * jnp.abs(rom) * rinert, 0.0)
            fx = jnp.where(act, fx, 0.0)
            fy = jnp.where(act, fy, 0.0)
            tq = jnp.where(act, tq, 0.0)
            orf[0, t, 4 * r + 0] = fx.sum()
            orf[0, t, 4 * r + 1] = fy.sum()
            orf[0, t, 4 * r + 2] = tq.sum()
            orf[0, t, 4 * r + 3] = rd.astype(orf.dtype)
            cacc[2] = cacc[2] + fx
            cacc[3] = cacc[3] + fy
            cacc[5] = jnp.maximum(cacc[5], act.astype(px.dtype))

    # ---- post-loop finalization ----
    acx, acy = cacc[0], cacc[1]
    sfx, sfy = cacc[2], cacc[3]
    had_pos = cacc[4] > 0
    had_imp = cacc[5] > 0
    # fluid back-reaction (Newton's 3rd law)
    ffx = -sfx * cn["fluid_force_scale"]
    ffy = -sfy * cn["fluid_force_scale"]
    fm = jnp.sqrt(ffx * ffx + ffy * ffy)
    fsc = jnp.where(fm > cn["fluid_force_max"],
                    cn["fluid_force_max"] / jnp.maximum(fm, 1e-30), 1.0)
    inv_m = jnp.where(m > 1e-4, 1.0 / m, 1.0)
    axo = jnp.where(had_imp, ax + ffx * fsc * inv_m, ax)
    ayo = jnp.where(had_imp, ay + ffy * fsc * inv_m, ay)
    # position push-out + velocity fix-up
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


def make_coupling(ny: int, NT: int, K: int, NR: int, V: int, consts: dict,
                  RC: int = 16, TX: int = TILE_X, dtype=jnp.float32,
                  interpret: bool = False):
    """Returns ``couple(cpl2, cand, rig, D10) -> (x, y, vx, vy, ax, ay,
    partials)``.

    D10 is the field stack [10(x,y,vx1,vy1,rho,p,m,occ,ax,ay), ny+2, K,
    NT*TX]; cpl2 [ny+2, NT] int32 marks (row, tile)s with occupancy AND a
    rigid AABB overlap; cand [ny+2, RC] int32 holds per-row candidate rigid
    ids (sentinel NR = the rig table's zero row); rig is the [NR+1, 15+2V]
    rigid proxy table (last row zeros). Outputs are interior rows
    [ny, K, NT*TX] plus per-(row, tile) (fx, fy, tq, id) candidate partials
    [ny, NT, 4*RC] in SMEM — scatter-add fx/fy/tq by id to get per-rigid
    sums. RC bounds per-row rigid density: rows crossing more than RC rigid
    AABBs deterministically drop the highest-id surplus."""
    W = 15 + 2 * V
    RC = min(RC, max(NR, 1))
    kern = functools.partial(_coupling_kernel, RC, V, W, consts, K, TX)
    out_spec = pl.BlockSpec((1, K, TX), lambda j, t, cpl: (j, 0, t),
                            memory_space=pltpu.VMEM)
    # one SMEM block spans all NT tiles of a row (the block index ignores t,
    # so it stays resident across the row's programs — grid order is
    # t-fastest — and each program writes only its own t slice); blocking
    # per-(j, t) would violate the last-two-dims tiling rule
    rig_out_spec = pl.BlockSpec((1, NT, 4 * RC),
                                lambda j, t, cpl: (j, 0, 0),
                                memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny, NT),
        in_specs=[
            pl.BlockSpec((ny + 2, RC), lambda j, t, cpl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NR + 1, W), lambda j, t, cpl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, 1, K, TX), lambda j, t, cpl: (0, j + 1, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 6 + [rig_out_spec],
        # cross-candidate accumulators (see _coupling_kernel)
        scratch_shapes=[pltpu.VMEM((6, K, TX), dtype)],
    )
    shp = jax.ShapeDtypeStruct((ny, K, NT * TX), dtype)
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[shp] * 6 + [jax.ShapeDtypeStruct((ny, NT, 4 * RC),
                                                    dtype)],
        interpret=interpret,
    )

    def couple(cpl2, cand, rig, D10):
        return call(cpl2, cand, rig, D10)

    return couple


def _coupling9_kernel(RC, V, W, cn, K, TX, half_dt, stiffness, ny,
                      cpl_ref, cand_ref, rig_ref, m9_ref, rho_ref, fx_ref,
                      fy_ref, ost, orf, cacc):
    """Stacked-state coupling: consumes the migrated stack M9 plus the pair
    sweep's (rho, fx, fy) rows directly, computes the second velocity kick
    and EOS pressure inline, and emits the NEXT sub-step's input stack ST
    [9(x,y,vx,vy,ax,ay,m,id,occ), K, TX] — no XLA restack between kernels.
    Physics is _coupling_kernel's via the shared _couple_core."""
    p = pl.program_id(0)            # padded row, 0..ny+1
    t = pl.program_id(1)
    apron = (p == 0) | (p == ny + 1)

    @pl.when(apron)
    def _():
        ost[0] = jnp.zeros((9, K, TX), ost.dtype)
        for i in range(4 * RC):
            orf[0, t, i] = jnp.float32(0.0)

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
            for i in range(4 * RC):
                orf[0, t, i] = jnp.float32(0.0)

        @pl.when(cpl_ref[p, t] > 0)
        def _():
            crow = cand_ref[pl.ds(p, 1), :]                 # [1, RC] ids
            nx_, ny_, vxo, vyo, axo, ayo = _couple_core(
                RC, V, cn, K, TX, t, crow, rig_ref, orf, cacc,
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


def make_coupling9(ny: int, NT: int, K: int, NR: int, V: int, consts: dict,
                   half_dt: float, stiffness: float, RC: int = 16,
                   TX: int = TILE_X, dtype=jnp.float32,
                   interpret: bool = False):
    """Returns ``couple9(cpl2, cand, rig, M9, rho, fx, fy) -> (ST, partials)``.

    M9 is make_migrate_ring's output stack [ny+2, 9, K, NT*TX]; rho/fx/fy are
    the pair sweep's interior rows [ny, K, NT*TX]. ST is the next
    sub-step's input stack [ny+2, 9(x,y,vx,vy,ax,ay,m,id,occ), K, NT*TX]
    (apron rows zero); partials are per-(padded row, tile) (fx, fy, tq, id)
    candidate sums [ny+2, NT, 4*RC] to scatter-add by id."""
    W = 15 + 2 * V
    RC = min(RC, max(NR, 1))
    kern = functools.partial(_coupling9_kernel, RC, V, W, consts, K, TX,
                             half_dt, stiffness, ny)
    row_spec = pl.BlockSpec((1, K, TX),
                            lambda p, t, cpl: (jnp.clip(p - 1, 0, ny - 1),
                                               0, t),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny + 2, NT),
        in_specs=[
            pl.BlockSpec((ny + 2, RC), lambda p, t, cpl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NR + 1, W), lambda p, t, cpl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, K, TX), lambda p, t, cpl: (p, 0, 0, t),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 9, K, TX), lambda p, t, cpl: (p, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, 4 * RC), lambda p, t, cpl: (p, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((6, K, TX), dtype)],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ny + 2, 9, K, NT * TX), dtype),
            jax.ShapeDtypeStruct((ny + 2, NT, 4 * RC), dtype),
        ],
        interpret=interpret,
    )

    def couple9(cpl2, cand, rig, M9, rho, fx, fy):
        return call(cpl2, cand, rig, M9, rho, fx, fy)

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


# ---------------------------------------------------------------------------
# Fused whole-substep kernel: drift + cell migration + density + force + kick
# ---------------------------------------------------------------------------
# Plane order of the 9-plane substep stack (kernel input AND output, so the
# output feeds straight back as the next sub-step's input):
#   0 x, 1 y, 2 vx, 3 vy, 4 ax, 5 ay, 6 m, 7 id, 8 occ
# After the in-place drift, planes 4/5 hold the half-kicked velocities
# (hx, hy); the output writes the NEW accelerations back into them.
_FP_X, _FP_Y, _FP_VX, _FP_VY, _FP_HX, _FP_HY, _FP_M, _FP_ID, _FP_OCC = \
    range(9)
_ENC = 1 << 12        # packed migration target: padded_row * _ENC + padded_col


def _substep9_kernel(RC, V, W, cn, NR, h, h2, poly6, spiky, visc_lap,
                     viscosity, min_d2, min_rho, stiffness, rest_density,
                     half_dt, sub_dt, lim, cell, eps, gmin, nx, K, TX, NT,
                     NTX, ny, *refs):
    """One WHOLE SPH sub-step — drift, cell migration, density, force,
    second kick, and (NR > 0) the rigid-fluid coupling solve — per grid
    pass (see make_substep9).

    Rolling pipeline over padded grid rows, one program per padded row p
    (grid = ny+2): DMA+drift row p+3, migrate row p+2, density row p+1,
    force+kick+couple+output row p. Each stage's 3-row window sits entirely
    in ring scratch, so the full sub-step costs ONE read and ONE write of
    the row stack: it replaces the 3-kernel chain (ring migrate -> pair
    sweep -> coupling9) whose M9 intermediate cost one extra write plus a
    3x3-amplified re-read per sub-step, and emits the post-migration
    occupancy bounds so the XLA glue between sub-steps is zero. Physics
    matches systems/fluid/sph.py's resident substep (kick-drift ->
    _migrate -> density -> force -> kick -> couple, reference:
    fluid_kernels.metal:246-441,533-924) to float reassociation: the
    migration candidate order (dy, dx, slot) and first-K overflow drop are
    identical, and the coupling math is the shared _couple_core.

    The migration stage carries the ring-DMA kernel's two measured wins
    (git: "Migrate kernel: skip matchless (dy,dx) compaction passes",
    "Ring-DMA migrate kernel"): per-(dy, dx) passes run under
    pl.when(any-match), and the candidate slot axis statically slices to
    K/2 when the window's occupancy bound allows.

    Scratch: slabs = 5-slot drifted-row ring (planes x,y,vx,vy,hx,hy,m,id,
    occ after drift); encs = packed int32 migration targets; migs = 5-slot
    migrated-row ring (plane 8 = fresh occupancy); rho_ring = 3-slot
    density ring; cnt_ref[r%5, t] = exact post-migration max cell occupancy
    (SMEM) — density/force bound their candidate loops with it, so pair
    work tracks TRUE occupancy, not the conservative pre-migration bound;
    sacc/scnt = migration rank accumulators; cacc = coupling accumulators
    (_couple_core)."""
    if NR > 0:
        (rm_ref, cpl_ref, d_ref, cand_ref, rig_ref,
         out1, out2, out3, out4,
         slabs, encs, migs, rho_ring, cnt_ref, sems, sacc, scnt,
         cacc) = refs
    else:
        (rm_ref, d_ref, out1, out2, out4,
         slabs, encs, migs, rho_ring, cnt_ref, sems, sacc, scnt) = refs
    p = pl.program_id(0)
    NY2 = ny + 2
    f32 = out1.dtype

    def dma(q):
        return pltpu.make_async_copy(d_ref.at[q], slabs.at[q % 5],
                                     sems.at[q % 5])

    def row_occ(r):
        """Max pre-migration occupancy of padded row r (0 outside)."""
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
        """In-place kick-drift of raw row r + packed migration targets.
        Empty rows skip the math (their DMA was skipped too); their encs
        slot is invalidated so stale slab values never match a target."""
        s = r % 5

        @pl.when(row_occ(r) > 0)
        def _():
            occ = slabs[s, _FP_OCC]
            hx = slabs[s, _FP_VX] + half_dt * slabs[s, _FP_HX]
            hy = slabs[s, _FP_VY] + half_dt * slabs[s, _FP_HY]
            x1 = jnp.where(occ > 0,
                           slabs[s, _FP_X]
                           + jnp.clip(hx * sub_dt, -lim, lim),
                           0.0)
            y1 = jnp.where(occ > 0,
                           slabs[s, _FP_Y]
                           + jnp.clip(hy * sub_dt, -lim, lim),
                           0.0)
            slabs[s, _FP_X] = x1
            slabs[s, _FP_Y] = y1
            slabs[s, _FP_HX] = hx
            slabs[s, _FP_HY] = hy
            # interior clip then +-1-of-stored-cell clamp (XLA _migrate
            # walking semantics — see _migrate_ring_kernel.drift)
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
        """[*, TX+2] halo-extended columns of tile t of a [*, NTX] value.
        Outer grid columns are aprons (occ 0 / enc -1 never matches), so the
        zero pad at the array edges is exact."""
        z1 = jnp.zeros((vals.shape[0], 1), vals.dtype)
        lo = t * TX
        left = z1 if t == 0 else vals[:, lo - 1:lo]
        right = z1 if (t + 1) * TX + 1 > NTX else \
            vals[:, lo + TX:lo + TX + 1]
        return jnp.concatenate([left, vals[:, lo:lo + TX], right], axis=-1)

    CH = 8 if K % 8 == 0 else 1
    ksl = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)     # slot ids
    kcol = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def zero_mig(q):
        s = q % 5
        migs[s] = jnp.zeros((9, K, NTX), f32)
        for t in range(NT):
            cnt_ref[s, t] = 0

    KH = K // 2 if (K % 16 == 0) else K

    def mig_tile(q, t, KC):
        """Compact tile t of padded row q from drifted rows q-1..q+1 (exact
        (dy, dx, slot) candidate order of sph.py::_migrate), candidate slot
        axis statically sliced to KC. Running rank counts and field sums
        live in scratch so each (dy, dx) pass runs under pl.when(any match)
        — in a typical sub-step only the same-cell pass has matches, and an
        empty pass costs one [KC, TX] compare + reduce."""
        s = q % 5
        trilC = (jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 0)
                 >= jax.lax.broadcasted_iota(jnp.int32, (KC, KC), 1)) \
            .astype(f32)
        colg = t * TX + jax.lax.broadcasted_iota(jnp.int32, (1, TX), 1)
        target = q * _ENC + colg
        scnt[...] = jnp.zeros((1, TX), jnp.int32)
        sacc[...] = jnp.zeros((8, K, TX), f32)
        for dy in range(3):
            sr = (q - 1 + dy) % 5
            ee = ext_win(encs[sr][:KC], t)
            ef = [ext_win(slabs[sr, f][:KC], t) for f in range(8)]
            for dx in range(3):
                match = ee[:, dx:dx + TX] == target          # [KC, TX]

                @pl.when(jnp.sum(match.astype(jnp.int32)) > 0)
                def _(match=match, ef=ef, dx=dx, trilC=trilC):
                    local = jax.lax.dot(
                        trilC, match.astype(f32)).astype(jnp.int32)
                    rank = (scnt[...] + local - 1)[None]     # [1, KC, TX]
                    oh = match[None] & (rank == ksl)         # [K, KC, TX]
                    for f in range(8):
                        sacc[f] = sacc[f] + jnp.where(
                            oh, ef[f][:, dx:dx + TX][None], 0.0).sum(1)
                    scnt[...] = scnt[...] + local[KC - 1:KC]
        ts = slice(t * TX, (t + 1) * TX)
        for f in range(8):
            migs[s, f, :, ts] = sacc[f]
        migs[s, 8, :, ts] = (kcol < scnt[...]).astype(f32)
        cnt_ref[s, t] = jnp.minimum(jnp.max(scnt[...]), K)

    def mig(q):
        s = q % 5
        for t in range(NT):
            pre = jnp.int32(0)
            for dr in range(3):
                pre = jnp.maximum(pre, _src_bound(rm_ref, q - 1 + dr, t, NT))

            @pl.when(pre == 0)
            def _(t=t, s=s):
                for f in range(9):
                    migs[s, f, :, t * TX:(t + 1) * TX] = \
                        jnp.zeros((K, TX), f32)
                cnt_ref[s, t] = 0

            if KH < K:
                @pl.when((pre > 0) & (pre <= KH))
                def _(t=t, q=q):
                    mig_tile(q, t, KH)

                @pl.when(pre > KH)
                def _(t=t, q=q):
                    mig_tile(q, t, K)
            else:
                @pl.when(pre > 0)
                def _(t=t, q=q):
                    mig_tile(q, t, K)

    def nbr_bound(row, t):
        """Exact post-migration occupancy bound over row's 3-tile window."""
        s = row % 5
        b = cnt_ref[s, t]
        if NT > 1:
            b = jnp.maximum(b, cnt_ref[s, jnp.clip(t - 1, 0, NT - 1)])
            b = jnp.maximum(b, cnt_ref[s, jnp.clip(t + 1, 0, NT - 1)])
        return b

    def rho_tile(q, t, KC, KN):
        """Poly6 density of tile t of migrated row q, center/neighbor slot
        axes statically sliced to KC/KN (the sweep kernel's measured
        half-K fast path: full broadcast, no loop overhead, quarter the
        pair slots when the 3x3 window's occupancy bound allows)."""
        sq = q % 5
        ts = slice(t * TX, (t + 1) * TX)
        cx = migs[sq, _FP_X, :KC, ts][:, None, :]
        cy = migs[sq, _FP_Y, :KC, ts][:, None, :]
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, KN, 1), 1)
        acc = jnp.zeros((KC, TX), f32)
        for dr in (-1, 0, 1):
            src = (q + dr) % 5
            exx = ext_win(migs[src, _FP_X][:KN], t)
            exy = ext_win(migs[src, _FP_Y][:KN], t)
            exm = ext_win(migs[src, _FP_M][:KN], t)
            exo = ext_win(migs[src, _FP_OCC][:KN], t)
            live = kk < nbr_bound(q + dr, t)
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
                [acc, jnp.zeros((K - KC, TX), f32)], axis=0)
        rho_ring[q % 3, :, ts] = acc

    def compute_rho(q):
        sq = q % 5
        for t in range(NT):
            wb = jnp.int32(0)
            for dr in (-1, 0, 1):
                wb = jnp.maximum(wb, nbr_bound(q + dr, t))

            @pl.when(cnt_ref[sq, t] == 0)
            def _(t=t, sq=sq):
                rho_ring[q % 3, :, t * TX:(t + 1) * TX] = \
                    jnp.zeros((K, TX), f32)

            if KH < K:
                @pl.when((cnt_ref[sq, t] > 0) & (wb <= KH))
                def _(t=t, q=q):
                    rho_tile(q, t, KH, KH)

                @pl.when((cnt_ref[sq, t] > 0) & (wb > KH))
                def _(t=t, q=q):
                    rho_tile(q, t, K, K)
            else:
                @pl.when(cnt_ref[sq, t] > 0)
                def _(t=t, q=q):
                    rho_tile(q, t, K, K)

    def eos(rho):
        return jnp.maximum(stiffness * (rho - rest_density), 0.0)

    def zero_out(t):
        out1[0, :, :, t * TX:(t + 1) * TX] = jnp.zeros((9, K, TX), f32)
        out2[0, :, :, t * TX:(t + 1) * TX] = jnp.zeros((2, K, TX), f32)
        if NR > 0:
            for i in range(4 * RC):
                out3[0, t, i] = jnp.float32(0.0)
        out4[0, 0, t] = 0

    def force_acc(q, t, KC):
        """Pressure+viscosity force of tile t of migrated row q, center
        slot axis statically sliced to KC (the sweep kernel's fast path:
        all occupied slots have index < cnt_ref[q, t] <= KC); neighbor
        slots are occupancy-bounded by the CH-chunk fori. Stages the
        padded [K, TX] result in sacc[0:2] (free after migration) so the
        kick/couple/write tail is emitted once, outside the KC branch."""
        sq = q % 5
        ts = slice(t * TX, (t + 1) * TX)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (KC, CH, 1), 0)
        kc = jax.lax.broadcasted_iota(jnp.int32, (KC, CH, 1), 1)
        cx = migs[sq, _FP_X, :KC, ts][:, None, :]
        cy = migs[sq, _FP_Y, :KC, ts][:, None, :]
        cvx = migs[sq, _FP_VX, :KC, ts][:, None, :]
        cvy = migs[sq, _FP_VY, :KC, ts][:, None, :]
        cocc = migs[sq, _FP_OCC, :KC, ts][:, None, :]
        crho = rho_ring[q % 3, :KC, ts][:, None, :]
        cterm = eos(crho) / jnp.maximum(crho * crho, 1e-30)
        fx_a = jnp.zeros((KC, TX), f32)
        fy_a = jnp.zeros((KC, TX), f32)
        for dr in (-1, 0, 1):
            bound = nbr_bound(q + dr, t)

            def body(i, acc, dr=dr, t=t):
                fxa, fya = acc
                ch = migs[(q + dr) % 5, :, pl.ds(i * CH, CH), :]
                rch = rho_ring[(q + dr) % 3, pl.ds(i * CH, CH), :]
                for dx in range(3):
                    w_ = lambda v: ext_win(v, t)[:, dx:dx + TX][None]
                    nbx, nby = w_(ch[_FP_X]), w_(ch[_FP_Y])
                    nbvx, nbvy = w_(ch[_FP_VX]), w_(ch[_FP_VY])
                    nbm, nbo = w_(ch[_FP_M]), w_(ch[_FP_OCC])
                    nbrho = w_(rch)
                    nbp = eos(nbrho)
                    ddx = cx - nbx
                    ddy = cy - nby
                    r2 = ddx * ddx + ddy * ddy
                    ok = (cocc * nbo > 0) & (r2 >= min_d2) \
                        & (r2 < h2) & (nbrho >= min_rho) \
                        & (crho >= min_rho)
                    if dr == 0 and dx == 1:
                        ok = ok & (k1 != i * CH + kc)
                    rr = jnp.sqrt(jnp.maximum(r2, 1e-30))
                    term = cterm + nbp / jnp.maximum(
                        nbrho * nbrho, 1e-30)
                    f_press = -nbm * term * spiky * (h - rr) ** 2
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
            zpad = jnp.zeros((K - KC, TX), f32)
            fx_a = jnp.concatenate([fx_a, zpad], axis=0)
            fy_a = jnp.concatenate([fy_a, zpad], axis=0)
        sacc[0] = fx_a
        sacc[1] = fy_a

    def force_out(q):
        """Force on migrated row q + second kick; writes the output row."""
        sq = q % 5
        for t in range(NT):
            @pl.when(cnt_ref[sq, t] == 0)
            def _(t=t):
                zero_out(t)

            if KH < K:
                @pl.when((cnt_ref[sq, t] > 0) & (cnt_ref[sq, t] <= KH))
                def _(t=t, q=q):
                    force_acc(q, t, KH)

                @pl.when(cnt_ref[sq, t] > KH)
                def _(t=t, q=q):
                    force_acc(q, t, K)
            else:
                @pl.when(cnt_ref[sq, t] > 0)
                def _(t=t, q=q):
                    force_acc(q, t, K)

            @pl.when(cnt_ref[sq, t] > 0)
            def _(t=t, q=q, sq=sq):
                ts = slice(t * TX, (t + 1) * TX)
                fx_a = sacc[0]
                fy_a = sacc[1]
                # second kick (metal:428-441), then coupling / output row
                x1 = migs[sq, _FP_X, :, ts]
                y1 = migs[sq, _FP_Y, :, ts]
                vx1 = migs[sq, _FP_HX, :, ts] + half_dt * fx_a
                vy1 = migs[sq, _FP_HY, :, ts] + half_dt * fy_a
                mm = migs[sq, _FP_M, :, ts]
                occ = migs[sq, _FP_OCC, :, ts]
                rho_t = rho_ring[q % 3, :, ts]
                pe = eos(rho_t)

                def write_row(xo, yo, vxo, vyo, axo, ayo, t=t, sq=sq,
                              ts=ts):
                    out1[0, _FP_X, :, ts] = xo
                    out1[0, _FP_Y, :, ts] = yo
                    out1[0, _FP_VX, :, ts] = vxo
                    out1[0, _FP_VY, :, ts] = vyo
                    out1[0, _FP_HX, :, ts] = axo
                    out1[0, _FP_HY, :, ts] = ayo
                    out1[0, _FP_M, :, ts] = migs[sq, _FP_M, :, ts]
                    out1[0, _FP_ID, :, ts] = migs[sq, _FP_ID, :, ts]
                    out1[0, _FP_OCC, :, ts] = migs[sq, _FP_OCC, :, ts]

                if NR > 0:
                    off = cn["boundary_offset"]

                    @pl.when(cpl_ref[q, t] > 0)
                    def _(q=q, t=t, x1=x1, y1=y1, vx1=vx1, vy1=vy1,
                          rho_t=rho_t, pe=pe, mm=mm, occ=occ,
                          fx_a=fx_a, fy_a=fy_a):
                        crow = cand_ref[pl.ds(q, 1), :]      # [1, RC] ids
                        nx_, ny_, vxo, vyo, axo, ayo = _couple_core(
                            RC, V, cn, K, TX, t, crow, rig_ref, out3,
                            cacc, x1, y1, vx1, vy1, rho_t, pe, mm, occ,
                            fx_a, fy_a)
                        write_row(nx_, ny_, vxo, vyo, axo, ayo)

                    @pl.when(cpl_ref[q, t] == 0)
                    def _(q=q, t=t, x1=x1, y1=y1, vx1=vx1, vy1=vy1,
                          fx_a=fx_a, fy_a=fy_a):
                        # copy-through with the global out-of-tank floor
                        # clamp the coupled XLA path applies per sub-step
                        write_row(jnp.where(x1 < 0.0, off, x1),
                                  jnp.where(y1 < 0.0, off, y1),
                                  vx1, vy1, fx_a, fy_a)
                        for i in range(4 * RC):
                            out3[0, t, i] = jnp.float32(0.0)
                else:
                    write_row(x1, y1, vx1, vy1, fx_a, fy_a)
                out2[0, 0, :, ts] = rho_t
                out2[0, 1, :, ts] = pe
                out4[0, 0, t] = cnt_ref[sq, t]

    # ---- schedule -------------------------------------------------------
    @pl.when(p == 0)
    def _():                            # warmup
        dma_start(0)
        dma_start(1)
        dma_start(2)
        dma_start(3)
        dma_wait(0)
        dma_wait(1)
        dma_wait(2)
        drift(0)
        drift(1)
        drift(2)
        zero_mig(0)                     # top apron: empty
        mig(1)
        rho_ring[0] = jnp.zeros((K, NTX), f32)

    @pl.when(p + 3 < NY2)
    def _():
        dma_wait(p + 3)                 # p==0: row 3, started in warmup
        drift(p + 3)

    @pl.when(p + 4 < NY2)               # p's start pairs with p+1's wait
    def _():
        dma_start(p + 4)

    @pl.when(p + 2 <= ny)
    def _():
        mig(p + 2)

    @pl.when(p + 2 == ny + 1)
    def _():
        zero_mig(ny + 1)                # bottom apron: empty

    @pl.when(p + 1 <= ny)
    def _():
        compute_rho(p + 1)

    @pl.when(p + 1 == ny + 1)
    def _():
        rho_ring[(p + 1) % 3] = jnp.zeros((K, NTX), f32)

    @pl.when((p >= 1) & (p <= ny))
    def _():
        force_out(p)

    @pl.when((p == 0) | (p == ny + 1))
    def _():                            # apron output rows stay empty
        for t in range(NT):
            zero_out(t)


def make_substep9(ny: int, nx: int, NT: int, K: int, h: float,
                  poly6: float, spiky: float, visc_lap: float,
                  viscosity: float, min_d2: float, min_rho: float,
                  stiffness: float, rest_density: float,
                  half_dt: float, sub_dt: float, lim: float,
                  cell: float, eps: float, gmin: int,
                  NR: int = 0, V: int = 0, consts: dict | None = None,
                  RC: int = 16, TX: int = TILE_X, dtype=jnp.float32,
                  interpret: bool = False):
    """Whole-sub-step kernel. With rigids (NR > 0):

        substep(rm, cpl, cand, rig, ST) -> (ST', rho_p, partials, bounds)

    without: ``substep(rm, ST) -> (ST', rho_p, bounds)``.

    ST is the padded 9-plane stack [ny+2, 9, K, NT*TX] (planes: x, y, vx,
    vy, ax, ay, m, id, occ); rm the per-(padded-row, tile) max cell
    occupancy [ny+2, NT] int32 of ST's occ plane — exactly what ``bounds``
    reports for the OUTPUT stack, so successive sub-steps chain with zero
    XLA glue (coupling moves particles only within their cell's 3x3 window,
    which the next migrate's walking clamp absorbs, so the post-migration
    bound stays valid). cpl [ny+2, NT] int32 is the GEOMETRIC coupling
    mask (rigid AABB near the tile; sph.py _cpl_mask with occupancy left
    to the kernel's own post-migration counts); cand/rig are coupling9's
    candidate-row and rigid-proxy tables. ST' feeds straight back in;
    rho_p is [ny+2, 2, K, NT*TX] (density, pressure); partials are
    per-(row, tile) (fx, fy, tq, id) candidate sums [ny+2, NT, 4*RC].

    Replaces the 3-kernel chain (make_migrate_ring -> make_pair_sweep ->
    make_coupling9) with ONE pass over the grid rows: same physics
    (reference: fluid_kernels.metal:246-441,533-924) up to float
    reassociation, one HBM read + one write of the row stack per sub-step
    instead of three reads (one 3x3-amplified) and two writes."""
    if ny < 2:
        raise ValueError("substep9 needs ny >= 2")
    if nx + 2 >= _ENC:
        raise ValueError(f"grid too wide for packed targets (nx={nx})")
    NTX = NT * TX
    W = 15 + 2 * V
    RC = min(RC, max(NR, 1))
    kern = functools.partial(
        _substep9_kernel, RC, V, W, consts or {}, NR, h, h * h, poly6,
        spiky, visc_lap, viscosity, min_d2, min_rho, stiffness,
        rest_density, half_dt, sub_dt, lim, cell, eps, gmin, nx, K, TX,
        NT, NTX, ny)
    npf = 2 if NR > 0 else 1
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [
        pl.BlockSpec((1, 9, K, NTX), lambda j, *_: (j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, K, NTX), lambda j, *_: (j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ny + 2, 9, K, NTX), dtype),
        jax.ShapeDtypeStruct((ny + 2, 2, K, NTX), dtype),
    ]
    scratch = [
        pltpu.VMEM((5, 9, K, NTX), dtype),       # drifted-row ring
        pltpu.VMEM((5, K, NTX), jnp.int32),      # packed targets
        pltpu.VMEM((5, 9, K, NTX), dtype),       # migrated-row ring
        pltpu.VMEM((3, K, NTX), dtype),          # rho ring
        pltpu.SMEM((5, NT), jnp.int32),          # post-mig occupancy
        pltpu.SemaphoreType.DMA((5,)),
        pltpu.VMEM((8, K, TX), dtype),           # migration field sums
        pltpu.VMEM((1, TX), jnp.int32),          # migration rank counts
    ]
    if NR > 0:
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ny + 2, RC), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NR + 1, W), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs.append(pl.BlockSpec((1, NT, 4 * RC),
                                      lambda j, *_: (j, 0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((ny + 2, NT, 4 * RC), dtype))
        scratch.append(pltpu.VMEM((6, K, TX), dtype))  # coupling accs
    # 3-D like the partials block: a 2-D (1, NT) SMEM block trips the
    # last-two-dims tiling check in the TPU lowering
    out_specs.append(pl.BlockSpec((1, 1, NT), lambda j, *_: (j, 0, 0),
                                  memory_space=pltpu.SMEM))
    out_shape.append(jax.ShapeDtypeStruct((ny + 2, 1, NT), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(ny + 2,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    if NR > 0:
        def substep(rm, cpl, cand, rig, ST):
            ST2, RP, parts, rm2 = call(rm, cpl, ST, cand, rig)
            return ST2, RP, parts, rm2[:, 0]
    else:
        def substep(rm, ST):
            ST2, RP, rm2 = call(rm, ST)
            return ST2, RP, rm2[:, 0]

    return substep


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

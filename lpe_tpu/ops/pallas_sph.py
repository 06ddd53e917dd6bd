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
                     ox, oy, ovx, ovy, oax, oay, orf):
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

        z = jnp.zeros((K, TX), px.dtype)
        fz = jnp.zeros((K, TX), jnp.bool_)
        acx, acy = z, z                 # position corrections (sum rigids)
        sfx, sfy = z, z                 # impulse force on fluid (sum rigids)
        had_pos, had_imp = fz, fz
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
            else:                      # uniform scenes: constant predicate,
                is_c = bool(cn["any_circle"])   # dead branch folds away
            inside = in_aabb & jnp.where(is_c, inside_c, inside_p)

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
            acx = acx + jnp.where(inside, corr_x * cn["relax_factor"], 0.0)
            acy = acy + jnp.where(inside, corr_y * cn["relax_factor"], 0.0)
            had_pos = had_pos | inside

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
            sfx = sfx + fx
            sfy = sfy + fy
            had_imp = had_imp | act

        # ---- post-loop finalization ----
        # fluid back-reaction (Newton's 3rd law)
        ffx = -sfx * cn["fluid_force_scale"]
        ffy = -sfy * cn["fluid_force_scale"]
        fm = jnp.sqrt(ffx * ffx + ffy * ffy)
        fsc = jnp.where(fm > cn["fluid_force_max"],
                        cn["fluid_force_max"] / jnp.maximum(fm, 1e-30), 1.0)
        inv_m = jnp.where(m > 1e-4, 1.0 / m, 1.0)
        oax[0] = jnp.where(had_imp, ax + ffx * fsc * inv_m, ax)
        oay[0] = jnp.where(had_imp, ay + ffy * fsc * inv_m, ay)
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
        ox[0] = nx_
        oy[0] = ny_
        ovx[0] = jnp.where(fix, vx1 - valong * cdx, vx1)
        ovy[0] = jnp.where(fix, vy1 - valong * cdy, vy1)


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

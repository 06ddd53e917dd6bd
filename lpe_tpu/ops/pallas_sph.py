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

    @pl.when(rm_ref[j + 1, t] > 0)
    def _():
        FX, FY, FVX, FVY, FM, FR, FP, FO = range(8)
        ctr = rows[1][1]
        cx = ctr[FX, 0]                        # [K, TX]
        cy = ctr[FY, 0]
        cvx = ctr[FVX, 0]
        cvy = ctr[FVY, 0]
        crho = ctr[FR, 0]
        cp = ctr[FP, 0]
        cocc = ctr[FO, 0]
        cterm = cp / jnp.maximum(crho * crho, 1e-30)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (K, TX), 0)
        fx_a = jnp.zeros((K, TX), outx.dtype)
        fy_a = jnp.zeros((K, TX), outy.dtype)
        # occupancy-bounded neighbor-slot fori (see _density_kernel)
        for r, (bl, bm, br) in enumerate(rows):
            scratch[...] = jnp.stack(
                [_ext(bl, bm, br, f, K, TX) for f in range(7)]
                + [_ext(bl, bm, br, FO, K, TX, (t, NT))])   # [8, K, TX+2]
            bound = _src_bound(rm_ref, j + r, t, NT)

            def body(k2, acc, r=r):
                fxa, fya = acc
                sl = scratch[:, pl.ds(k2, 1), :]            # [8, 1, TX+2]
                for dx in range(3):
                    c = lambda f: sl[f, :, dx:dx + TX]      # [1, TX]
                    nbx, nby = c(FX), c(FY)
                    nbvx, nbvy = c(FVX), c(FVY)
                    nbm, nbrho, nbp = c(FM), c(FR), c(FP)
                    nbo = c(FO)
                    ddx = cx - nbx
                    ddy = cy - nby
                    r2 = ddx * ddx + ddy * ddy
                    ok = (cocc * nbo > 0) & (r2 >= min_d2) & (r2 < h2) \
                        & (nbrho >= min_rho) & (crho >= min_rho)
                    if r == 1 and dx == 1:
                        ok = ok & (k1 != k2)
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
                    fxa = fxa + jnp.where(ok, fx, 0.0)
                    fya = fya + jnp.where(ok, fy, 0.0)
                return fxa, fya

            fx_a, fy_a = jax.lax.fori_loop(0, bound, body, (fx_a, fy_a))
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

"""Pallas TPU kernels for the SPH pair passes (density, forces).

The XLA cell-dense path (systems/fluid/sph.py) computes all ``ncells*K*K*9``
pair slots unconditionally. These kernels walk the grid row by row with the
3-row band resident in VMEM and cut the two big wastes:

- **empty rows**: a scalar-prefetched per-row occupancy table lets a program
  skip its row entirely (``pl.when``) — dam-break/tank scenes leave most of
  the universe empty;
- **occupancy slack**: the neighbor-slot loop runs to each row's actual
  max occupancy instead of the static cap K (typical occupancy is ~6 of 16).

Math is bit-identical to the XLA path (poly6 density + EOS clamp, symmetric
spiky pressure + viscosity Laplacian; reference: fluid_kernels.metal:246-403)
up to float reassociation of the neighbor sum.

Dense layout here is [ny+2, K, nx+2] (row, slot, x): each program's slab is
a [K, nx+2] tile with VPU lanes along x.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_specs(n_fields: int, K: int, nxp: int):
    """3 row-offset BlockSpecs per field, field-major ordering."""
    specs = []
    for _ in range(n_fields):
        for r in (0, 1, 2):
            specs.append(pl.BlockSpec(
                (1, K, nxp), functools.partial(
                    lambda j, rm, r=r: (j + r, 0, 0)),
                memory_space=pltpu.VMEM))
    return specs


def _density_kernel(h2, poly6, K, nxp, rm_ref, *refs):
    (x0, x1, x2, y0, y1, y2, m0, m1, m2, o0, o1, o2, out) = refs
    nx = nxp - 2
    j = pl.program_id(0)

    @pl.when(rm_ref[j + 1] == 0)
    def _():
        out[0] = jnp.zeros((K, nxp), out.dtype)

    @pl.when(rm_ref[j + 1] > 0)
    def _():
        cx = x1[0, :, 1:-1][:, None, :]        # [K, 1, nx] center cells
        cy = y1[0, :, 1:-1][:, None, :]

        def row_sum(xr, yr, mr, orr, bound, acc):
            # all K neighbor slots at once ([K,K,nx] broadcast); slots past
            # the row's occupancy bound are masked, not skipped — static
            # shapes vectorize better than a dynamic k2 loop on the VPU
            k2 = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
            live = k2 < bound
            for dx in range(3):
                nbx = xr[0, :, dx:dx + nx][None]       # [1, K, nx]
                nby = yr[0, :, dx:dx + nx][None]
                nbm = mr[0, :, dx:dx + nx][None]
                nbo = orr[0, :, dx:dx + nx][None]
                ddx = cx - nbx
                ddy = cy - nby
                r2 = ddx * ddx + ddy * ddy
                w = jnp.where(live & (nbo > 0) & (r2 < h2),
                              poly6 * (h2 - r2) ** 3, 0.0)
                acc = acc + (nbm * w).sum(1)
            return acc

        acc = jnp.zeros((K, nx), out.dtype)
        acc = row_sum(x0, y0, m0, o0, rm_ref[j], acc)
        acc = row_sum(x1, y1, m1, o1, rm_ref[j + 1], acc)
        acc = row_sum(x2, y2, m2, o2, rm_ref[j + 2], acc)
        # the self pair (center row, dx=1, k1==k2) is INCLUDED: density
        # self-contributes in the reference (metal:284-295)
        out[0] = jnp.zeros((K, nxp), out.dtype)
        out[0, :, 1:-1] = acc


def _force_kernel(h, h2, spiky, visc_lap, viscosity, min_d2, min_rho,
                  K, nxp, rm_ref, *refs):
    (x0, x1, x2, y0, y1, y2, vx0, vx1, vx2, vy0, vy1, vy2,
     m0, m1, m2, r0, r1, r2_, p0, p1, p2, o0, o1, o2,
     outx, outy) = refs
    nx = nxp - 2
    j = pl.program_id(0)

    @pl.when(rm_ref[j + 1] == 0)
    def _():
        outx[0] = jnp.zeros((K, nxp), outx.dtype)
        outy[0] = jnp.zeros((K, nxp), outy.dtype)

    @pl.when(rm_ref[j + 1] > 0)
    def _():
        cx = x1[0, :, 1:-1][:, None, :]
        cy = y1[0, :, 1:-1][:, None, :]
        cvx = vx1[0, :, 1:-1][:, None, :]
        cvy = vy1[0, :, 1:-1][:, None, :]
        crho = r1[0, :, 1:-1][:, None, :]
        cp = p1[0, :, 1:-1][:, None, :]
        cocc = o1[0, :, 1:-1][:, None, :]
        cterm = cp / jnp.maximum(crho * crho, 1e-30)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 0)
        k2i = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 1)
        diag = k1 == k2i

        def row_sum(xr, yr, vxr, vyr, mr, rr, pr, orr, bound, is_center,
                    acc):
            fx_a, fy_a = acc
            live = k2i[:1] < bound                      # [1, K, 1]
            for dx in range(3):
                nbx = xr[0, :, dx:dx + nx][None]
                nby = yr[0, :, dx:dx + nx][None]
                nbvx = vxr[0, :, dx:dx + nx][None]
                nbvy = vyr[0, :, dx:dx + nx][None]
                nbm = mr[0, :, dx:dx + nx][None]
                nbrho = rr[0, :, dx:dx + nx][None]
                nbp = pr[0, :, dx:dx + nx][None]
                nbo = orr[0, :, dx:dx + nx][None]
                ddx = cx - nbx
                ddy = cy - nby
                r2 = ddx * ddx + ddy * ddy
                ok = live & (cocc * nbo > 0) & (r2 >= min_d2) & (r2 < h2) \
                    & (nbrho >= min_rho) & (crho >= min_rho)
                if is_center and dx == 1:
                    ok = ok & ~diag
                r = jnp.sqrt(jnp.maximum(r2, 1e-30))
                term = cterm + nbp / jnp.maximum(nbrho * nbrho, 1e-30)
                w_spiky = spiky * (h - r) ** 2
                f_press = -nbm * term * w_spiky
                fx = f_press * ddx / r
                fy = f_press * ddy / r
                f_visc = viscosity * nbm * (
                    visc_lap * (h - r) / jnp.maximum(nbrho, 1e-30))
                fx = fx - f_visc * (cvx - nbvx)
                fy = fy - f_visc * (cvy - nbvy)
                fx_a = fx_a + jnp.where(ok, fx, 0.0).sum(1)
                fy_a = fy_a + jnp.where(ok, fy, 0.0).sum(1)
            return fx_a, fy_a

        z = jnp.zeros((K, nx), outx.dtype)
        acc = row_sum(x0, y0, vx0, vy0, m0, r0, p0, o0, rm_ref[j], False,
                      (z, z))
        acc = row_sum(x1, y1, vx1, vy1, m1, r1, p1, o1, rm_ref[j + 1], True,
                      acc)
        fx, fy = row_sum(x2, y2, vx2, vy2, m2, r2_, p2, o2, rm_ref[j + 2],
                         False, acc)
        outx[0] = jnp.zeros((K, nxp), outx.dtype)
        outy[0] = jnp.zeros((K, nxp), outy.dtype)
        outx[0, :, 1:-1] = fx
        outy[0, :, 1:-1] = fy


def make_density(ny: int, nx: int, K: int, h: float, poly6: float,
                 dtype=jnp.float32, interpret: bool = False):
    """Returns density(rm, Dx, Dy, Dm, Docc) -> rho rows [ny, K, nx+2].
    Inputs are padded dense grids [ny+2, K, nx+2]; rm is the per-padded-row
    occupancy bound [ny+2] int32 (<= K)."""
    nxp = nx + 2
    kern = functools.partial(_density_kernel, h * h, poly6, K, nxp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny,),
        in_specs=_band_specs(4, K, nxp),
        out_specs=pl.BlockSpec((1, K, nxp), lambda j, rm: (j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ny, K, nxp), dtype),
        interpret=interpret,
    )

    def density(rm, Dx, Dy, Dm, Docc):
        args = []
        for f in (Dx, Dy, Dm, Docc):
            args += [f, f, f]
        return call(rm, *args)

    return density


def make_force(ny: int, nx: int, K: int, h: float, spiky: float,
               visc_lap: float, viscosity: float, min_d2: float,
               min_rho: float, dtype=jnp.float32, interpret: bool = False):
    """Returns force(rm, Dx, Dy, Dvx, Dvy, Dm, Drho, Dp, Docc)
    -> (fx, fy) rows [ny, K, nx+2]."""
    nxp = nx + 2
    kern = functools.partial(_force_kernel, h, h * h, spiky, visc_lap,
                             viscosity, min_d2, min_rho, K, nxp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny,),
        in_specs=_band_specs(8, K, nxp),
        out_specs=[
            pl.BlockSpec((1, K, nxp), lambda j, rm: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, nxp), lambda j, rm: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ny, K, nxp), dtype),
                   jax.ShapeDtypeStruct((ny, K, nxp), dtype)],
        interpret=interpret,
    )

    def force(rm, Dx, Dy, Dvx, Dvy, Dm, Drho, Dp, Docc):
        args = []
        for f in (Dx, Dy, Dvx, Dvy, Dm, Drho, Dp, Docc):
            args += [f, f, f]
        return call(rm, *args)

    return force

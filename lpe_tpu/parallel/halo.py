"""Spatial (row-band) sharding for SPH grids with ICI halo exchange.

The production multi-chip path (`parallel/sharded.py`) shards the particle
axis and lets GSPMD insert collectives — correct, but the dense neighbor
grid gets all-gathered. The scalable design is *spatial*: shard the grid's
row axis across the mesh so each chip owns a horizontal band of the domain,
and exchange exactly one boundary row per neighbor per substep over ICI
(`lax.ppermute`) — O(nx*K) bytes per step instead of O(ny*nx*K).

This module provides the standalone building block: a shard_map density pass
over row-banded dense fields, bit-compatible with the single-device pass (up
to sum reassociation). The **full** spatially-sharded fluid tick — grid-
resident sub-steps with dense cross-band particle migration via the halo
rows, three one-row exchanges per sub-step, and a reduce-scatter readback by
particle id — lives in ``systems/fluid/sph.py::step_halo`` and is selected
by ``parallel/sharded.py`` whenever the mesh has more than one device (see
``FluidConfig.partition``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                     # jax >= 0.8
    from jax import shard_map
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..systems.fluid.sph import poly6_coeff_2d


def make_halo_density(ny: int, nx: int, K: int, h: float, mesh: Mesh,
                      axis: str = "data"):
    """Returns ``density(x, y, m, occ) -> rho`` over row-banded dense grids.

    Inputs are dense fields [ny, K, nx+2] (x-apron included, no row apron),
    sharded on the row axis (``P(axis)``); ``ny`` must divide evenly by the
    mesh axis size. Output rho has the same shape/sharding.
    """
    D = mesh.shape[axis]
    if ny % D != 0:
        raise ValueError(f"ny={ny} not divisible by mesh axis size {D}")
    nxp = nx + 2
    h2 = h * h
    POLY6 = poly6_coeff_2d(h)

    def local(x, y, m, occ):
        # halo exchange: my first row goes down, my last row goes up
        fwd = [(i, (i + 1) % D) for i in range(D)]   # i sends to i+1
        bwd = [(i, (i - 1) % D) for i in range(D)]

        def with_halo(f, zero_edges):
            prev_last = jax.lax.ppermute(f[-1:], axis, fwd)  # from i-1
            next_first = jax.lax.ppermute(f[:1], axis, bwd)  # from i+1
            if zero_edges:
                ai = jax.lax.axis_index(axis)
                prev_last = jnp.where(ai == 0, 0.0, prev_last)
                next_first = jnp.where(ai == D - 1, 0.0, next_first)
            return jnp.concatenate([prev_last, f, next_first], axis=0)

        # zeroing the halo occupancy at the global domain edges is enough to
        # mask the ring wraparound
        Dx = with_halo(x, False)
        Dy = with_halo(y, False)
        Dm = with_halo(m, False)
        Do = with_halo(occ, True)
        rows = x.shape[0]

        cx = Dx[1:-1][:, :, None, 1:-1]          # [rows, K, 1, nx]
        cy = Dy[1:-1][:, :, None, 1:-1]
        co = Do[1:-1][:, :, None, 1:-1]
        rho = jnp.zeros((rows, K, nx), x.dtype)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                nbx = jax.lax.slice(Dx, (dy, 0, dx),
                                    (dy + rows, K, dx + nx))[:, None]
                nby = jax.lax.slice(Dy, (dy, 0, dx),
                                    (dy + rows, K, dx + nx))[:, None]
                nbm = jax.lax.slice(Dm, (dy, 0, dx),
                                    (dy + rows, K, dx + nx))[:, None]
                nbo = jax.lax.slice(Do, (dy, 0, dx),
                                    (dy + rows, K, dx + nx))[:, None]
                # [rows, K(center), K(neighbor), nx]
                ddx = cx - nbx
                ddy = cy - nby
                r2 = ddx * ddx + ddy * ddy
                ok = (co * nbo > 0) & (r2 < h2)
                w = jnp.where(ok, POLY6 * (h2 - r2) ** 3, 0.0)
                rho = rho + (nbm * w).sum(2)
        out = jnp.zeros((rows, K, nxp), x.dtype)
        return out.at[:, :, 1:-1].set(rho)

    spec = P(axis, None, None)
    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(spec, spec, spec, spec),
                             out_specs=spec))

"""N-body gravity.

The reference uses a pointer-chasing Barnes-Hut quadtree with theta=0.5 and an
"all-small subtree skip" (reference: src/systems/barnes_hut.cpp:102-312).
Pointer trees are hostile to the TPU; two replacements are provided:

1. **MXU direct sum** (default for N <= ~128k): the all-pairs interaction is a
   dense batched computation that the MXU/VPU executes at near speed-of-light.
   At the reference's own workload sizes (1e3 bodies) and even at the 1e5
   north-star scale this is faster than any tree walk on this hardware *and*
   exact (theta -> 0), strictly more accurate than the reference.

2. **P3M far field** (large N, :mod:`lpe_tpu.ops.pm_gravity`):
   CIC mass deposit -> FFT force convolution -> CIC gather with a
   smoothstep-rolled kernel, a dense cell-grid particle-particle pass adding
   the exact complementary short-range force below the cutoff (so close
   pairs are *exact*, not smeared), plus an exact direct sum over the few
   *heavy* bodies (above ``BarnesHutConfig.heavy_threshold``) so dominant
   central forces are never meshed. O(G^2 log G + N*K) independent of
   particle pairing; selected when capacity exceeds
   ``BarnesHutConfig.direct_sum_max_bodies``.

Semantics parity notes:
- softened distance ``d2 = dx^2 + dy^2 + soft^2`` (barnes_hut.cpp:284-287)
- sources are bodies inside the universe bounds (buildTree skips
  out-of-bounds, barnes_hut.cpp:120-127); receivers are all non-boundary
  bodies.
- when ``small_mass_threshold > 0``, subtrees whose masses are *all* below
  the threshold are skipped; at leaf granularity that means sub-threshold
  bodies never act as sources. The direct sum reproduces exactly this
  leaf-level rule (the reference additionally lets small masses ride along
  inside mixed far-field aggregates — a theta-approximation artifact the
  exact sum does not need).
- the whole system is statically disabled when *every* non-boundary mass is
  below the threshold (barnes_hut.cpp:56-72), decided at build time since
  masses are immutable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ScenarioSystemConfig
from ..core.constants import REAL_G
from ..scene import SceneSpec
from ..state import SimState


def _direct_sum_accel(pos, mass, src_mask, rcv_mask, soft2, chunk: int):
    """Acceleration on every body from masked sources, O(N^2) on the MXU."""
    n = pos.shape[0]
    msrc = jnp.where(src_mask, mass, 0.0)

    def row_block(args):
        p_blk, idx_blk = args  # [B,2], [B]
        dx = pos[None, :, 0] - p_blk[:, None, 0]      # [B, N]
        dy = pos[None, :, 1] - p_blk[:, None, 1]
        d2 = dx * dx + dy * dy + soft2
        inv_d = jax.lax.rsqrt(d2)
        # force/m_i along (dx,dy)/d with magnitude G*m_j/d2
        w = msrc[None, :] * inv_d / d2                # G applied once below
        w = jnp.where(idx_blk[:, None] == jnp.arange(n)[None, :], 0.0, w)
        ax = (w * dx).sum(axis=1)
        ay = (w * dy).sum(axis=1)
        return jnp.stack([ax, ay], axis=-1)

    if n <= chunk:
        acc = row_block((pos, jnp.arange(n)))
    else:
        nb = -(-n // chunk)
        pad = nb * chunk - n
        p = jnp.pad(pos, ((0, pad), (0, 0)))
        idx = jnp.arange(nb * chunk)
        acc = jax.lax.map(row_block,
                          (p.reshape(nb, chunk, 2), idx.reshape(nb, chunk)))
        acc = acc.reshape(nb * chunk, 2)[:n]
    return REAL_G * acc * rcv_mask[:, None].astype(acc.dtype)


def make_barnes_hut(spec: SceneSpec, cfg: ScenarioSystemConfig):
    bh = cfg.barnes_hut
    sh = cfg.shared
    # Static early-exit: all non-boundary masses insignificant
    if bh.small_mass_threshold > 0.0 and \
            spec.max_nonboundary_mass < bh.small_mass_threshold:
        return None
    soft2 = sh.gravitational_softener ** 2
    size = sh.universe_size_m
    base_dt = sh.seconds_per_tick
    n = spec.capacity
    chunk = max(128, min(n, (1 << 25) // max(n, 1) // 1 * 8))
    use_pm = n > bh.direct_sum_max_bodies
    if use_pm:
        from ..ops.pm_gravity import (make_heavy_direct, make_pm_gravity,
                                      make_pp_correction)
        pm = make_pm_gravity(size, bh.pm_grid, sh.gravitational_softener,
                             cutoff_cells=bh.p3m_cutoff_cells)
        pp = (make_pp_correction(size, bh.pm_grid,
                                 sh.gravitational_softener,
                                 bh.p3m_cutoff_cells, bh.p3m_max_per_cell,
                                 n_bodies=n)
              if bh.p3m_cutoff_cells > 0 else None)
        heavy_direct = make_heavy_direct(bh.heavy_cap,
                                         sh.gravitational_softener)

    def step(state: SimState) -> SimState:
        b = state.bodies
        dt = base_dt * state.base_time_accel * state.time_scale
        in_bounds = (b.pos[:, 0] >= 0) & (b.pos[:, 0] < size) & \
                    (b.pos[:, 1] >= 0) & (b.pos[:, 1] < size)
        src = b.active & ~b.boundary & in_bounds
        if bh.small_mass_threshold > 0.0:
            src = src & (b.mass >= bh.small_mass_threshold)
        rcv = b.active & ~b.boundary
        if use_pm:
            heavy = src & (b.mass >= bh.heavy_threshold)
            mesh_mass = jnp.where(src & ~heavy, b.mass, 0.0)
            acc = pm(b.pos, mesh_mass) + heavy_direct(b.pos, b.mass, heavy)
            if pp is not None:
                acc = acc + pp(b.pos, mesh_mass)
            acc = REAL_G * acc * rcv[:, None].astype(acc.dtype)
        else:
            acc = _direct_sum_accel(b.pos, b.mass, src, rcv, soft2, chunk)
        vel = b.vel + acc * dt
        return state.replace(bodies=b.replace(vel=vel))

    return step

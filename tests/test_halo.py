"""Spatial row-band sharding with ppermute halo exchange (parallel/halo.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_halo_density_matches_brute_force():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    from jax.sharding import Mesh
    from lpe_tpu.parallel.halo import make_halo_density
    from lpe_tpu.systems.fluid.sph import poly6_coeff_2d

    ny, nx, K, h = 16, 16, 4, 0.05
    cell = h
    nxp = nx + 2
    rng = np.random.default_rng(0)
    # scatter particles into random grid slots; positions inside their cell
    x = np.zeros((ny, K, nxp), np.float32)
    y = np.zeros_like(x)
    m = np.zeros_like(x)
    occ = np.zeros_like(x)
    pts = []
    for _ in range(120):
        r, k, c = rng.integers(0, ny), rng.integers(0, K), rng.integers(1, nxp - 1)
        if occ[r, k, c]:
            continue
        px = (c - 1 + rng.random()) * cell
        py = (r + rng.random()) * cell
        x[r, k, c], y[r, k, c] = px, py
        m[r, k, c] = 0.005
        occ[r, k, c] = 1.0
        pts.append((r, k, c, px, py))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    density = make_halo_density(ny, nx, K, h, mesh)
    rho = np.asarray(density(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m),
                             jnp.asarray(occ)))

    poly6 = poly6_coeff_2d(h)
    for r, k, c, px, py in pts[:40]:
        expect = 0.0
        for r2, k2, c2, qx, qy in pts:
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 < h * h and abs(r2 - r) <= 1 and abs(c2 - c) <= 1:
                expect += 0.005 * poly6 * (h * h - d2) ** 3
        assert np.isclose(rho[r, k, c], expect, rtol=1e-4), (r, k, c)
    # empty slots stay zero
    assert rho[occ == 0].max() == 0.0


def test_halo_fluid_tick_matches_single_device():
    """Full spatially-sharded fluid tick (shard_map + ppermute halos +
    reduce-scatter readback) vs. the single-device grid-resident tick on the
    same scene. Same resident physics (build ranks, migration drop contract,
    pair masks); sums reassociate across the band split, so tolerance-based."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    import dataclasses

    from lpe_tpu.core.constants import SimulationType
    from lpe_tpu.parallel.sharded import (build_sharded_tick, make_mesh,
                                          shard_state)
    from lpe_tpu.scenarios import create_scenario
    from lpe_tpu.scenarios.simple_fluid import SimpleFluidConfig
    from lpe_tpu.systems import build_tick_fn

    def make_scene():
        sc = create_scenario(SimulationType.SIMPLE_FLUID, seed=3,
                             ec=SimpleFluidConfig(fluid_particle_count=200))
        fl = dataclasses.replace(sc.cfg.fluid, pair_backend="xla",
                                 residency="on", num_sub_steps=5)
        sc.cfg = sc.cfg.replace(fluid=fl)
        return sc

    ref_scene = make_scene()
    ref_tick = build_tick_fn(ref_scene.spec, ref_scene.cfg, donate=False)
    s_ref = ref_scene.state
    for _ in range(3):
        s_ref = ref_tick(s_ref)

    halo_scene = make_scene()
    mesh = make_mesh(8)
    tick = build_sharded_tick(halo_scene, mesh)
    s = shard_state(mesh, halo_scene.state)
    for _ in range(3):
        s = tick(s)

    liq = halo_scene.spec.liquid_slice
    p_ref = np.asarray(s_ref.bodies.pos)[liq]
    p_halo = np.asarray(s.bodies.pos)[liq]
    assert np.isfinite(p_halo).all()
    # identical resident contract -> only float reassociation differs
    assert np.abs(p_halo - p_ref).max() < 5e-4, (
        np.abs(p_halo - p_ref).max())
    v_ref = np.asarray(s_ref.bodies.vel)[liq]
    v_halo = np.asarray(s.bodies.vel)[liq]
    assert np.abs(v_halo - v_ref).max() < 5e-3


def test_halo_cross_tick_block_matches_single_device():
    """Multi-chip cross-tick residency (VERDICT r1 #6): a sharded BLOCK
    dispatch (one all-gather build + one reduce-scatter for the whole
    block; per-tick communication = ppermute halo rows only) must match
    the single-device per-tick trajectory to reassociation tolerance,
    including two-way rigid coupling and the per-tick boundary/gravity
    applied in grid space."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    import dataclasses

    from lpe_tpu.core.constants import SimulationType
    from lpe_tpu.parallel.sharded import (build_sharded_run, make_mesh,
                                          shard_state)
    from lpe_tpu.scenarios import create_scenario
    from lpe_tpu.scenarios.fluid_and_polygons import FluidAndPolygonsConfig
    from lpe_tpu.systems import build_tick_fn

    TICKS = 3

    def make_scene():
        sc = create_scenario(
            SimulationType.FLUID_AND_POLYGONS, seed=1,
            ec=FluidAndPolygonsConfig(fluid_particle_count=150))
        fl = dataclasses.replace(sc.cfg.fluid, pair_backend="xla",
                                 residency="on", num_sub_steps=4)
        sc.cfg = sc.cfg.replace(fluid=fl)
        return sc

    ref = make_scene()
    ref_tick = build_tick_fn(ref.spec, ref.cfg, donate=False)
    s_ref = ref.state
    for _ in range(TICKS):
        s_ref = ref_tick(s_ref)

    sc = make_scene()
    mesh = make_mesh(8)
    run = build_sharded_run(sc, mesh, ticks=TICKS)
    s = run(shard_state(mesh, sc.state))

    act = np.asarray(sc.state.bodies.active)
    p_ref = np.asarray(s_ref.bodies.pos)[act]
    p_blk = np.asarray(s.bodies.pos)[act]
    assert np.isfinite(p_blk).all()
    assert int(s.tick) == TICKS
    assert np.abs(p_blk - p_ref).max() < 5e-4, np.abs(p_blk - p_ref).max()
    v_ref = np.asarray(s_ref.bodies.vel)[act]
    v_blk = np.asarray(s.bodies.vel)[act]
    assert np.abs(v_blk - v_ref).max() < 5e-3
    # determinism of the block dispatch
    s2 = run(shard_state(mesh, sc.state))
    assert (np.asarray(s2.bodies.pos) == np.asarray(s.bodies.pos)).all()


def test_halo_fluid_coupling_forces_psum():
    """Two-way coupling under the halo path: rigid force accumulators are
    partial per band and psum'd once per tick — dropping a wall through the
    fluid must produce finite, nonzero coupling on both sides."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    import dataclasses

    from lpe_tpu.core.constants import SimulationType
    from lpe_tpu.parallel.sharded import (build_sharded_tick, make_mesh,
                                          shard_state)
    from lpe_tpu.scenarios import create_scenario
    from lpe_tpu.scenarios.fluid_and_polygons import FluidAndPolygonsConfig

    sc = create_scenario(SimulationType.FLUID_AND_POLYGONS, seed=1,
                         ec=FluidAndPolygonsConfig(fluid_particle_count=150))
    fl = dataclasses.replace(sc.cfg.fluid, pair_backend="xla",
                             residency="on", num_sub_steps=4)
    sc.cfg = sc.cfg.replace(fluid=fl)
    mesh = make_mesh(8)
    tick = build_sharded_tick(sc, mesh)
    s = shard_state(mesh, sc.state)
    for _ in range(30):
        s = tick(s)
    pos = np.asarray(s.bodies.pos)
    assert np.isfinite(pos).all()
    # polygons fell into / onto the fluid and were decelerated by coupling
    liq = sc.spec.liquid_slice
    assert np.isfinite(np.asarray(s.bodies.vel)).all()
    assert np.asarray(s.bodies.density)[liq].max() > 0

"""End-to-end tick-loop behavior per scenario (short horizons).

These are the golden-behavior tests SURVEY.md §4 calls for: the reference has
no tests and its RNG is time-seeded, so parity is asserted on physics
invariants and qualitative trajectories, not bit-exact states.

Workload sizes are tuned for the CPU test backend (this CI host has very few
cores): fluid scenarios run with a reduced per-cell neighbor cap and, where a
scenario's physics regime permits, fewer particles. The full-size defaults
are exercised on real hardware by bench.py.
"""
import jax
import numpy as np
import pytest

from lpe_tpu.core.constants import SimulationType as ST
from lpe_tpu.scenarios import create_scenario
from lpe_tpu.scenarios.bench_scenes import build_dam_break
from lpe_tpu.systems import build_tick_fn

from _util import light_cfg


def run_scene(sc, n, k=None):
    cfg = light_cfg(sc.cfg, k) if k else sc.cfg
    tick = build_tick_fn(sc.spec, cfg, donate=False)
    s = sc.state
    for _ in range(n):
        s = tick(s)
    return jax.block_until_ready(s)


def run(st, n, seed=0, k=None, **kw):
    sc = create_scenario(st, seed=seed, **kw)
    return sc, run_scene(sc, n, k=k)


@pytest.mark.parametrize("st", list(ST))
def test_every_scenario_ticks_finite(st):
    sc, s = run(st, 10, k=16)
    act = np.asarray(s.bodies.active)
    assert np.isfinite(np.asarray(s.bodies.pos)[act]).all()
    assert np.isfinite(np.asarray(s.bodies.vel)[act]).all()
    assert int(s.tick) == 10


def test_keplerian_orbits_stable():
    sc, s = run(ST.KEPLERIAN_DISK, 120)
    c0 = np.asarray(sc.state.bodies.pos)[0]
    c1 = np.asarray(s.bodies.pos)[0]
    p0 = np.asarray(sc.state.bodies.pos)[1:1000]
    p1 = np.asarray(s.bodies.pos)[1:1000]
    r0 = np.linalg.norm(p0 - c0, axis=1)
    r1 = np.linalg.norm(p1 - c1, axis=1)
    assert np.median(np.abs(r1 - r0) / r0) < 0.05


def test_polygons_settle_and_sleep():
    sc, s = run(ST.RANDOM_POLYGONS, 600)
    b = s.bodies
    dyn = np.asarray(b.active) & ~np.asarray(b.boundary)
    v = np.linalg.norm(np.asarray(b.vel)[dyn], axis=1)
    assert v.max() < 0.5
    assert np.asarray(b.asleep)[dyn].mean() > 0.8
    y = np.asarray(b.pos)[dyn][:, 1]
    assert y.mean() > 4.5          # piled near the floor (y-down, floor at 6)


def test_dam_break_pools_at_bottom():
    # 500-particle dam break (same local SPH regime as the 20k bench scene,
    # universe auto-scales): the column collapses and pools on the floor.
    sc = build_dam_break(500, seed=0)
    s = run_scene(sc, 180)
    size = sc.cfg.shared.universe_size_m
    liq = sc.spec.liquid_slice
    p = np.asarray(s.bodies.pos)[liq]
    assert np.isfinite(p).all()
    assert p[:, 1].mean() > 0.6 * size       # pooled low (y-down)
    assert (p[:, 0] > -0.05).all() and (p[:, 0] < size + 0.05).all()
    rho = np.asarray(s.bodies.density)[liq]
    assert rho.mean() > 0.5 * sc.cfg.fluid.rest_density


def test_galton_balls_reach_bins():
    sc, s = run(ST.GALTON_BOARD, 600)
    b = s.bodies
    dyn = np.asarray(b.active) & ~np.asarray(b.boundary)
    y = np.asarray(b.pos)[dyn][:, 1]
    assert y.mean() > 2.0          # below last peg row
    x = np.asarray(b.pos)[dyn][:, 0]
    assert x.std() > 0.05          # spread across bins
    assert (np.abs(x - 1.5) < 1.0).all()   # inside the board


def test_coupling_pentagons_float_or_sink_without_explosion():
    from lpe_tpu.scenarios.fluid_and_polygons import FluidAndPolygonsConfig
    sc, s = run(ST.FLUID_AND_POLYGONS, 90, k=16,
                ec=FluidAndPolygonsConfig(fluid_particle_count=300))
    b = s.bodies
    dyn = np.asarray(b.active) & ~np.asarray(b.boundary) & \
        (np.asarray(b.phase) == 0)
    v = np.asarray(b.vel)[dyn]
    assert np.isfinite(v).all()
    assert np.abs(v).max() < 20.0


def test_planetary_ocean_ring_survives():
    from lpe_tpu.scenarios.planetary_ocean import PlanetaryOceanConfig
    sc, s = run(ST.PLANETARY_OCEAN, 60, k=24,
                ec=PlanetaryOceanConfig(ocean_particle_count=300))
    b = s.bodies
    moon = np.asarray(b.pos)[1]
    liq = sc.spec.liquid_slice
    r = np.linalg.norm(np.asarray(b.pos)[liq] - moon, axis=1)
    # ocean stays bound in a shell around the moon (no blow-up, no collapse)
    assert (r < 2.5e5).mean() > 0.95
    assert np.median(r) > 4e4


def test_tick_is_deterministic():
    sc = build_dam_break(200, seed=3)
    tick = build_tick_fn(sc.spec, sc.cfg, donate=False)
    a = sc.state
    bstate = sc.state
    for _ in range(5):
        a = tick(a)
        bstate = tick(bstate)
    assert (np.asarray(a.bodies.pos) == np.asarray(bstate.bodies.pos)).all()


def test_hourglass_fluid_drains_through_neck():
    """Left hourglass: the fluid packed in the top chamber drains through
    the neck under gravity (reference content: src/scenarios/hourglasses.cpp
    fluid chamber fill; neck at the universe midline y = size/2)."""
    sc, s = run(ST.HOURGLASSES, 160, k=16)
    size = sc.cfg.shared.universe_size_m
    liq = sc.spec.liquid_slice
    y0 = np.asarray(sc.state.bodies.pos)[liq][:, 1]
    y1 = np.asarray(s.bodies.pos)[liq][:, 1]
    assert (y1 > size * 0.5).mean() > 0.6   # most fluid passed the neck
    assert y1.mean() > y0.mean() + 0.5      # column clearly descended

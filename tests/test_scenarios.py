"""Scenario builder parity tests: entity counts, phases, masses, determinism
(reference scenario configs cited in each scenario module)."""
import numpy as np
import pytest

from lpe_tpu.core.constants import Phase, SimulationType as ST
from lpe_tpu.scenarios import create_scenario, list_scenarios


def counts(sc):
    return sc.spec.n_solid, sc.spec.n_gas, sc.spec.n_liquid


def test_catalog_complete():
    names = [n for _, n in list_scenarios()]
    assert names == ["KEPLERIAN_DISK", "RANDOM_POLYGONS", "SIMPLE_FLUID",
                     "FLUID_AND_POLYGONS", "HOURGLASSES", "PLANETARY_OCEAN",
                     "GALTON_BOARD"]


def test_keplerian_disk_content():
    sc = create_scenario(ST.KEPLERIAN_DISK, seed=0)
    assert counts(sc) == (0, 1000, 0)
    m = np.asarray(sc.state.bodies.mass)
    assert m.max() == pytest.approx(1e36)
    # Kepler speed: median tangential speed close to sqrt(GM/r)
    p = np.asarray(sc.state.bodies.pos)[1:1000]
    v = np.asarray(sc.state.bodies.vel)[1:1000]
    c = np.asarray(sc.state.bodies.pos)[0]
    r = np.linalg.norm(p - c, axis=1)
    kepler = np.sqrt(6.674e-11 * 1e36 / r)
    speed = np.linalg.norm(v, axis=1)
    assert np.median(np.abs(speed - kepler) / kepler) < 0.05
    # density power law: more particles near the inner radius
    r_pix = r / sc.cfg.shared.meters_per_pixel
    assert (r_pix < 140).sum() > (r_pix > 200).sum()


def test_random_polygons_content():
    sc = create_scenario(ST.RANDOM_POLYGONS, seed=0)
    ns, ng, nl = counts(sc)
    assert (ns, ng, nl) == (104, 0, 0)          # 4 walls + 100 bodies
    b = sc.state.bodies
    bnd = np.asarray(b.boundary)
    assert bnd.sum() == 4
    assert (np.asarray(b.mass)[np.asarray(b.active) & bnd] == 1e30).all()
    dyn = np.asarray(b.active) & ~bnd
    nv = np.asarray(b.nverts)[dyn]
    assert (nv >= 3).all() and (nv <= 8).all()  # regular 3-8, random 3-7
    assert (np.asarray(b.inertia)[dyn] > 0).all()


def test_simple_fluid_content():
    sc = create_scenario(ST.SIMPLE_FLUID, seed=0)
    assert counts(sc) == (4, 0, 1000)
    liq = sc.spec.liquid_slice
    m = np.asarray(sc.state.bodies.mass)[liq]
    assert np.allclose(m, 0.005)
    p = np.asarray(sc.state.bodies.pos)[liq]
    assert p.min() > 6.0 * 0.29 and p.max() < 6.0 * 0.71


def test_fluid_and_polygons_content():
    sc = create_scenario(ST.FLUID_AND_POLYGONS, seed=0)
    assert counts(sc) == (7, 0, 1000)
    assert sc.cfg.fluid.stiffness == 100.0
    assert sc.cfg.fluid.viscosity == 0.005


def test_hourglasses_content():
    sc = create_scenario(ST.HOURGLASSES, seed=0)
    ns, ng, nl = counts(sc)
    assert ns >= 8 + 20               # 8 hourglass walls + hexagons
    assert 200 <= nl <= 300           # trapezoid fill caps below request
    assert sc.cfg.sleep.linear_sleep_threshold == -1.0


def test_planetary_ocean_content():
    sc = create_scenario(ST.PLANETARY_OCEAN, seed=0)
    assert counts(sc) == (2, 0, 1000)
    b = sc.state.bodies
    m = np.asarray(b.mass)
    assert m[0] == pytest.approx(7.0e24)
    assert m[1] == pytest.approx(3.5e24)
    # ocean ring sits just outside the moon surface
    moon = np.asarray(b.pos)[1]
    liq = sc.spec.liquid_slice
    r = np.linalg.norm(np.asarray(b.pos)[liq] - moon, axis=1)
    assert r.min() > 55000 and r.max() < 75000
    # fluid tuned params
    assert sc.cfg.fluid.gravity == 0.0
    assert sc.cfg.fluid.grid.smoothing_length == pytest.approx(8000.0)


def test_galton_board_content():
    sc = create_scenario(ST.GALTON_BOARD, seed=0)
    b = sc.state.bodies
    bnd = np.asarray(b.boundary) & np.asarray(b.active)
    # 3 walls + 2 funnel + 55 pegs + 12 dividers = 72 statics
    assert bnd.sum() == 72
    dyn = np.asarray(b.active) & ~bnd
    assert dyn.sum() == 55
    assert np.allclose(np.asarray(b.radius)[dyn], 0.025)


def test_bench_scenes_build_and_tick():
    """The benchmark configs from BASELINE.md all build and tick finite."""
    import jax
    from lpe_tpu.scenarios.bench_scenes import (build_coupled_dam,
                                                build_dam_break,
                                                build_galaxy,
                                                build_highlight_reel,
                                                build_north_star,
                                                build_rigid_stacks)
    from lpe_tpu.systems import build_tick_fn
    from _util import light_cfg
    for sc in (build_dam_break(300, seed=0),
               build_rigid_stacks(60, seed=0),
               build_galaxy(500, seed=0),
               build_coupled_dam(300, 5, seed=0),
               build_highlight_reel(300, 6, 10, seed=0),
               build_north_star(300, 30, seed=0)):
        tick = build_tick_fn(sc.spec, light_cfg(sc.cfg, 16), donate=False)
        s = tick(tick(sc.state))
        act = np.asarray(s.bodies.active)
        assert np.isfinite(np.asarray(s.bodies.pos)[act]).all(), sc.spec.name


def test_determinism_and_seed_sensitivity():
    a = create_scenario(ST.RANDOM_POLYGONS, seed=7)
    b = create_scenario(ST.RANDOM_POLYGONS, seed=7)
    c = create_scenario(ST.RANDOM_POLYGONS, seed=8)
    assert (np.asarray(a.state.bodies.pos) == np.asarray(b.state.bodies.pos)).all()
    assert not (np.asarray(a.state.bodies.pos) == np.asarray(c.state.bodies.pos)).all()

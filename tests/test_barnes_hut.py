"""N-body gravity tests (reference: src/systems/barnes_hut.cpp:256-312)."""
import numpy as np

from lpe_tpu.core.config import (BarnesHutConfig, ScenarioSystemConfig,
                                 SharedSystemConfig)
from lpe_tpu.core.constants import REAL_G
from lpe_tpu.scene import SceneBuilder
from lpe_tpu.systems.barnes_hut import make_barnes_hut


def scene(entities, soft=0.0, bh=None):
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=1e10,
                                  gravitational_softener=soft),
        barnes_hut=bh or BarnesHutConfig())
    b = SceneBuilder("t")
    for e in entities:
        b.add(**e)
    return b.finalize(cfg)


def test_two_body_acceleration_analytic():
    m1, m2, d = 1e20, 2e20, 1e6
    sc = scene([dict(pos=(1e9, 1e9), mass=m1),
                dict(pos=(1e9 + d, 1e9), mass=m2)])
    step = make_barnes_hut(sc.spec, sc.cfg)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    dt = sc.cfg.shared.seconds_per_tick
    a1 = REAL_G * m2 / d ** 2
    a2 = REAL_G * m1 / d ** 2
    assert np.isclose(v[0, 0], a1 * dt, rtol=1e-4)
    assert np.isclose(v[1, 0], -a2 * dt, rtol=1e-4)
    assert abs(v[0, 1]) < 1e-12 * abs(v[0, 0]) + 1e-20


def test_softening():
    m, d, soft = 1e20, 1e6, 2e6
    sc = scene([dict(pos=(1e9, 1e9), mass=m),
                dict(pos=(1e9 + d, 1e9), mass=m)], soft=soft)
    step = make_barnes_hut(sc.spec, sc.cfg)
    s = step(sc.state)
    dt = sc.cfg.shared.seconds_per_tick
    d2 = d * d + soft * soft
    a = REAL_G * m / d2 * (d / np.sqrt(d2))
    assert np.isclose(np.asarray(s.bodies.vel)[0, 0], a * dt, rtol=1e-4)


def test_boundary_and_out_of_bounds_excluded_as_sources():
    m = 1e24
    sc = scene([dict(pos=(1e9, 1e9), mass=m),
                dict(pos=(1e9 + 1e6, 1e9), mass=m, boundary=True),
                dict(pos=(-5.0, 1e9), mass=m)])        # out of bounds
    step = make_barnes_hut(sc.spec, sc.cfg)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    # body 0's only possible sources are a boundary and an out-of-bounds body
    assert (v[0] == 0.0).all()
    assert (v[1] == 0.0).all()             # boundary receives nothing
    assert v[2, 0] != 0.0                  # out-of-bounds body still receives


def test_small_mass_sources_skipped():
    bh = BarnesHutConfig(small_mass_threshold=1e3)
    sc = scene([dict(pos=(1e9, 1e9), mass=10.0),       # below threshold
                dict(pos=(1e9 + 1e6, 1e9), mass=1e20)], bh=bh)
    step = make_barnes_hut(sc.spec, sc.cfg)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    assert not np.allclose(v[0], 0.0)      # heavy source pulls the light body
    assert np.allclose(v[1], 0.0)          # light body is not a source


def test_system_statically_disabled_when_all_masses_small():
    bh = BarnesHutConfig(small_mass_threshold=1e3)
    sc = scene([dict(pos=(1e9, 1e9), mass=10.0),
                dict(pos=(2e9, 1e9), mass=20.0)], bh=bh)
    assert make_barnes_hut(sc.spec, sc.cfg) is None

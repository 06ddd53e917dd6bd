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


def test_pm_far_field_matches_direct_sum():
    """Particle-mesh (ops/pm_gravity.py) vs the exact direct sum on a
    self-gravitating random blob: mesh smearing error stays in the same
    class as the reference's theta=0.5 approximation (~1%)."""
    import jax
    rng = np.random.default_rng(0)
    n = 400
    ents = [dict(pos=(float(x), float(y)), mass=1e20)
            for x, y in rng.uniform(2e9, 8e9, (n, 2))]
    sc = scene(ents, soft=1e6)
    # force the PM path with a tiny direct-sum cutoff
    bh_pm = BarnesHutConfig(direct_sum_max_bodies=1, pm_grid=1024)
    cfg_pm = sc.cfg.replace(barnes_hut=bh_pm)
    step_d = jax.jit(make_barnes_hut(sc.spec, sc.cfg))
    step_p = jax.jit(make_barnes_hut(sc.spec, cfg_pm))
    v0 = np.asarray(sc.state.bodies.vel)
    vd = np.asarray(step_d(sc.state).bodies.vel) - v0
    vp = np.asarray(step_p(sc.state).bodies.vel) - v0
    act = np.asarray(sc.state.bodies.active)
    mag = np.linalg.norm(vd[act], axis=1)
    err = np.linalg.norm((vd - vp)[act], axis=1) / np.maximum(mag, 1e-30)
    # far field resolves to <1% (median); the p95 tail is close *pairs*,
    # which pure PM smears by construction (P3M near-field correction is the
    # planned refinement) — same error class as the reference's theta=0.5
    assert np.median(err) < 0.02
    assert np.percentile(err, 95) < 0.15


def test_pm_heavy_body_is_exact():
    """Heavy bodies bypass the mesh: a central-mass orbit force under PM
    must match the direct sum to float precision."""
    import jax
    ents = [dict(pos=(5e9, 5e9), mass=1e33),
            dict(pos=(6e9, 5e9), mass=1e3)]
    sc = scene(ents)
    bh_pm = BarnesHutConfig(direct_sum_max_bodies=1, heavy_threshold=1e30)
    cfg_pm = sc.cfg.replace(barnes_hut=bh_pm)
    vd = np.asarray(jax.jit(make_barnes_hut(sc.spec, sc.cfg))(
        sc.state).bodies.vel)
    vp = np.asarray(jax.jit(make_barnes_hut(sc.spec, cfg_pm))(
        sc.state).bodies.vel)
    assert np.allclose(vd[1], vp[1], rtol=1e-5)

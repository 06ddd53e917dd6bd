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


def _pm_vs_direct_err(sc, bh_pm):
    import jax
    cfg_pm = sc.cfg.replace(barnes_hut=bh_pm)
    step_d = jax.jit(make_barnes_hut(sc.spec, sc.cfg))
    step_p = jax.jit(make_barnes_hut(sc.spec, cfg_pm))
    v0 = np.asarray(sc.state.bodies.vel)
    vd = np.asarray(step_d(sc.state).bodies.vel) - v0
    vp = np.asarray(step_p(sc.state).bodies.vel) - v0
    act = np.asarray(sc.state.bodies.active)
    mag = np.linalg.norm(vd[act], axis=1)
    return np.linalg.norm((vd - vp)[act], axis=1) / np.maximum(mag, 1e-30)


def _blob_scene(n=400, seed=0, cluster=False):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(2e9, 8e9, (n, 2))
    if cluster:
        # put half the bodies in tight clumps so close pairs (the plain-PM
        # failure mode) are common
        centers = pts[: n // 8]
        pts[n // 2:] = centers[rng.integers(0, len(centers), n // 2)] \
            + rng.normal(0.0, 2.5e7, (n // 2, 2))
    ents = [dict(pos=(float(x), float(y)), mass=1e20) for x, y in pts]
    return scene(ents, soft=1e6)


def test_pm_far_field_matches_direct_sum():
    """P3M (ops/pm_gravity.py, default config) vs the exact direct sum on a
    self-gravitating random blob: with the smoothstep-split mesh + exact
    short-range pair correction the error is ~float-noise class everywhere,
    an order tighter than the reference's theta=0.5 walk."""
    err = _pm_vs_direct_err(
        _blob_scene(),
        BarnesHutConfig(direct_sum_max_bodies=1, pm_grid=1024,
                        p3m_max_per_cell=16))
    assert np.median(err) < 0.005
    assert np.percentile(err, 95) < 0.015


def test_p3m_close_pairs_beat_plain_pm():
    """On a clustered blob (many sub-cutoff pairs) the P3M correction must
    collapse the close-pair error tail that plain PM smears."""
    sc = _blob_scene(cluster=True, seed=1)
    err_p3m = _pm_vs_direct_err(
        sc, BarnesHutConfig(direct_sum_max_bodies=1, pm_grid=1024))
    err_pm = _pm_vs_direct_err(
        sc, BarnesHutConfig(direct_sum_max_bodies=1, pm_grid=1024,
                            p3m_cutoff_cells=0.0))
    assert np.percentile(err_p3m, 95) < 0.03
    assert np.percentile(err_p3m, 95) < 0.5 * np.percentile(err_pm, 95)


def test_p3m_accuracy_gate_clustered():
    """CI gate for the P3M accuracy claim (README: blob p95 7% -> 0.9% vs
    plain PM): p95 relative force error vs the exact direct sum on a
    CLUSTERED blob stays under 1% with the default BarnesHutConfig."""
    sc = _blob_scene(n=600, cluster=True, seed=7)
    err = _pm_vs_direct_err(
        sc, BarnesHutConfig(direct_sum_max_bodies=1))
    assert np.percentile(err, 95) < 0.01


def test_p3m_occupancy_sizing_and_overflow_diag():
    """The PP cap must scale with expected occupancy (advisor finding: a
    1M-body galaxy overflows a fixed K=64 and silently loses short-range
    gravity in the dense core). Build-time sizing from n_bodies must (a)
    grow K / subdivide the grid so a dense clump is NOT dropped, and (b)
    expose the dropped fraction via overflow_fraction."""
    from lpe_tpu.ops.pm_gravity import make_pp_correction
    uni = 1e10
    rng = np.random.default_rng(3)
    # one tight clump of 500 in a single rc-cell (rc = 8 * uni/1024)
    rc = 8.0 * uni / 1024
    pts = np.full((500, 2), 0.5 * uni) + rng.normal(0, 0.05 * rc, (500, 2))
    pos = np.asarray(pts, np.float32)
    mass = np.ones((500,), np.float32)
    # legacy sizing: fixed K=8, no n_bodies -> heavy overflow
    pp_old = make_pp_correction(uni, 1024, 1e6, 8.0, 8)
    assert pp_old.overflow_fraction(pos) > 0.5
    # occupancy-aware sizing: tiny config cap, but n_bodies drives K up
    # (mean occupancy 10/cell over 128x128 rc-cells -> need = 30)
    pp_new = make_pp_correction(uni, 1024, 1e6, 8.0, 8,
                                n_bodies=10 * 128 * 128)
    assert pp_new.K > 8
    # the subdivision path triggers when mean need exceeds 64
    # (mean 30/cell -> need 90 > 64 -> m=2; the 1M-galaxy regime)
    pp_sub = make_pp_correction(uni, 1024, 1e6, 8.0, 64,
                                n_bodies=30 * 128 * 128)
    assert pp_sub.subdivision == 2
    # physics sanity on the subdivided grid: two bodies rc/4 apart get the
    # same corrected force as the m=1 grid computes
    import jax.numpy as jnp
    p2 = np.array([[0.5 * uni, 0.5 * uni],
                   [0.5 * uni + rc / 4, 0.5 * uni]], np.float32)
    m2 = np.ones((2,), np.float32)
    f1 = np.asarray(pp_old(jnp.asarray(p2), jnp.asarray(m2)))
    f2 = np.asarray(pp_sub(jnp.asarray(p2), jnp.asarray(m2)))
    assert np.allclose(f1, f2, rtol=1e-5)
    assert np.abs(f1).max() > 0.0


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

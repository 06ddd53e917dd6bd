"""Renderer, checkpoint, CLI, and oracle cross-check tests."""
import os

import numpy as np
import pytest

from lpe_tpu.core.constants import SimulationType as ST
from lpe_tpu.render import SCHEME_SLEEP, make_renderer
from lpe_tpu.scenarios import create_scenario


def test_renderer_shapes_and_determinism():
    sc = create_scenario(ST.SIMPLE_FLUID, seed=0)
    r = make_renderer(sc.spec, sc.cfg)
    f1 = np.asarray(r(sc.state))
    f2 = np.asarray(r(sc.state))
    assert f1.shape == (600, 600, 3) and f1.dtype == np.uint8
    assert (f1 == f2).all()
    # fluid base color appears in the tank region
    blue = (f1[:, :, 2] > 200) & (f1[:, :, 0] < 100)
    assert blue.mean() > 0.02


def test_conv_splat_matches_exact():
    """The large-N conv splat (bilinear deposit + poly6-disc convolution)
    must visually agree with the exact per-particle splat: same frame shape,
    and the thresholded fluid region differs on only a sliver of pixels."""
    sc = create_scenario(ST.SIMPLE_FLUID, seed=0)
    f_exact = np.asarray(make_renderer(sc.spec, sc.cfg,
                                       splat="exact")(sc.state))
    f_conv = np.asarray(make_renderer(sc.spec, sc.cfg,
                                      splat="conv")(sc.state))
    blue = lambda f: (f[:, :, 2] > 200) & (f[:, :, 0] < 100)
    be, bc = blue(f_exact), blue(f_conv)
    assert be.mean() > 0.02 and bc.mean() > 0.02
    # regions overlap almost everywhere (conv samples the kernel at pixel
    # centers; the difference lives only on the smoothstep boundary)
    assert (be ^ bc).mean() < 0.01


def test_windowed_raster_matches_loop():
    """The large-count windowed priority rasterizer must reproduce the
    sequential painter's loop exactly (same coverage, same winning color)."""
    from lpe_tpu.render.frame import (_shape_masks_loop,
                                      _shape_masks_windowed)
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    sc = build_rigid_stacks(64, seed=3)
    spec, st = sc.spec, sc.state
    mpp = sc.cfg.shared.meters_per_pixel
    WR = int(spec.solid_cell_size / (2.0 * mpp)) + 2
    cl, al = _shape_masks_loop(st, spec.solid_start, spec.n_solid,
                               600, 600, mpp)
    cw, aw = _shape_masks_windowed(st, spec, spec.solid_start, spec.n_solid,
                                   600, 600, mpp, WR)
    assert (np.asarray(al) > 0).any()
    np.testing.assert_array_equal(np.asarray(al) > 0, np.asarray(aw) > 0)
    np.testing.assert_array_equal(
        np.asarray(cl)[np.asarray(al) > 0], np.asarray(cw)[np.asarray(aw) > 0])


def test_sleep_color_scheme():
    sc = create_scenario(ST.RANDOM_POLYGONS, seed=0)
    r = make_renderer(sc.spec, sc.cfg, color_scheme=SCHEME_SLEEP)
    f = np.asarray(r(sc.state))
    # awake bodies green (50,200,50); asleep walls red (200,50,50)
    green = (f[:, :, 1] == 200) & (f[:, :, 0] == 50)
    red = (f[:, :, 0] == 200) & (f[:, :, 1] == 50)
    assert green.any() and red.any()


def test_temperature_color_scheme():
    from lpe_tpu.core.config import ScenarioSystemConfig
    from lpe_tpu.core.constants import Phase, ShapeKind
    from lpe_tpu.render import SCHEME_TEMPERATURE
    from lpe_tpu.scene import SceneBuilder
    b = SceneBuilder("temp")
    b.add(pos=(1.0, 1.0), radius=0.3, temperature=100.0,
          shape_kind=int(ShapeKind.CIRCLE))
    b.add(pos=(3.0, 3.0), radius=0.3, temperature=0.0,
          shape_kind=int(ShapeKind.CIRCLE))
    b.add(pos=(5.0, 5.0), radius=0.3,
          shape_kind=int(ShapeKind.CIRCLE))       # no Temperature component
    sc = b.finalize(ScenarioSystemConfig())
    r = make_renderer(sc.spec, sc.cfg, color_scheme=SCHEME_TEMPERATURE)
    f = np.asarray(r(sc.state))
    # hot -> red, cold -> blue, absent -> gray (presentation_manager.cpp:41-48)
    red = (f[:, :, 0] == 255) & (f[:, :, 2] == 0)
    blue = (f[:, :, 2] == 255) & (f[:, :, 0] == 0)
    gray = (f == 128).all(-1)
    assert red.any() and blue.any() and gray.any()


def test_debug_overlays():
    from lpe_tpu.core.config import ScenarioSystemConfig
    from lpe_tpu.core.constants import ShapeKind
    from lpe_tpu.scene import SceneBuilder
    b = SceneBuilder("dbg")
    b.add(pos=(3.0, 3.0), vel=(1.0, 0.0), omega=2.0, radius=0.05,
          inertia=0.1, shape_kind=int(ShapeKind.CIRCLE))
    sc = b.finalize(ScenarioSystemConfig())
    plain = np.asarray(make_renderer(sc.spec, sc.cfg)(sc.state))
    dbg = np.asarray(make_renderer(sc.spec, sc.cfg, debug=True)(sc.state))
    cyan = (dbg[:, :, 1] == 255) & (dbg[:, :, 2] == 255) & (dbg[:, :, 0] == 0)
    magenta = (dbg[:, :, 0] == 255) & (dbg[:, :, 2] == 255) & \
        (dbg[:, :, 1] == 0)
    assert cyan.any()          # velocity vector (solid_renderer.cpp:206-228)
    assert magenta.any()       # angular arc (solid_renderer.cpp:230-275)
    assert not ((plain[:, :, 1] == 255) & (plain[:, :, 2] == 255)
                & (plain[:, :, 0] == 0)).any()


def test_contact_debug_overlay():
    """Live contact points/normals/impulses render in debug mode
    (solid_renderer.cpp:151-204 — dead in the reference, live here:
    VERDICT r4 #8). A box resting on a wall has persistent warm-cache
    contact rows after a few ticks; the overlay draws them yellow."""
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    from lpe_tpu.systems import build_run_fn
    sc = build_rigid_stacks(24, seed=1)
    st = build_run_fn(sc.spec, sc.cfg, ticks=150, donate=False)(sc.state)
    pt_rows = int((np.asarray(st.warm_pt)[..., 0] < 1e29).sum())
    assert pt_rows > 0, "scene produced no warm contact points to draw"
    dbg = np.asarray(make_renderer(sc.spec, sc.cfg, debug=True)(st))
    plain = np.asarray(make_renderer(sc.spec, sc.cfg)(st))
    yellow = lambda f: ((f[:, :, 0] == 255) & (f[:, :, 1] == 255)
                        & (f[:, :, 2] == 0))
    assert yellow(dbg).any()           # contact points
    assert not yellow(plain).any()


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from lpe_tpu.io.checkpoint import load_state, save_state
    from lpe_tpu.systems import build_tick_fn
    sc = create_scenario(ST.RANDOM_POLYGONS, seed=0)
    tick = build_tick_fn(sc.spec, sc.cfg, donate=False)
    s = tick(sc.state)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, s)
    s2 = load_state(path)
    assert (np.asarray(s.bodies.pos) == np.asarray(s2.bodies.pos)).all()
    assert int(s2.tick) == 1
    # resumed state continues identically
    a = tick(s)
    b = tick(s2)
    assert (np.asarray(a.bodies.pos) == np.asarray(b.bodies.pos)).all()


def test_checkpoint_loads_without_new_fields(tmp_path):
    """Checkpoints written before new SimState fields existed (e.g. the
    warm_pt/warm_n caches) must still load, with the missing fields falling
    back to their make_state initializers (advisor finding: exact-name
    loading raised KeyError on pre-cache checkpoints)."""
    from lpe_tpu.io.checkpoint import load_state, save_state
    sc = create_scenario(ST.RANDOM_POLYGONS, seed=0)
    path = str(tmp_path / "old.npz")
    save_state(path, sc.state)
    z = dict(np.load(path))
    for k in ("warm_pt", "warm_n"):
        del z[k]
    np.savez_compressed(path, **z)
    s2 = load_state(path)
    assert (np.asarray(s2.bodies.pos)
            == np.asarray(sc.state.bodies.pos)).all()
    # defaults: positions sentinel 1e30, normals zero, shapes match cache
    assert np.asarray(s2.warm_pt).max() >= 1e29
    assert (np.asarray(s2.warm_n) == 0).all()
    assert s2.warm_pt.shape[:2] == s2.warm_normal.shape


def test_cli_run_png_and_checkpoint(tmp_path):
    from lpe_tpu.app.cli import main
    png = str(tmp_path / "f.png")
    ck = str(tmp_path / "s.npz")
    rc = main(["run", "--scenario", "RANDOM_POLYGONS", "--ticks", "3",
               "--png", png, "--checkpoint", ck])
    assert rc == 0
    assert os.path.getsize(png) > 1000
    assert os.path.exists(ck)


def test_cli_list():
    from lpe_tpu.app.cli import main
    assert main(["list"]) == 0


def _drop_scene(n_side=18, spacing=0.035, mass=3.5e-4, vswirl=0.2, seed=0):
    """A wall-free blob of fluid in mid-air with a gentle swirl: exercises
    density/EOS/pressure/viscosity/integration without wall coupling (which
    the pure-SPH oracle deliberately does not model)."""
    from lpe_tpu.core.config import ScenarioSystemConfig, SharedSystemConfig
    from lpe_tpu.core.constants import Phase
    from lpe_tpu.scene import SceneBuilder
    rng = np.random.default_rng(seed)
    cfg = ScenarioSystemConfig(shared=SharedSystemConfig(universe_size_m=6.0))
    b = SceneBuilder("drop")
    c = 3.0
    for i in range(n_side):
        for j in range(n_side):
            x = c + (i - n_side / 2) * spacing + rng.uniform(-.1, .1) * spacing
            y = c + (j - n_side / 2) * spacing + rng.uniform(-.1, .1) * spacing
            b.add(pos=(x, y), mass=mass, phase=int(Phase.LIQUID),
                  vel=(-vswirl * (y - c), vswirl * (x - c)), radius=0.01)
    return b.finalize(cfg)


def test_fluid_matches_numpy_oracle():
    """XLA fluid tick vs the independent float64 oracle (same scene, same
    tick structure: SPH substeps + boundary + uniform gravity)."""
    from lpe_tpu.oracle.sph_numpy import SphOracle
    from lpe_tpu.systems import build_tick_fn
    sc = _drop_scene()
    tick = build_tick_fn(sc.spec, sc.cfg, donate=False)
    liq = sc.spec.liquid_slice
    pos = np.asarray(sc.state.bodies.pos)[liq].astype(np.float64)
    vel = np.asarray(sc.state.bodies.vel)[liq].astype(np.float64)
    mass = np.asarray(sc.state.bodies.mass)[liq].astype(np.float64)
    fc = sc.cfg.fluid
    o = SphOracle(h=fc.grid.smoothing_length, rest_density=fc.rest_density,
                  stiffness=fc.stiffness, viscosity=fc.viscosity,
                  gravity=sc.cfg.gravity.gravitational_acceleration,
                  universe=sc.cfg.shared.universe_size_m,
                  margin=sc.cfg.boundary.margin_pixels
                  * sc.cfg.shared.meters_per_pixel)
    s = sc.state
    for _ in range(3):
        s = tick(s)
        pos, vel, rho, _ = o.tick(pos, vel, mass)
    pj = np.asarray(s.bodies.pos)[liq]
    assert np.abs(pj - pos).max() < 5e-4
    rj = np.asarray(s.bodies.density)[liq]
    assert np.abs(rj - rho).max() / rho.max() < 1e-3


def test_native_engine_matches_numpy_oracle():
    """The C++ reference engine (native/sph_ref.cpp) against the NumPy oracle
    on the same scene — two independent implementations of the same math."""
    pytest.importorskip("ctypes")
    from lpe_tpu.oracle.sph_numpy import SphOracle
    try:
        from lpe_tpu.oracle.native import NativeSphOracle, NativeUnavailable
        nat = NativeSphOracle()
    except Exception:
        pytest.skip("native engine unavailable (no compiler)")
    sc = _drop_scene()
    liq = sc.spec.liquid_slice
    pos = np.asarray(sc.state.bodies.pos)[liq].astype(np.float64)
    vel = np.asarray(sc.state.bodies.vel)[liq].astype(np.float64)
    mass = np.asarray(sc.state.bodies.mass)[liq].astype(np.float64)
    ref = SphOracle()
    p2, v2 = pos.copy(), vel.copy()
    for _ in range(3):
        p2, v2, r2, _ = ref.tick(p2, v2, mass)
    p1, v1, r1, _ = nat.run(pos, vel, mass, 3)
    # both are float64 but sum pairs in different orders; divergence is
    # rounding noise amplified by 30 substeps of dynamics
    assert np.abs(p1 - p2).max() < 1e-5
    assert np.abs(r1 - r2).max() < 1e-5


def test_event_dispatch_parity():
    """Key->action dispatch (reference: event_manager.cpp:52-125)."""
    from lpe_tpu.app.sim_manager import SimManager
    from lpe_tpu.app.viewer import dispatch_key
    from lpe_tpu.render.frame import SCHEME_SLEEP
    m = SimManager(ST.RANDOM_POLYGONS, seed=0)
    assert dispatch_key(m, "p") == "paused" and m.paused
    assert dispatch_key(m, "p") == "resumed" and not m.paused
    assert dispatch_key(m, "x") == "speed=0.5x"
    assert float(m.state.time_scale) == 0.5
    assert dispatch_key(m, "l") == "scheme=l"
    assert m.color_scheme == SCHEME_SLEEP
    assert dispatch_key(m, "g").startswith("debug=")
    assert dispatch_key(m, "1").startswith("scenario=KEPLERIAN")
    m.tick(1)
    assert dispatch_key(m, "r") == "reset"
    assert int(m.state.tick) == 0
    assert dispatch_key(m, "q") == ""      # unbound key: no-op


def test_sim_manager_api_surface():
    from lpe_tpu.app.sim_manager import SimManager
    m = SimManager(ST.RANDOM_POLYGONS, seed=0)
    m.tick(2)
    assert int(m.state.tick) == 2
    m.set_time_scale(0.5)
    assert float(m.state.time_scale) == 0.5
    m.reset_simulator()
    assert int(m.state.tick) == 0
    assert float(m.state.time_scale) == 0.5   # preserved across reset
    m.toggle_pause()
    assert m.paused
    m.step_once()
    stats = m.run(10)      # paused: runs exactly the single stepped tick
    assert stats.ticks >= 1

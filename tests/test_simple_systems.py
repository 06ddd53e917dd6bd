"""Behavior tests for the trivially-vectorizable systems, pinned to the
reference semantics (src/systems/{movement,gravity,boundary,rotation,sleep}.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lpe_tpu.core.config import ScenarioSystemConfig, SharedSystemConfig, SleepConfig
from lpe_tpu.core.constants import PI, Phase
from lpe_tpu.scene import SceneBuilder
from lpe_tpu.systems import simple


def tiny_scene(entities, cfg=None, **cfg_kw):
    cfg = cfg or ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=6.0), **cfg_kw)
    b = SceneBuilder("t")
    for e in entities:
        b.add(**e)
    return b.finalize(cfg)


def test_movement_integrates_and_skips_liquid_boundary():
    sc = tiny_scene([
        dict(pos=(1.0, 1.0), vel=(0.5, -0.25)),
        dict(pos=(2.0, 2.0), vel=(1.0, 1.0), phase=int(Phase.LIQUID)),
        dict(pos=(3.0, 3.0), vel=(1.0, 1.0), boundary=True),
    ])
    step = simple.make_movement(sc.spec, sc.cfg)
    s = step(sc.state)
    dt = sc.cfg.shared.seconds_per_tick * sc.cfg.shared.time_acceleration
    # NB: finalize() groups entities by phase (solids first, liquids last),
    # so the liquid lands at index 2 and the boundary solid at index 1.
    p = np.asarray(s.bodies.pos)
    assert np.allclose(p[0], [1.0 + 0.5 * dt, 1.0 - 0.25 * dt])
    assert np.allclose(p[1], [3.0, 3.0])   # boundary never moves
    assert np.allclose(p[2], [2.0, 2.0])   # liquid integrates in fluid system


def test_gravity_uses_timescale_and_auto_disables():
    sc = tiny_scene([dict(pos=(1, 1), mass=1.0)])
    step = simple.make_gravity(sc.spec, sc.cfg)
    st = sc.state.replace(time_scale=jnp.asarray(0.5, jnp.float32))
    s = step(st)
    dt = sc.cfg.shared.seconds_per_tick * 1.0 * 0.5
    assert np.isclose(np.asarray(s.bodies.vel)[0, 1],
                      9.8 * dt, rtol=1e-5)
    # planetary mass present (non-boundary) -> disabled at build time
    sc2 = tiny_scene([dict(pos=(1, 1), mass=1e12)])
    assert simple.make_gravity(sc2.spec, sc2.cfg) is None
    # planetary mass on a *boundary* does not disable (view excludes Boundary)
    sc3 = tiny_scene([dict(pos=(1, 1), mass=1e30, boundary=True),
                      dict(pos=(2, 2), mass=1.0)])
    assert simple.make_gravity(sc3.spec, sc3.cfg) is not None


def test_boundary_bounce_damping_and_speed_cap():
    sc = tiny_scene([
        dict(pos=(0.01, 3.0), vel=(-3.0, 0.0)),             # left overrun
        dict(pos=(3.0, 6.2), vel=(0.0, 5.0)),               # bottom overrun
        dict(pos=(0.01, 3.0), vel=(-3.0, 0.0), has_sleep=True, asleep=True),
    ])
    step = simple.make_boundary(sc.spec, sc.cfg)
    s = step(sc.state)
    p = np.asarray(s.bodies.pos)
    v = np.asarray(s.bodies.vel)
    margin = 15.0 * sc.cfg.shared.meters_per_pixel
    assert np.isclose(p[0, 0], margin)
    # |v| = 3*0.7 = 2.1 > maxSpeed 1.0 -> normalized to 1.0
    assert np.isclose(np.linalg.norm(v[0]), 1.0, rtol=1e-5)
    assert v[0, 0] > 0
    assert np.isclose(p[1, 1], 6.0 - margin)
    assert v[1, 1] < 0
    # asleep entity untouched
    assert np.allclose(p[2], [0.01, 3.0])


def test_rotation_damping_clamp_wrap():
    sc = tiny_scene([dict(pos=(1, 1), omega=30.0, angle=2 * PI - 0.01,
                          inertia=1.0)])
    step = simple.make_rotation(sc.spec, sc.cfg)
    s = step(sc.state)
    b = s.bodies
    dt = sc.cfg.shared.seconds_per_tick
    want_angle = (2 * PI - 0.01) + 30.0 * dt
    if want_angle > 2 * PI:
        want_angle -= 2 * PI
    assert np.isclose(np.asarray(b.angle)[0], want_angle, rtol=1e-4)
    # damping then clamp: 30*0.98 = 29.4 -> clamped to 20
    assert np.isclose(np.asarray(b.omega)[0], 20.0)


def test_sleep_counter_sleep_and_wake():
    sc = tiny_scene([dict(pos=(1, 1), vel=(0.01, 0.0), has_sleep=True,
                          inertia=1.0)],
                    sleep=SleepConfig(sleep_frames_threshold=3))
    step = simple.make_sleep(sc.spec, sc.cfg)
    s = sc.state
    for _ in range(3):       # counters 1..3, none exceed the threshold yet
        s = step(s)
        assert not bool(np.asarray(s.bodies.asleep)[0])
    s = step(s)  # counter 4 > 3 -> asleep (reference: sleep.cpp:42-47)
    assert bool(np.asarray(s.bodies.asleep)[0])
    assert np.allclose(np.asarray(s.bodies.vel)[0], 0.0)
    # wake on external velocity
    s = s.replace(bodies=s.bodies.replace(
        vel=s.bodies.vel.at[0, 0].set(2.0)))
    s = step(s)
    assert not bool(np.asarray(s.bodies.asleep)[0])
    assert int(np.asarray(s.bodies.sleep_counter)[0]) == 0


def test_negative_threshold_never_sleeps():
    sc = tiny_scene([dict(pos=(1, 1), vel=(0.0, 0.0), has_sleep=True)],
                    sleep=SleepConfig(linear_sleep_threshold=-1.0,
                                      angular_sleep_threshold=-1.0))
    step = simple.make_sleep(sc.spec, sc.cfg)
    s = sc.state
    for _ in range(100):
        s = step(s)
    assert not bool(np.asarray(s.bodies.asleep)[0])


def test_dampening():
    sc = tiny_scene([dict(pos=(1, 1), vel=(1.0, 2.0), omega=1.0)])
    step = simple.make_dampening(sc.spec, sc.cfg)
    s = step(sc.state)
    assert np.allclose(np.asarray(s.bodies.vel)[0], [0.99, 1.98])
    assert np.isclose(np.asarray(s.bodies.omega)[0], 0.99)

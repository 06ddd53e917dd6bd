"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from lpe_tpu.core.constants import SimulationType as ST
from lpe_tpu.parallel.sharded import build_sharded_tick, make_mesh, shard_state
from lpe_tpu.scenarios import create_scenario
from lpe_tpu.scenarios.simple_fluid import SimpleFluidConfig
from lpe_tpu.systems import build_tick_fn


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    return jax.devices()[:8]


def test_sharded_fluid_matches_single_device(eight_devices):
    from _util import light_cfg
    scene = create_scenario(ST.SIMPLE_FLUID, seed=0,
                            ec=SimpleFluidConfig(fluid_particle_count=124))
    scene.cfg = light_cfg(scene.cfg, 16)
    mesh = make_mesh(8)
    tick1 = build_tick_fn(scene.spec, scene.cfg, donate=False)
    tickN = build_sharded_tick(scene, mesh)
    s1 = scene.state
    sN = shard_state(mesh, scene.state)
    for _ in range(3):
        s1 = tick1(s1)
        sN = tickN(sN)
    a = np.asarray(s1.bodies.pos)
    b = np.asarray(sN.bodies.pos)
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_sharded_rigid_matches_single_device(eight_devices):
    scene = create_scenario(ST.RANDOM_POLYGONS, seed=1)
    mesh = make_mesh(8)
    tick1 = build_tick_fn(scene.spec, scene.cfg, donate=False)
    tickN = build_sharded_tick(scene, mesh)
    s1 = scene.state
    sN = shard_state(mesh, scene.state)
    for _ in range(3):
        s1 = tick1(s1)
        sN = tickN(sN)
    assert np.allclose(np.asarray(s1.bodies.pos), np.asarray(sN.bodies.pos),
                       atol=1e-5)
    assert np.allclose(np.asarray(s1.bodies.vel), np.asarray(sN.bodies.vel),
                       atol=1e-4)


def test_sharded_grid_rigid_matches_single_device(eight_devices):
    """The GRID rigid pipeline (big-scene path: dense [cell, slot] state,
    rg_* tensors sharded into y-row bands by parallel/sharded.py) must
    produce the single-device trajectory on an 8-device mesh — the ±1-cell
    roll neighbor accesses cross band boundaries every solver iteration.
    The scene is FINALIZED with grid_pipeline="on" so the rg_* state is
    sized for the grid path."""
    import dataclasses
    from lpe_tpu.core import constants as C
    from lpe_tpu.core.config import (BroadphaseConfig, RigidBodyConfig,
                                     ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase, ShapeKind
    from lpe_tpu.math.polygon import (build_random_convex_polygon,
                                      calculate_polygon_inertia)
    from lpe_tpu.scene import SceneBuilder
    size = 3.0
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(
            universe_size_m=size, meters_per_pixel=size / C.SCREEN_LENGTH,
            seconds_per_tick=1.0 / C.STEPS_PER_SECOND, time_acceleration=1.0,
            grid_size=50, cell_size_pixels=C.SCREEN_LENGTH / 50),
        rigid=RigidBodyConfig(
            broadphase=BroadphaseConfig(max_pairs=4096,
                                        persist_slack_m=0.04),
            grid_pipeline="on"))
    rng = np.random.default_rng(2)
    b = SceneBuilder("SHARD_GRID")
    for wall in ((0.0, size / 2, 0.05, size / 2),
                 (size, size / 2, 0.05, size / 2),
                 (size / 2, 0.0, size / 2, 0.05),
                 (size / 2, size, size / 2, 0.05)):
        b.add_wall(*wall)
    for _ in range(96):
        sz = rng.uniform(0.05, 0.12)
        verts = build_random_convex_polygon(rng, sz)
        mass = max(0.1, rng.normal(1.0, 0.1))
        b.add(pos=(rng.uniform(size * 0.1, size * 0.9),
                   rng.uniform(size * 0.1, size * 0.9)),
              vel=(rng.uniform(-1, 1), rng.uniform(-1, 1)),
              mass=mass, phase=int(Phase.SOLID),
              shape_kind=int(ShapeKind.POLYGON), radius=sz, verts=verts,
              inertia=calculate_polygon_inertia(verts, mass),
              omega=rng.uniform(-1, 1))
    scene = b.finalize(cfg)
    assert scene.state.rg_ka.shape[0] % 8 == 0   # bands divide evenly
    mesh = make_mesh(8)
    tick1 = build_tick_fn(scene.spec, scene.cfg, donate=False)
    tickN = build_sharded_tick(scene, mesh)
    s1 = scene.state
    sN = shard_state(mesh, scene.state)
    for _ in range(3):
        s1 = tick1(s1)
        sN = tickN(sN)
    assert np.allclose(np.asarray(s1.bodies.pos), np.asarray(sN.bodies.pos),
                       atol=1e-5)
    assert np.allclose(np.asarray(s1.bodies.omega),
                       np.asarray(sN.bodies.omega), atol=1e-4)


def test_dryrun_multichip(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)

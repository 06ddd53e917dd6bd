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


def test_dryrun_multichip(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)

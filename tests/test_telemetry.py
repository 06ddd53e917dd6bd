"""Capacity-saturation telemetry (core/telemetry.py).

Every dense capacity in the rebuild drops overflow deterministically; the
reference's equivalents drop silently by atomic race
(src/systems/fluid/fluid_kernels.metal:60,237-240) or at best warn
(src/systems/rigid/gjk.cpp:98-103). VERDICT r3 task 8: every such cap must
be *observable* — for each one there is a test here that (a) reports ~zero
saturation at the auto-sized default and (b) DETECTS drops when the
capacity is forced below the scene's real demand.

(The fluid<->rigid coupling cap's detection pair lives next to its physics
parity test: tests/test_sph.py::test_coupling_slot_saturation_is_detected.)
"""
import dataclasses

import numpy as np
import pytest

from lpe_tpu.core import constants as C
from lpe_tpu.core.config import (BroadphaseConfig, ContactSolverConfig,
                                 RigidBodyConfig, ScenarioSystemConfig,
                                 SharedSystemConfig)
from lpe_tpu.core.constants import Phase, ShapeKind
from lpe_tpu.core.telemetry import assert_no_saturation, capacity_report
from lpe_tpu.math.polygon import (build_regular_polygon,
                                  calculate_polygon_inertia)
from lpe_tpu.scene import SceneBuilder


def _rigid_cfg(size=3.0, grid="on", **rigid_kw):
    shared = SharedSystemConfig(
        universe_size_m=size, meters_per_pixel=size / C.SCREEN_LENGTH,
        seconds_per_tick=1.0 / C.STEPS_PER_SECOND, time_acceleration=1.0,
        grid_size=50, cell_size_pixels=C.SCREEN_LENGTH / 50)
    rigid = RigidBodyConfig(
        broadphase=BroadphaseConfig(max_pairs=4096, persist_slack_m=0.04),
        solver=ContactSolverConfig(), grid_pipeline=grid, **rigid_kw)
    return ScenarioSystemConfig(shared=shared, rigid=rigid)


def _cluster_scene(n=60, seed=3, size=3.0, spread=0.18, grid="on",
                   **rigid_kw):
    """n small boxes packed into a ``spread``-sized cluster: per-cell
    occupancy and pair counts far beyond what a uniform scene would see."""
    cfg = _rigid_cfg(size=size, grid=grid, **rigid_kw)
    rng = np.random.default_rng(seed)
    b = SceneBuilder("TELEM")
    b.add_wall(size * 0.5, 0.0, size * 0.5, 0.05)
    r = 0.02
    verts = build_regular_polygon(4, r)
    for _ in range(n):
        m = 0.5
        b.add(pos=(size * 0.5 + rng.uniform(-spread, spread),
                   size * 0.5 + rng.uniform(-spread, spread)),
              mass=m, phase=int(Phase.SOLID),
              shape_kind=int(ShapeKind.POLYGON), radius=r, verts=verts,
              inertia=calculate_polygon_inertia(verts, m))
    return b.finalize(cfg)


def _fluid_scene(n=80, seed=1):
    from lpe_tpu.core.config import FluidConfig
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=2.0),
        fluid=FluidConfig())
    rng = np.random.default_rng(seed)
    b = SceneBuilder("TELEM_FLUID")
    for _ in range(n):
        b.add(pos=(float(rng.uniform(0.9, 1.1)),
                   float(rng.uniform(0.9, 1.1))),
              mass=0.005, phase=int(Phase.LIQUID), radius=0.02)
    return b.finalize(cfg)


def test_fluid_cell_slots_saturation_detected():
    sc = _fluid_scene()
    rep = capacity_report(sc.state, sc.spec, sc.cfg)
    sec = rep["fluid_cell_slots"]
    assert sec["cap"] >= sec["max"] and sec["dropped"] == 0
    grid = dataclasses.replace(sc.cfg.fluid.grid, max_per_cell=2)
    tiny = sc.cfg.replace(fluid=dataclasses.replace(sc.cfg.fluid,
                                                    grid=grid))
    sec2 = capacity_report(sc.state, sc.spec, tiny)["fluid_cell_slots"]
    assert sec2["dropped"] > 0 and sec2["frac"] > 0
    with pytest.raises(AssertionError):
        assert_no_saturation(capacity_report(sc.state, sc.spec, tiny))


def test_rigid_grid_slot_saturation_detected():
    sc = _cluster_scene()
    rep = capacity_report(sc.state, sc.spec, sc.cfg)
    assert rep["rigid_grid_slots"]["dropped"] == 0, rep
    tiny = _cluster_scene(grid_slots_per_cell=2)
    rep2 = capacity_report(tiny.state, tiny.spec, tiny.cfg)
    assert rep2["rigid_grid_slots"]["cap"] == 2
    assert rep2["rigid_grid_slots"]["dropped"] > 0
    with pytest.raises(AssertionError):
        assert_no_saturation(rep2)


def test_rigid_grid_row_saturation_detected():
    """Forcing the per-class row caps far below the cluster's real pair
    density must be detected. (The auto caps themselves are NOT asserted
    clean here: a t0-overlapping cluster with slack-widened AABBs exceeds
    any density-derived cap — surfacing that is telemetry's whole job; the
    bench scenes below are the configurations required to be clean.)"""
    sc = _cluster_scene()
    base = sum(capacity_report(sc.state, sc.spec, sc.cfg)
               ["rigid_grid_rows"]["dropped"].values())
    tiny = _cluster_scene(grid_rows_same=2, grid_rows_axis=2,
                          grid_rows_diag=2)
    rep2 = capacity_report(tiny.state, tiny.spec, tiny.cfg)
    tiny_drop = sum(rep2["rigid_grid_rows"]["dropped"].values())
    assert tiny_drop > base and tiny_drop > 0
    with pytest.raises(AssertionError):
        assert_no_saturation(rep2)


def test_broadphase_pair_saturation_detected():
    sc = _cluster_scene(grid="off")
    rep = capacity_report(sc.state, sc.spec, sc.cfg)
    sec = rep["broadphase_pairs"]
    assert sec["cap"] >= sec["max"] and sec["dropped"] == 0
    bp = dataclasses.replace(sc.cfg.rigid.broadphase, max_pairs=16)
    tiny = sc.cfg.replace(rigid=dataclasses.replace(sc.cfg.rigid,
                                                    broadphase=bp))
    sec2 = capacity_report(sc.state, sc.spec, tiny)["broadphase_pairs"]
    assert sec2["dropped"] > 0
    with pytest.raises(AssertionError):
        assert_no_saturation(capacity_report(sc.state, sc.spec, tiny))


def test_bench_scenes_report_no_saturation():
    """The bench configurations must be well-sized: the auto-sizing that
    feeds grid_dims / coupling_dims has to leave every capacity
    un-saturated on the scenes the perf claims are made on (sized-down
    builds; same geometry generators as bench.py)."""
    from lpe_tpu.scenarios.bench_scenes import (build_north_star,
                                                build_rigid_stacks)
    for sc in (build_rigid_stacks(400, seed=0),
               build_north_star(2000, 200, seed=0)):
        rep = capacity_report(sc.state, sc.spec, sc.cfg)
        assert_no_saturation(rep, tol=0.0)

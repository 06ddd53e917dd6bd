"""Contact solver behavior tests (reference: contact_solver.cpp, position_solver.cpp)."""
import dataclasses

import numpy as np

from lpe_tpu.core.config import ScenarioSystemConfig, SharedSystemConfig
from lpe_tpu.core.constants import Phase, ShapeKind
from lpe_tpu.scene import SceneBuilder
from lpe_tpu.systems.rigid import make_rigid


def scene(entities, solver_stages=None, **shared_kw):
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=6.0, **shared_kw))
    if solver_stages is not None:
        cfg = cfg.replace(rigid=dataclasses.replace(
            cfg.rigid, solver=dataclasses.replace(
                cfg.rigid.solver, stages=solver_stages)))
    b = SceneBuilder("t")
    for e in entities:
        b.add(**e)
    return b.finalize(cfg)


def rigid_step(sc):
    """Jitted rigid step — eager (op-by-op) execution is far too slow for
    multi-hundred-tick tests on the CPU backend."""
    import jax
    return jax.jit(make_rigid(sc.spec, sc.cfg))


def test_head_on_circles_stop_approaching():
    # Two equal circles moving into each other; after the velocity solve the
    # normal relative velocity must be >= 0 (non-penetrating), momentum kept.
    sc = scene([
        dict(pos=(2.9, 3.0), vel=(1.0, 0.0), mass=1.0, radius=0.2,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.02),
        dict(pos=(3.1, 3.0), vel=(-1.0, 0.0), mass=1.0, radius=0.2,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.02),
    ])
    step = rigid_step(sc)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    rel = v[1, 0] - v[0, 0]
    assert rel >= -1e-4                       # no longer approaching
    assert np.isclose(v[0, 0] + v[1, 0], 0.0, atol=1e-5)  # momentum conserved
    assert abs(v[0, 1]) < 1e-5                # symmetric, no lateral kick


def test_infinite_mass_wall_immovable():
    sc = scene([
        dict(pos=(3.0, 5.0), vel=(0.0, 0.0), mass=1e30, boundary=True,
             shape_kind=int(ShapeKind.POLYGON), radius=0.05,
             verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05], [3, -0.05]]),
             has_sleep=True, asleep=True),
        dict(pos=(3.0, 4.93), vel=(0.0, 1.0), mass=1.0, radius=0.05,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.00125),
    ])
    step = rigid_step(sc)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    p = np.asarray(s.bodies.pos)
    assert np.allclose(v[0], 0.0)             # wall untouched
    assert np.allclose(p[0], [3.0, 5.0])
    assert v[1, 1] <= 1e-5                    # ball stopped or bounced


def test_position_solver_separates_overlap():
    # Deep static overlap, no velocities: repeated ticks should reduce
    # penetration via Baumgarte push-out
    sc = scene([
        dict(pos=(3.0, 3.0), vel=(0.0, 0.0), mass=1.0, radius=0.2,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.02),
        dict(pos=(3.1, 3.0), vel=(0.0, 0.0), mass=1.0, radius=0.2,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.02),
    ])
    step = rigid_step(sc)
    s = sc.state
    d0 = 0.1
    for _ in range(60):
        s = step(s)
    p = np.asarray(s.bodies.pos)
    d = np.linalg.norm(p[1] - p[0])
    assert d > d0 + 0.05                      # clearly separating
    # symmetric: both moved equally in opposite directions
    assert np.isclose(p[0, 0] - 3.0, -(p[1, 0] - 3.1), atol=1e-4)


def test_friction_opposes_tangential_slide():
    # Circle sliding along a wall it presses into: friction must reduce
    # tangential speed
    sc = scene([
        dict(pos=(3.0, 5.0), vel=(0.0, 0.0), mass=1e30, boundary=True,
             shape_kind=int(ShapeKind.POLYGON), radius=0.05,
             verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05], [3, -0.05]]),
             has_sleep=True, asleep=True),
        dict(pos=(3.0, 4.93), vel=(2.0, 0.5), mass=1.0, radius=0.05,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.00125),
    ])
    step = rigid_step(sc)
    s = step(sc.state)
    v = np.asarray(s.bodies.vel)
    assert v[1, 0] < 2.0                      # tangential speed reduced
    assert v[1, 0] > 0.0                      # but not reversed


def test_no_contacts_is_identity():
    sc = scene([
        dict(pos=(1.0, 1.0), vel=(0.3, 0.4), mass=1.0, radius=0.1,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.005),
        dict(pos=(5.0, 5.0), vel=(-0.3, 0.4), mass=1.0, radius=0.1,
             shape_kind=int(ShapeKind.CIRCLE), inertia=0.005),
    ])
    step = rigid_step(sc)
    s = step(sc.state)
    assert np.allclose(np.asarray(s.bodies.vel)[:2],
                       [[0.3, 0.4], [-0.3, 0.4]])
    assert np.allclose(np.asarray(s.bodies.pos)[:2],
                       [[1, 1], [5, 5]])


import pytest


@pytest.mark.parametrize("stages", [1, 4])
def test_stacking_stability(stages):
    # 5-box stack on a floor under gravity-like downward velocity injection:
    # with the velocity+position solvers it must not explode or sink.
    # stages=1 is the default Jacobi sweep; stages=4 the staged (block)
    # variant stacking scenes opt into.
    ents = [dict(pos=(3.0, 5.0), vel=(0.0, 0.0), mass=1e30, boundary=True,
                 shape_kind=int(ShapeKind.POLYGON), radius=0.05,
                 verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05],
                                 [3, -0.05]]),
                 has_sleep=True, asleep=True)]
    hw = 0.1
    box = np.array([[-hw, -hw], [-hw, hw], [hw, hw], [hw, -hw]])
    for i in range(5):
        ents.append(dict(pos=(3.0, 4.95 - hw - 2 * hw * i), vel=(0.0, 0.0),
                         mass=1.0, shape_kind=int(ShapeKind.POLYGON),
                         radius=hw, verts=box,
                         inertia=(2.0 / 3.0) * 1.0 * hw * hw))
    sc = scene(ents, solver_stages=stages)
    import jax
    import jax.numpy as jnp
    step = rigid_step(sc)
    dt = sc.cfg.shared.seconds_per_tick
    g_dt = 9.8 * dt

    @jax.jit
    def gravity_and_move(s):
        # gravity + movement integration so contacts actually form (the full
        # tick runs Movement after the rigid solve, src/sim.cpp:107-114)
        b = s.bodies
        free = ~b.boundary
        vy = b.vel[:, 1] + jnp.where(free, g_dt, 0.0)
        vel = b.vel.at[:, 1].set(vy)
        pos = b.pos + jnp.where(free[:, None], vel * dt, 0.0)
        return s.replace(bodies=b.replace(vel=vel, pos=pos))

    s = sc.state
    for _ in range(240):
        s = step(gravity_and_move(s))
    p = np.asarray(s.bodies.pos)
    v = np.asarray(s.bodies.vel)
    assert np.isfinite(p).all()
    assert np.abs(v[1:6]).max() < 1.0             # calm stack
    ys = p[1:6, 1]
    assert (np.diff(ys[np.argsort(ys)]) > hw).all()    # boxes stay separated
    assert ys.max() < 4.96                        # nothing sank through floor


def test_tall_stack_penetration_default_config():
    """Default-configuration quality gate (VERDICT r4 #6): a 12-box tall
    stack under gravity must settle with bounded interpenetration and
    bounded floor sink at the SHIPPED solver defaults (stages=1 Jacobi +
    warm-start slot fallback), quantified against the native sequential-GS
    engine on the identical stack.

    Measured r5 (scripts/solver_defaults_ab.py, deterministic CPU):
      default (s1):        max_pen 0.141, floor_sink 0.128, calm 0.042
      staged s4 / s4+f1:   max_pen 0.200, sink 0.063, jitter 0.59-0.64,
                           and BOTH jam the Galton funnel (y_mean 1.4-1.5
                           vs the 2.0 gate) — so stages=1 stays default.
      native GS oracle:    max_pen 0.200, floor_sink 1.150 (the
                           reference's own 10-iteration PGS lets the
                           12-stack sink THROUGH the floor).
    Bounds below are the measured defaults + headroom, plus the direct
    better-than-native comparison."""
    hw = 0.1
    n_boxes = 12
    box = np.array([[-hw, -hw], [-hw, hw], [hw, hw], [hw, -hw]])
    ents = [dict(pos=(3.0, 5.0), vel=(0.0, 0.0), mass=1e30, boundary=True,
                 shape_kind=int(ShapeKind.POLYGON), radius=0.05,
                 verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05],
                                 [3, -0.05]]),
                 has_sleep=True, asleep=True)]
    for i in range(n_boxes):
        ents.append(dict(pos=(3.0, 4.95 - hw - 2 * hw * i), vel=(0.0, 0.0),
                         mass=1.0, shape_kind=int(ShapeKind.POLYGON),
                         radius=hw, verts=box,
                         inertia=(2.0 / 3.0) * 1.0 * hw * hw))
    sc = scene(ents)            # no overrides: the shipped defaults
    import jax
    import jax.numpy as jnp
    step = rigid_step(sc)
    dt = sc.cfg.shared.seconds_per_tick
    g_dt = 9.8 * dt

    @jax.jit
    def gravity_and_move(s):
        b = s.bodies
        free = ~b.boundary
        vy = b.vel[:, 1] + jnp.where(free, g_dt, 0.0)
        vel = b.vel.at[:, 1].set(vy)
        pos = b.pos + jnp.where(free[:, None], vel * dt, 0.0)
        return s.replace(bodies=b.replace(vel=vel, pos=pos))

    s = sc.state
    for _ in range(400):
        s = step(gravity_and_move(s))
    p = np.asarray(s.bodies.pos)
    v = np.asarray(s.bodies.vel)
    assert np.isfinite(p).all()
    ys = np.sort(p[1:1 + n_boxes, 1])
    pen = np.maximum(0.0, 2 * hw - np.diff(ys))
    sink = max(0.0, ys.max() + hw - 4.95)
    assert pen.max() < 0.16, f"max penetration {pen.max():.3f}"
    assert sink < 0.2, f"floor sink {sink:.3f}"
    assert np.abs(v[1:1 + n_boxes]).max() < 0.5, "stack not calm"
    # direct comparison vs the native sequential-GS engine (skip when no
    # toolchain): the parallel default must not be WORSE than the
    # reference's own solver on either metric
    from lpe_tpu.oracle.native import NativeRigidOracle, NativeUnavailable
    try:
        b = sc.state.bodies
        n = 1 + n_boxes
        o = NativeRigidOracle(universe=6.0, margin=0.0)
        np_, _, _, _ = o.run(
            np.asarray(b.pos, np.float64)[:n],
            np.asarray(b.vel, np.float64)[:n],
            np.asarray(b.angle, np.float64)[:n],
            np.asarray(b.omega, np.float64)[:n],
            np.asarray(b.mass, np.float64)[:n],
            np.asarray(b.inertia, np.float64)[:n],
            np.asarray(b.verts, np.float64)[:n],
            np.asarray(b.nverts, np.int32)[:n],
            np.asarray(b.radius, np.float64)[:n],
            (np.asarray(b.shape_kind)[:n] == 0).astype(np.uint8),
            np.asarray(b.boundary)[:n].astype(np.uint8), 400)
        nys = np.sort(np_[1:, 1])
        npen = np.maximum(0.0, 2 * hw - np.diff(nys))
        nsink = max(0.0, nys.max() + hw - 4.95)
        assert pen.max() <= npen.max() + 1e-6
        assert sink <= nsink + 1e-6
    except NativeUnavailable:
        pass                     # no toolchain: absolute bounds above hold


def test_warm_impulse_position_matching():
    """Impulses follow contact POINTS, not slots (contact_manager.cpp:222-234):
    a slot-order flip between ticks keeps each point's accumulated impulse;
    a rotated manifold normal (cos < 0.95) or an unmatched pair resets."""
    import jax.numpy as jnp

    from lpe_tpu.systems.rigid.solver import match_warm_impulses

    # one pair, two cached points with distinct impulses
    cpt = jnp.array([[[1.0, 0.0], [2.0, 0.0]]])
    cln = jnp.array([[10.0, 20.0]])
    clt = jnp.array([[1.0, 2.0]])
    cn = jnp.array([[0.0, 1.0]])
    ok = jnp.array([True])

    # new points arrive slot-swapped (within tolerance of the cached ones)
    pts = jnp.array([[[2.0003, 0.0], [1.0, 0.0004]]])
    nrm = jnp.array([[0.0, 1.0]])
    ln0, lt0 = match_warm_impulses(pts, nrm, cpt, cn, cln, clt, ok)
    assert np.allclose(np.asarray(ln0), [[20.0, 10.0]])
    assert np.allclose(np.asarray(lt0), [[2.0, 1.0]])

    # a point that moved beyond tolerance falls back to its slot's cache
    # (solver needs warm starts through fast settling; see the docstring)
    pts2 = jnp.array([[[1.0, 0.0], [2.1, 0.0]]])
    ln0, _ = match_warm_impulses(pts2, nrm, cpt, cn, cln, clt, ok)
    assert np.allclose(np.asarray(ln0), [[10.0, 20.0]])

    # manifold normal rotated past cos 0.95 -> full reset
    nrm_rot = jnp.array([[0.6, 0.8]])
    ln0, lt0 = match_warm_impulses(pts, nrm_rot, cpt, cn, cln, clt, ok)
    assert np.asarray(ln0).sum() == 0.0 and np.asarray(lt0).sum() == 0.0

    # pair identity mismatch -> full reset
    ln0, _ = match_warm_impulses(pts, nrm, cpt, cn, cln, clt,
                                 jnp.array([False]))
    assert np.asarray(ln0).sum() == 0.0


def test_warm_cache_points_persist_across_ticks():
    """A resting contact populates the point cache and re-matches next tick
    (the behavior the reference's per-tick ContactManager recreation
    neutered, rigid_body_collision.cpp:40)."""
    sc = scene([
        dict(pos=(3.0, 0.5), mass=1e30, radius=1.0, boundary=True,
             shape_kind=int(ShapeKind.POLYGON),
             verts=[(-1, -0.5), (-1, 0.5), (1, 0.5), (1, -0.5)],
             inertia=1e30),
        dict(pos=(3.0, 1.395), vel=(0.0, -0.1), mass=1.0, radius=0.2,
             shape_kind=int(ShapeKind.POLYGON),
             verts=[(-0.2, -0.4), (-0.2, 0.4), (0.2, 0.4), (0.2, -0.4)],
             inertia=0.05),
    ])
    step = rigid_step(sc)
    s = step(sc.state)
    s = step(s)
    pts = np.asarray(s.warm_pt)
    ln = np.asarray(s.warm_normal)
    touching = pts[..., 0] < 1e29
    assert touching.any(), "resting pair should cache contact points"
    assert np.abs(ln).max() > 0.0, "resting pair should cache impulses"


def test_broadphase_persistence_matches_rebuild():
    """Cross-tick candidate persistence (BroadphaseConfig.persist_slack_m):
    slack-expanded AABBs + displacement-guarded reuse must yield the same
    trajectory as a per-tick rebuild — the candidate set stays a superset
    of the exact overlap set, so the contact set is identical (only the
    compacted row ORDER can differ, and the Jacobi solver is
    order-independent up to reassociation)."""
    import jax

    def build(slack, stack_x=3.0):
        ents = [dict(pos=(stack_x, 5.0), mass=1e30, boundary=True,
                     shape_kind=int(ShapeKind.POLYGON), radius=0.05,
                     verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05],
                                     [3, -0.05]]),
                     has_sleep=True, asleep=True)]
        hw = 0.1
        box = np.array([[-hw, -hw], [-hw, hw], [hw, hw], [hw, -hw]])
        for i in range(4):
            ents.append(dict(pos=(stack_x + 0.01 * i,
                                  4.95 - hw - 2 * hw * i),
                             vel=(0.05, 0.0), mass=1.0,
                             shape_kind=int(ShapeKind.POLYGON), radius=hw,
                             verts=box, inertia=(2.0 / 3.0) * hw * hw))
        sc = scene(ents)
        bpc = dataclasses.replace(sc.cfg.rigid.broadphase,
                                  persist_slack_m=slack)
        sc.cfg = sc.cfg.replace(
            rigid=dataclasses.replace(sc.cfg.rigid, broadphase=bpc))
        return sc

    def run(slack, ticks=120):
        sc = build(slack)
        step = rigid_step(sc)
        dt = sc.cfg.shared.seconds_per_tick
        g_dt = 9.8 * dt
        import jax.numpy as jnp

        @jax.jit
        def gm(s):
            b = s.bodies
            free = ~b.boundary
            vy = b.vel[:, 1] + jnp.where(free, g_dt, 0.0)
            vel = b.vel.at[:, 1].set(vy)
            pos = b.pos + jnp.where(free[:, None], vel * dt, 0.0)
            return s.replace(bodies=b.replace(vel=vel, pos=pos))

        s = sc.state
        for _ in range(ticks):
            s = step(gm(s))
        return np.asarray(s.bodies.pos), np.asarray(s.bodies.vel), s

    p0, v0, _ = run(0.0)
    p1, v1, s1 = run(0.04)
    assert np.isfinite(p1).all()
    # identical contact set; only float reassociation differs
    assert np.abs(p1 - p0).max() < 5e-4, np.abs(p1 - p0).max()
    assert np.abs(v1 - v0).max() < 5e-3
    # the cache was actually used: anchors were written
    assert np.isfinite(np.asarray(s1.bp_anchor_pos)[:5]).all()
    assert (np.asarray(s1.bp_ia) >= 0).any()

"""Grid-resident rigid pipeline (systems/rigid/grid_pipeline.py) tests:
candidate-set exactness vs a numpy AABB oracle, drop/stack behavior gates,
and solver sanity at small scale with the pipeline forced on."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpe_tpu.core.config import (BroadphaseConfig, ContactSolverConfig,
                                 RigidBodyConfig, ScenarioSystemConfig,
                                 SharedSystemConfig)
from lpe_tpu.core import constants as C
from lpe_tpu.core.constants import Phase, ShapeKind
from lpe_tpu.math.polygon import (build_regular_polygon,
                                  build_random_convex_polygon,
                                  calculate_polygon_inertia)
from lpe_tpu.scene import SceneBuilder
from lpe_tpu.systems import build_tick_fn
from lpe_tpu.systems.rigid.grid_pipeline import grid_dims


def _cfg(size=3.0, **rigid_kw):
    shared = SharedSystemConfig(
        universe_size_m=size, meters_per_pixel=size / C.SCREEN_LENGTH,
        seconds_per_tick=1.0 / C.STEPS_PER_SECOND, time_acceleration=1.0,
        grid_size=50, cell_size_pixels=C.SCREEN_LENGTH / 50)
    rigid = RigidBodyConfig(
        broadphase=BroadphaseConfig(max_pairs=4096, persist_slack_m=0.04),
        solver=ContactSolverConfig(stages=4),
        grid_pipeline="on", **rigid_kw)
    return ScenarioSystemConfig(shared=shared, rigid=rigid)


def _scene(n=120, seed=0, size=3.0, **rigid_kw):
    cfg = _cfg(size=size, **rigid_kw)
    rng = np.random.default_rng(seed)
    b = SceneBuilder("GRID_TEST")
    b.add_wall(0.0, size * 0.5, 0.05, size * 0.5)
    b.add_wall(size, size * 0.5, 0.05, size * 0.5)
    b.add_wall(size * 0.5, 0.0, size * 0.5, 0.05)
    b.add_wall(size * 0.5, size, size * 0.5, 0.05)
    for _ in range(n):
        sz = rng.uniform(0.05, 0.12)
        verts = build_random_convex_polygon(rng, sz)
        mass = max(0.1, rng.normal(1.0, 0.1))
        b.add(pos=(rng.uniform(size * 0.1, size * 0.9),
                   rng.uniform(size * 0.1, size * 0.9)),
              vel=(rng.uniform(-1, 1), rng.uniform(-1, 1)),
              mass=mass, phase=int(Phase.SOLID), has_sleep=True,
              shape_kind=int(ShapeKind.POLYGON), radius=sz, verts=verts,
              inertia=calculate_polygon_inertia(verts, mass),
              omega=rng.uniform(-1, 1))
    return b.finalize(cfg)


def _world_aabbs(state, S, VS):
    b = state.bodies
    pos = np.asarray(b.pos)[:S]
    ang = np.asarray(b.angle)[:S]
    verts = np.asarray(b.verts)[:S, :VS]
    nv = np.asarray(b.nverts)[:S]
    mins = np.zeros((S, 2))
    maxs = np.zeros((S, 2))
    for i in range(S):
        c, s = np.cos(ang[i]), np.sin(ang[i])
        R = np.array([[c, -s], [s, c]])
        w = verts[i, :nv[i]] @ R.T + pos[i]
        mins[i] = w.min(0)
        maxs[i] = w.max(0)
    return mins, maxs


def test_grid_dims_and_state_sizing():
    sc = _scene(n=60)
    gd = grid_dims(sc.spec, sc.cfg)
    assert gd is not None
    assert sc.state.rg_ka.shape == (gd["NC"], gd["R"])
    assert sc.state.rg_verts.shape[0] == gd["NC"] * gd["KB"]
    # off by default for small scenes under "auto"
    cfg_auto = dataclasses.replace(
        sc.cfg, rigid=dataclasses.replace(sc.cfg.rigid,
                                          grid_pipeline="auto"))
    assert grid_dims(sc.spec, cfg_auto) is None


def test_grid_candidates_match_aabb_oracle():
    """After one tick (forcing a rebuild), the grid candidate rows must
    equal the exact slack-expanded AABB overlap pair set (the same contract
    the list broadphase implements, pipeline.py:213-250) — no drops at this
    density, and every pair exactly once."""
    sc = _scene(n=120, seed=3)
    S = sc.spec.n_solid
    VS = sc.spec.max_solid_verts
    tick = build_tick_fn(sc.spec, sc.cfg, jit=True, donate=False)
    st = tick(sc.state)

    # oracle from PRE-tick state (the rebuild ran on it)
    mins, maxs = _world_aabbs(sc.state, S, VS)
    slack = sc.cfg.rigid.broadphase.persist_slack_m
    mins -= slack * 0.5
    maxs += slack * 0.5
    bnd = np.asarray(sc.state.bodies.boundary)[:S]
    ov = ((mins[:, None, 0] <= maxs[None, :, 0])
          & (mins[None, :, 0] <= maxs[:, None, 0])
          & (mins[:, None, 1] <= maxs[None, :, 1])
          & (mins[None, :, 1] <= maxs[:, None, 1]))
    iu = np.triu(np.ones((S, S), bool), 1)
    want = ov & iu & ~(bnd[:, None] & bnd[None, :])
    want_set = set(map(tuple, np.argwhere(want)))

    # decode grid rows -> body pairs
    gd = grid_dims(sc.spec, sc.cfg)
    NC, KB, R = gd["NC"], gd["KB"], gd["R"]
    nbx = gd["nbx"]
    table = np.asarray(st.rg_table).reshape(NC, KB)
    ka = np.asarray(st.rg_ka)
    kb = np.asarray(st.rg_kb)
    val = np.asarray(st.rg_valid)
    big_ids = list(sc.spec.solid_big_idx)
    got = set()
    base = 0
    caps = gd["caps"]
    offs = [(0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    for ci, cap in enumerate(caps):
        isbig = ci == 5
        for cell in range(NC):
            cy, cx = divmod(cell, nbx)
            for r in range(base, base + cap):
                if not val[cell, r]:
                    continue
                a = table[cell, ka[cell, r]]
                if isbig:
                    bdy = big_ids[kb[cell, r]]
                else:
                    dx, dy = offs[ci]
                    ncell = (cy + dy) * nbx + (cx + dx)
                    bdy = table[ncell, kb[cell, r]]
                assert a < S and bdy < S
                got.add((min(a, bdy), max(a, bdy)))
        base += cap
    assert got == want_set, (
        f"missing={sorted(want_set - got)[:5]} "
        f"extra={sorted(got - want_set)[:5]}")


def test_grid_box_drop_and_rest():
    """A single polygon dropped on the floor ("down" is +y) comes to rest
    on it (position solver holds it; no tunnelling, no explosion)."""
    size = 3.0
    cfg = _cfg(size=size)
    b = SceneBuilder("DROP")
    b.add_wall(size * 0.5, size, size * 0.5, 0.05)
    verts = build_regular_polygon(4, 0.1)
    b.add(pos=(1.5, 2.3), mass=1.0, phase=int(Phase.SOLID),
          shape_kind=int(ShapeKind.POLYGON), radius=0.1, verts=verts,
          inertia=calculate_polygon_inertia(verts, 1.0))
    sc = b.finalize(cfg)
    tick = build_tick_fn(sc.spec, sc.cfg, jit=True, donate=False)
    st = sc.state
    for _ in range(240):
        st = tick(st)
    pos = np.asarray(st.bodies.pos)[1]
    vel = np.asarray(st.bodies.vel)[1]
    assert np.isfinite(np.asarray(st.bodies.pos)).all()
    # rests on the wall face at size-0.05, body half-extent ~0.07-0.1
    assert 2.7 < pos[1] < 2.96, f"resting height {pos[1]}"
    assert abs(vel[1]) < 0.05, f"vertical velocity {vel[1]}"


def test_grid_pile_settles_without_explosion():
    """120 random polygons rain into a box: everything stays in bounds,
    finite, and kinetic energy decays to near rest."""
    sc = _scene(n=120, seed=7)
    tick = build_tick_fn(sc.spec, sc.cfg, jit=True, donate=False)
    st = sc.state
    for _ in range(300):
        st = tick(st)
    S = sc.spec.n_solid
    pos = np.asarray(st.bodies.pos)[:S]
    vel = np.asarray(st.bodies.vel)[:S]
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert (pos > -0.3).all() and (pos < 3.3).all(), "bodies escaped"
    ke = 0.5 * (np.asarray(st.bodies.mass)[4:S]
                * (vel[4:] ** 2).sum(-1)).sum()
    assert ke < 2.0, f"pile still energetic: KE={ke}"


def test_grid_matches_list_pipeline_first_tick():
    """From an identical state, one tick of the grid pipeline and one tick
    of the list pipeline must agree closely: identical candidate supersets,
    SAT==EPA narrowphase, same solver math — only the staging partition
    differs (spatial classes vs round-robin), so velocities should match to
    solver-iteration tolerance on a sparse scene."""
    sc_g = _scene(n=40, seed=11)
    cfg_l = dataclasses.replace(
        sc_g.cfg, rigid=dataclasses.replace(sc_g.cfg.rigid,
                                            grid_pipeline="off"))
    tick_g = build_tick_fn(sc_g.spec, sc_g.cfg, jit=True, donate=False)
    tick_l = build_tick_fn(sc_g.spec, cfg_l, jit=True, donate=False)
    st_g = tick_g(sc_g.state)
    st_l = tick_l(sc_g.state)
    S = sc_g.spec.n_solid
    dv = np.abs(np.asarray(st_g.bodies.vel)[:S]
                - np.asarray(st_l.bodies.vel)[:S])
    dp = np.abs(np.asarray(st_g.bodies.pos)[:S]
                - np.asarray(st_l.bodies.pos)[:S])
    # at t=0 most bodies are free-falling: their update must be identical
    assert np.median(dv) < 1e-6
    assert dp.max() < 5e-3, f"position divergence {dp.max()}"
    assert dv.max() < 0.5, f"velocity divergence {dv.max()}"

#!/usr/bin/env python
"""A/B the DEFAULT contact-solver configuration (VERDICT r4 #6).

Round-3 finding: stages=4 cuts tall-stack penetration ~3.5x but its
better-converged FRICTION jams the Galton funnel, so staging shipped
opt-in. The untested combination is stages=4 + friction_stages=1 —
staged normal rows (stack convergence) with the validated synchronous-
Jacobi friction update (sliding behavior). This script measures, for
(stages, friction_stages) in {(1,0), (4,0), (4,1)}:

1. 12-box tall-stack penetration after 400 settling ticks (max adjacent
   overlap + floor sink), against the native sequential-GS engine on the
   identical stack (the reference-fidelity yardstick);
2. Galton-board flow after 600 ticks (mean y progress, bin spread).

Run on CPU:  python scripts/solver_defaults_ab.py
"""
from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def solver_cfg(cfg, stages, fr):
    return cfg.replace(rigid=dataclasses.replace(
        cfg.rigid, solver=dataclasses.replace(
            cfg.rigid.solver, stages=stages, friction_stages=fr)))


def build_stack(n_boxes=12, hw=0.1):
    from lpe_tpu.core.config import ScenarioSystemConfig, SharedSystemConfig
    from lpe_tpu.core.constants import ShapeKind
    from lpe_tpu.scene import SceneBuilder
    box = np.array([[-hw, -hw], [-hw, hw], [hw, hw], [hw, -hw]])
    b = SceneBuilder("tall")
    b.add(pos=(3.0, 5.0), vel=(0.0, 0.0), mass=1e30, boundary=True,
          shape_kind=int(ShapeKind.POLYGON), radius=0.05,
          verts=np.array([[-3, -0.05], [-3, 0.05], [3, 0.05], [3, -0.05]]),
          has_sleep=True, asleep=True)
    for i in range(n_boxes):
        b.add(pos=(3.0, 4.95 - hw - 2 * hw * i), vel=(0.0, 0.0), mass=1.0,
              shape_kind=int(ShapeKind.POLYGON), radius=hw, verts=box,
              inertia=(2.0 / 3.0) * 1.0 * hw * hw)
    return b.finalize(ScenarioSystemConfig(
        shared=SharedSystemConfig(universe_size_m=6.0)))


def stack_metrics(ys, hw, floor_top=4.95):
    ys = np.sort(ys)
    gaps = np.diff(ys)
    pen = np.maximum(0.0, 2 * hw - gaps)
    sink = max(0.0, ys.max() + hw - floor_top)
    return dict(max_pen=float(pen.max()), mean_pen=float(pen.mean()),
                floor_sink=float(sink))


def run_stack(stages, fr, n_boxes=12, hw=0.1, ticks=400):
    import jax
    import jax.numpy as jnp
    from lpe_tpu.systems.rigid import make_rigid
    sc = build_stack(n_boxes, hw)
    cfg = solver_cfg(sc.cfg, stages, fr)
    step = jax.jit(make_rigid(sc.spec, cfg))
    dt = cfg.shared.seconds_per_tick
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
    for _ in range(ticks):
        s = step(gravity_and_move(s))
    p = np.asarray(s.bodies.pos)
    v = np.asarray(s.bodies.vel)
    m = stack_metrics(p[1:1 + n_boxes, 1], hw)
    m["max_speed"] = float(np.abs(v[1:1 + n_boxes]).max())
    m["finite"] = bool(np.isfinite(p).all())
    return m


def run_stack_native(n_boxes=12, hw=0.1, ticks=400):
    from lpe_tpu.oracle.native import NativeRigidOracle
    sc = build_stack(n_boxes, hw)
    b = sc.state.bodies
    n = 1 + n_boxes
    o = NativeRigidOracle(universe=6.0, margin=0.0)
    pos = np.asarray(b.pos, np.float64)[:n]
    vel = np.asarray(b.vel, np.float64)[:n]
    ang = np.asarray(b.angle, np.float64)[:n]
    om = np.asarray(b.omega, np.float64)[:n]
    p, v, a, w = o.run(
        pos, vel, ang, om,
        np.asarray(b.mass, np.float64)[:n],
        np.asarray(b.inertia, np.float64)[:n],
        np.asarray(b.verts, np.float64)[:n],
        np.asarray(b.nverts, np.int32)[:n],
        np.asarray(b.radius, np.float64)[:n],
        (np.asarray(b.shape_kind)[:n] == 0).astype(np.uint8),
        np.asarray(b.boundary)[:n].astype(np.uint8), ticks)
    return stack_metrics(p[1:, 1], hw)


def run_galton(stages, fr, ticks=600):
    import jax
    from lpe_tpu.core.constants import SimulationType as ST
    from lpe_tpu.scenarios import create_scenario
    from lpe_tpu.systems import build_tick_fn
    sc = create_scenario(ST.GALTON_BOARD, seed=0)
    cfg = solver_cfg(sc.cfg, stages, fr)
    tick = build_tick_fn(sc.spec, cfg, donate=False)
    s = sc.state
    for _ in range(ticks):
        s = tick(s)
    s = jax.block_until_ready(s)
    b = s.bodies
    dyn = np.asarray(b.active) & ~np.asarray(b.boundary)
    y = np.asarray(b.pos)[dyn][:, 1]
    x = np.asarray(b.pos)[dyn][:, 0]
    return dict(y_mean=float(y.mean()), x_std=float(x.std()),
                frac_below_pegs=float((y > 2.0).mean()),
                inside=bool((np.abs(x - 1.5) < 1.0).all()))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    out = {"native_gs_stack": run_stack_native()}
    print(json.dumps({"native_gs_stack": out["native_gs_stack"]}),
          flush=True)
    for stages, fr in ((1, 0), (4, 0), (4, 1)):
        key = f"s{stages}_f{fr}"
        r = {"stack": run_stack(stages, fr)}
        print(json.dumps({key + "_stack": r["stack"]}), flush=True)
        r["galton"] = run_galton(stages, fr)
        print(json.dumps({key + "_galton": r["galton"]}), flush=True)
        out[key] = r
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Solver-quality A/B at 10k: settle the rigid-stacks scene through the grid
pipeline and the list pipeline, then measure interpenetration statistics of
sampled close pairs with the float64 SAT oracle. Guards against the grid
solver being 'fast because it barely solves'."""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def sat_depth(A, B):
    best = np.inf
    for P in (A, B):
        n = len(P)
        for i in range(n):
            e = P[(i + 1) % n] - P[i]
            ax = np.array([-e[1], e[0]], np.float64)
            ln = np.hypot(ax[0], ax[1])
            if ln < 1e-30:
                continue
            ax /= ln
            pa = A @ ax
            pb = B @ ax
            best = min(best, min(pa.max() - pb.min(), pb.max() - pa.min()))
    return float(best)


def pen_stats(state, spec, n_sample=800, seed=0):
    b = state.bodies
    S = spec.n_solid
    pos = np.asarray(b.pos, np.float64)[:S]
    ang = np.asarray(b.angle, np.float64)[:S]
    verts = np.asarray(b.verts, np.float64)[:S]
    nv = np.asarray(b.nverts)[:S]
    bnd = np.asarray(b.boundary)[:S]
    rad = np.where(nv > 0, np.linalg.norm(verts, axis=-1).max(-1), 0.1)
    dyn = np.nonzero(~bnd)[0]
    rng = np.random.default_rng(seed)
    # sample close pairs among dynamic bodies
    pens = []
    tried = 0
    while len(pens) < n_sample and tried < 40 * n_sample:
        i, j = rng.choice(dyn, 2, replace=False)
        tried += 1
        if np.linalg.norm(pos[i] - pos[j]) > rad[i] + rad[j]:
            continue

        def world(k):
            c, s = np.cos(ang[k]), np.sin(ang[k])
            R = np.array([[c, -s], [s, c]])
            return verts[k, :nv[k]] @ R.T + pos[k]

        d = sat_depth(world(i), world(j))
        if d > -1e-6:
            pens.append(max(d, 0.0))
    pens = np.asarray(pens) if pens else np.zeros(1)
    return dict(n=len(pens), mean=float(pens.mean()),
                p95=float(np.percentile(pens, 95)),
                max=float(pens.max()),
                mean_rel=float((pens / 0.17).mean()))  # ~mean body size


def main():
    import dataclasses
    import jax
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    from lpe_tpu.systems import build_run_fn

    ticks = int(os.environ.get("QT", "200"))
    out = {}
    for mode in ("on", "off"):
        sc = build_rigid_stacks(10000, seed=0)
        cfg = dataclasses.replace(
            sc.cfg, rigid=dataclasses.replace(sc.cfg.rigid,
                                              grid_pipeline=mode))
        run = build_run_fn(sc.spec, cfg, ticks=10, donate=False)
        st = sc.state
        for _ in range(ticks // 10):
            st = run(st)
        _ = np.asarray(st.bodies.pos)
        ke = float((0.5 * np.asarray(st.bodies.mass)[4:10004]
                    * (np.asarray(st.bodies.vel)[4:10004] ** 2).sum(-1))
                   .sum())
        stats = pen_stats(st, sc.spec)
        stats["ke"] = round(ke, 3)
        infl = np.asarray(st.bodies.pos)[:10004]
        stats["out_of_box"] = int(((infl < -0.3) | (infl > 6.3)).any(1).sum())
        out["grid" if mode == "on" else "list"] = stats
        print(json.dumps({("grid" if mode == "on" else "list"): stats}),
              flush=True)
    g, l = out["grid"], out["list"]
    print(json.dumps({"pen_ratio_grid_over_list":
                      round(g["mean"] / max(l["mean"], 1e-9), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

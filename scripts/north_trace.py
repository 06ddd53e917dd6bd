#!/usr/bin/env python
"""North-star stage triage (VERDICT r3 task 2): time the 100k+10k workload
with systems selectively ablated, at REPRESENTATIVE contact density (the dam
is settled into the rigid field before any timing), plus micro-timings of
the per-tick coupling table builds.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/north_trace.py
Env: NT_SETTLE (default 120 ticks), NT_TICKS (timed, default 20),
     NT_VARIANTS (comma list), NT_NF / NT_NR (scene size).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lpe_tpu.scenarios.bench_scenes import build_north_star
    from lpe_tpu.systems import build_system_list

    NF = int(os.environ.get("NT_NF", "100000"))
    NRB = int(os.environ.get("NT_NR", "10000"))
    SETTLE = int(os.environ.get("NT_SETTLE", "120"))
    TICKS = int(os.environ.get("NT_TICKS", "20"))
    BLOCK = 10
    variants = os.environ.get(
        "NT_VARIANTS",
        "full,nocouple9,norigid,nofluid,simple").split(",")

    scene_kind = os.environ.get("NT_SCENE", "north")
    if scene_kind == "coupled":
        from lpe_tpu.scenarios.bench_scenes import build_coupled_dam
        sc = build_coupled_dam(NF, NRB, seed=0)
    elif scene_kind == "dam":
        from lpe_tpu.scenarios.bench_scenes import build_dam_break
        sc = build_dam_break(NF, seed=0)
    else:
        sc = build_north_star(NF, NRB, seed=0)
    print(json.dumps({"scene": sc.spec.name, "n": int(sc.state.bodies.pos.shape[0]),
                      "device": str(jax.devices()[0])}), flush=True)
    from lpe_tpu.systems.rigid.grid_pipeline import grid_dims
    gd = grid_dims(sc.spec, sc.cfg)
    print(json.dumps({"grid_rigid_dims":
                      {k: (v if isinstance(v, (int, float)) else str(v))
                       for k, v in (gd or {}).items()}}), flush=True)

    def build_run(skip=(), ablate=""):
        """build_run_fn logic with a skip-set. sph.py reads
        LPE_SPH_ABLATE at TRACE time (first call of the jitted run), NOT
        at build time — so the env var is set here and must stay set
        until the variant's first run() call; trace_env below wraps the
        first call. (A previous version popped the env in a finally
        block before tracing ever happened, silently timing the FULL
        program for every ablate variant.)"""
        os.environ["LPE_SPH_ABLATE"] = ablate
        if True:
            systems = [(n, f) for n, f in
                       build_system_list(sc.spec, sc.cfg) if n not in skip]
            sysd = dict(systems)
            fl = sysd.get("fluid")
            cross = (fl is not None
                     and getattr(fl, "grid_build", None) is not None)

            def tick_plain(state):
                for name, fn in systems:
                    state = fn(state)
                return state.replace(tick=state.tick + 1)

            if not cross:
                def run(state):
                    return jax.lax.scan(
                        lambda s, _: (tick_plain(s), None), state,
                        None, length=BLOCK)[0]
            else:
                def tick_ct(state, D):
                    for name, fn in systems:
                        if name == "fluid":
                            state, D = fl.grid_tick(state, D)
                        else:
                            state = fn(state)
                            if name == "boundary":
                                D = fl.grid_boundary(D)
                            elif name == "gravity":
                                D = fl.grid_gravity(state, D)
                    return state.replace(tick=state.tick + 1), D

                def run(state):
                    D = fl.grid_build(state)
                    (state, D), _ = jax.lax.scan(
                        lambda c, _: (tick_ct(*c), None), (state, D),
                        None, length=BLOCK)
                    return fl.grid_readback(state, D)
            jr = jax.jit(run, donate_argnums=(0,))

            def first_call(state, _abl=ablate):
                """Trace under the variant's ablate env (lazy jit trace)."""
                os.environ["LPE_SPH_ABLATE"] = _abl
                try:
                    return jr(state)
                finally:
                    os.environ.pop("LPE_SPH_ABLATE", None)

            jr.trace_first = first_call
            return jr

    # ---- settle with the full pipeline so timing sees real contact density
    run_full = build_run()
    state = sc.state
    t0 = time.perf_counter()
    state = run_full(state)
    np.asarray(state.bodies.pos)
    print(json.dumps({"compile_plus_first_block_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)
    t0 = time.perf_counter()
    for _ in range(max(0, SETTLE // BLOCK - 1)):
        state = run_full(state)
    pos_settled = np.asarray(state.bodies.pos)
    print(json.dumps({"settle_ticks": SETTLE,
                      "settle_s": round(time.perf_counter() - t0, 1),
                      "finite": bool(np.isfinite(pos_settled).all())}),
          flush=True)
    # keep an immutable settled copy on device for every variant
    settled = jax.tree.map(jnp.copy, state)

    cfgmap = {
        "full": ((), ""),
        "nocouple9": ((), "nocouple9"),       # stacked fluid, no coupling
        "nofield": ((), "nofield"),           # ... and no candidate field
        "norigid": (("rigid",), ""),          # fluid+coupling, no rigid sys
        "nofluid": (("fluid",), ""),          # rigid system + simple only
        "simple": (("fluid", "rigid"), ""),   # glue floor
    }
    results = {}
    for v in variants:
        skip, abl = cfgmap[v]
        run = build_run(skip, abl)
        st = jax.tree.map(jnp.copy, settled)
        t0 = time.perf_counter()
        st = run.trace_first(st)
        np.asarray(st.bodies.pos)
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _rep in range(2):
            st2 = jax.tree.map(jnp.copy, settled)
            st2 = run(st2)
            np.asarray(st2.bodies.pos)   # warm
            t0 = time.perf_counter()
            for _ in range(max(1, TICKS // BLOCK)):
                st2 = run(st2)
            np.asarray(st2.bodies.pos)
            dt = (time.perf_counter() - t0) / max(1, TICKS // BLOCK) / BLOCK
            best = min(best, dt)
        results[v] = best
        print(json.dumps({"variant": v, "ms_per_tick": round(best * 1e3, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    # ---- micro: per-tick coupling table builds (cand_rows top_k etc.)
    try:
        from lpe_tpu.systems.fluid.sph import _rigid_proxies
        b = settled.bodies
        NR = sc.spec.n_solid
        R = _rigid_proxies(b, NR, sc.spec.max_rigid_verts)
        cellf = sc.cfg.fluid.grid.smoothing_length \
            * sc.cfg.fluid.grid.cell_size_factor
        size = sc.cfg.shared.universe_size_m
        ny = int(np.ceil(size / cellf)) + 4

        @jax.jit
        def cand_rows(miny, maxy, valid):
            ry0 = (jnp.arange(ny + 2) - 4).astype(jnp.float32) * cellf
            ry1 = ry0 + 3.0 * cellf
            ov = (miny[None, :] <= ry1[:, None]) & \
                 (maxy[None, :] >= ry0[:, None]) & valid[None, :]
            score = jnp.where(ov, NR - jnp.arange(NR)[None, :], 0)
            vals, idx = jax.lax.top_k(score, min(16, NR))
            return jnp.where(vals > 0, idx, NR).astype(jnp.int32)

        args = (R["miny"], R["maxy"], R["valid"])
        np.asarray(cand_rows(*args))
        t0 = time.perf_counter()
        for _ in range(20):
            out = cand_rows(*args)
        np.asarray(out)
        print(json.dumps({"micro": "cand_rows_topk16",
                          "ms": round((time.perf_counter() - t0) / 20 * 1e3,
                                      3)}), flush=True)
        # row overlap density at settled state (how many rigids per row?)
        ry0 = (np.arange(ny + 2) - 4).astype(np.float32) * cellf
        ry1 = ry0 + 3.0 * cellf
        miny = np.asarray(R["miny"]); maxy = np.asarray(R["maxy"])
        val = np.asarray(R["valid"])
        ov = (miny[None, :] <= ry1[:, None]) & (maxy[None, :] >= ry0[:, None]) & val[None, :]
        cnt = ov.sum(1)
        print(json.dumps({"micro": "rigids_per_row",
                          "max": int(cnt.max()), "mean": float(cnt.mean()),
                          "rows_over_16": int((cnt > 16).sum()),
                          "rows": int(ny + 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"micro_error": repr(e)[:300]}), flush=True)

    print(json.dumps({"results_ms": {k: round(v * 1e3, 2)
                                     for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()

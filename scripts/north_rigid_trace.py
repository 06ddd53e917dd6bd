#!/usr/bin/env python
"""Rigid-stage triage ON THE NORTH-STAR SCENE (fluid system skipped): the
grid pipeline is ~150 of the 256 ms north tick (north_trace r4b); this
script cuts it after each stage (LPE_RIGID_ABLATE) from one settled state
to locate the cost. Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/north_rigid_trace.py
Env: NT_SETTLE (full-pipeline settle ticks, default 120), NT_NF/NT_NR.
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
    from lpe_tpu.systems import build_system_list, build_run_fn

    NF = int(os.environ.get("NT_NF", "100000"))
    NRB = int(os.environ.get("NT_NR", "10000"))
    SETTLE = int(os.environ.get("NT_SETTLE", "120"))
    BLOCK = 10

    sc = build_north_star(NF, NRB, seed=0)
    print(json.dumps({"scene": sc.spec.name,
                      "device": str(jax.devices()[0])}), flush=True)

    # The dense grid pipeline's per-tick work is SHAPE-STATIC (every [NC, R]
    # row computes regardless of occupancy), so stage costs don't need the
    # fluid-ploughed state — falling bodies trip the displacement guard
    # every tick exactly like ploughing does. Settle with the rigid-only
    # program itself (no 9-minute full-program compile).
    state = sc.state
    settled = None

    def build_rigid_only(ablate):
        os.environ["LPE_RIGID_ABLATE"] = ablate
        try:
            systems = [(n, f) for n, f in
                       build_system_list(sc.spec, sc.cfg) if n != "fluid"]

            def tick(s):
                for _n, fn in systems:
                    s = fn(s)
                return s.replace(tick=s.tick + 1)

            return jax.jit(lambda s: jax.lax.scan(
                lambda c, _: (tick(c), None), s, None, length=BLOCK)[0],
                donate_argnums=(0,))
        finally:
            os.environ.pop("LPE_RIGID_ABLATE", None)

    run0 = build_rigid_only("")
    t0 = time.perf_counter()
    for _ in range(max(1, SETTLE // BLOCK)):
        state = run0(state)
    np.asarray(state.bodies.pos)
    print(json.dumps({"settled_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    settled = jax.tree.map(jnp.copy, state)

    for mode in ("broadphase", "narrow", "novel", "nopos", ""):
        run = build_rigid_only(mode)
        st = jax.tree.map(jnp.copy, settled)
        st = run(st)
        np.asarray(st.bodies.pos)          # compile + warm
        best = 1e9
        for _ in range(2):
            s2 = jax.tree.map(jnp.copy, settled)
            s2 = run(s2)
            np.asarray(s2.bodies.pos)
            t0 = time.perf_counter()
            for _ in range(2):
                s2 = run(s2)
            np.asarray(s2.bodies.pos)
            best = min(best, (time.perf_counter() - t0) / (2 * BLOCK))
        print(json.dumps({"ablate": mode or "full",
                          "ms_per_tick": round(best * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

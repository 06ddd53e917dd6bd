#!/usr/bin/env python
"""Rigid 10k stage triage: time the tick with the pipeline cut after each
stage (LPE_RIGID_ABLATE) from one settled state. Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/rigid_trace.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _time(run, state, block, blocks=2, repeats=2):
    state0 = run(state)                    # compile + warm
    _ = np.asarray(state0.bodies.pos)
    best = 0.0
    for _ in range(repeats):
        s = state
        t0 = time.perf_counter()
        for _ in range(blocks):
            s = run(s)
        _ = np.asarray(s.bodies.pos)
        best = max(best, blocks * block / (time.perf_counter() - t0))
    return best


def main():
    n = int(os.environ.get("N", "10000"))
    block = 10
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    from lpe_tpu.systems import build_run_fn
    scene = build_rigid_stacks(n, seed=0)

    # settle to realistic contact density with the full pipeline
    os.environ["LPE_RIGID_ABLATE"] = ""
    full = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    state = scene.state
    for _ in range(4):
        state = full(state)
    _ = np.asarray(state.bodies.pos)

    for mode in ("broadphase", "narrow", "novel", "nopos", ""):
        os.environ["LPE_RIGID_ABLATE"] = mode
        run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
        tps = _time(run, state, block)
        print(json.dumps({"ablate": mode or "full",
                          "ticks_per_sec": round(tps, 2),
                          "ms_per_tick": round(1000.0 / tps, 3)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

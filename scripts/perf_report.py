#!/usr/bin/env python
"""Perf sweep on the real chip: headline + scaling + per-stage ablations.

Each workload is timed as whole multi-tick dispatches (the tunneled device
adds ~2-8 ms per dispatch; `np.asarray` hard-syncs before reading timers —
`block_until_ready` can return early through the tunnel).

Usage: python scripts/perf_report.py [dam20k dam100k ablate rigid10k
                                      coupled galaxy]
(no args = all). Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time


def _time_run(run, state, ticks_per_block, blocks=2, repeats=2):
    import numpy as np
    state = run(state)                       # compile + warm
    _ = np.asarray(state.bodies.pos)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(blocks):
            state = run(state)
        _ = np.asarray(state.bodies.pos)
        best = max(best, blocks * ticks_per_block
                   / (time.perf_counter() - t0))
    return best, state


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def dam(n, ticks=60, block=10, ablate=""):
    import numpy as np  # noqa: F401

    from lpe_tpu.scenarios.bench_scenes import build_dam_break
    from lpe_tpu.systems import build_run_fn

    if ablate:
        os.environ["LPE_SPH_ABLATE"] = ablate
    else:
        os.environ.pop("LPE_SPH_ABLATE", None)
    scene = build_dam_break(n, seed=0)
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    t0 = time.perf_counter()
    tps, _ = _time_run(run, scene.state, block,
                       blocks=max(1, ticks // block))
    _emit(metric=f"dam_{n}" + (f"_ablate_{ablate}" if ablate else ""),
          ticks_per_sec=round(tps, 2), ms_per_tick=round(1000.0 / tps, 3),
          wall_s=round(time.perf_counter() - t0, 1))


def rigid(n, ticks=30, block=10):
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    from lpe_tpu.systems import build_run_fn

    scene = build_rigid_stacks(n, seed=0)
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    tps, _ = _time_run(run, scene.state, block,
                       blocks=max(1, ticks // block))
    _emit(metric=f"rigid_stacks_{n}", ticks_per_sec=round(tps, 2),
          ms_per_tick=round(1000.0 / tps, 3))


def coupled(n_fluid, n_rigid, ticks=30, block=10):
    from lpe_tpu.scenarios.bench_scenes import build_coupled_dam
    from lpe_tpu.systems import build_run_fn

    scene = build_coupled_dam(n_fluid, n_rigid, seed=0)
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    tps, _ = _time_run(run, scene.state, block,
                       blocks=max(1, ticks // block))
    _emit(metric=f"coupled_{n_fluid}_{n_rigid}", ticks_per_sec=round(tps, 2),
          ms_per_tick=round(1000.0 / tps, 3))


def highlight(n_fluid, n_rigid, n_gas, ticks=30, block=10):
    from lpe_tpu.scenarios.bench_scenes import build_highlight_reel
    from lpe_tpu.systems import build_run_fn

    scene = build_highlight_reel(n_fluid, n_rigid, n_gas, seed=0)
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    tps, _ = _time_run(run, scene.state, block,
                       blocks=max(1, ticks // block))
    _emit(metric=f"highlight_{n_fluid}_{n_rigid}_{n_gas}",
          ticks_per_sec=round(tps, 2), ms_per_tick=round(1000.0 / tps, 3))


def galaxy(n, ticks=20, block=10):
    from lpe_tpu.scenarios.bench_scenes import build_galaxy
    from lpe_tpu.systems import build_run_fn

    scene = build_galaxy(n, seed=0)
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    tps, _ = _time_run(run, scene.state, block,
                       blocks=max(1, ticks // block))
    _emit(metric=f"galaxy_{n}", ticks_per_sec=round(tps, 2),
          ms_per_tick=round(1000.0 / tps, 3))


def main(argv):
    which = set(argv) or {"dam20k", "ablate", "dam100k", "rigid10k",
                          "coupled", "galaxy", "highlight"}
    import jax
    _emit(device=str(jax.devices()[0]))
    if "dam20k" in which:
        dam(20000)
    if "ablate" in which:
        for st in ("integrate", "grid", "density", "nocouple", ""):
            dam(20000, ticks=30, ablate=st)
    if "dam100k" in which:
        dam(100000, ticks=30)
    if "rigid10k" in which:
        rigid(10000)
    if "coupled" in which:
        coupled(100000, 300, ticks=20)
    if "galaxy" in which:
        galaxy(1000000, ticks=10)
    if "highlight" in which:
        highlight(20000, 60, 200)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

#!/usr/bin/env python
"""Headline benchmark: SPH dam break throughput on the accelerator vs. the
measured CPU oracle (the reference publishes no numbers — BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

- value: simulation ticks/sec on the default JAX device (1 tick = 10 SPH
  sub-steps at 120 TPS design rate, reference: fluid.hpp:198).
- vs_baseline: speedup over the vectorized NumPy CPU oracle on the *same*
  workload, measured in-process (single host process, like the reference).
"""
from __future__ import annotations

import json
import os
import sys
import time

N_PARTICLES = int(os.environ.get("BENCH_N", "20000"))
TICKS = int(os.environ.get("BENCH_TICKS", "30"))
ORACLE_TICKS = int(os.environ.get("BENCH_ORACLE_TICKS", "2"))


def main():
    import jax
    import numpy as np

    from lpe_tpu.oracle.sph_numpy import SphOracle
    from lpe_tpu.scenarios.bench_scenes import build_dam_break
    from lpe_tpu.systems import build_tick_fn

    scene = build_dam_break(N_PARTICLES, seed=0)
    tick = build_tick_fn(scene.spec, scene.cfg, donate=False)
    state = tick(scene.state)                       # compile + 1 tick
    jax.block_until_ready(state.bodies.pos)
    t0 = time.perf_counter()
    for _ in range(TICKS):
        state = tick(state)
    jax.block_until_ready(state.bodies.pos)
    dev_s = time.perf_counter() - t0
    dev_tps = TICKS / dev_s
    assert bool(jax.numpy.isfinite(state.bodies.pos).all()), "non-finite state"

    # CPU oracle on the identical workload
    liq = scene.spec.liquid_slice
    pos = np.asarray(scene.state.bodies.pos)[liq].astype(np.float64)
    vel = np.asarray(scene.state.bodies.vel)[liq].astype(np.float64)
    mass = np.asarray(scene.state.bodies.mass)[liq].astype(np.float64)
    fc = scene.cfg.fluid
    oracle = SphOracle(h=fc.grid.smoothing_length, rest_density=fc.rest_density,
                       stiffness=fc.stiffness, viscosity=fc.viscosity,
                       universe=scene.cfg.shared.universe_size_m,
                       margin=scene.cfg.boundary.margin_pixels
                       * scene.cfg.shared.meters_per_pixel)
    t0 = time.perf_counter()
    for _ in range(ORACLE_TICKS):
        pos, vel, _, _ = oracle.tick(pos, vel, mass)
    cpu_s = time.perf_counter() - t0
    cpu_tps = ORACLE_TICKS / cpu_s

    out = {
        "metric": f"sph_dam_break_{N_PARTICLES}_ticks_per_sec",
        "value": round(dev_tps, 3),
        "unit": "ticks/s",
        "vs_baseline": round(dev_tps / cpu_tps, 2),
        "device": str(jax.devices()[0]),
        "cpu_oracle_ticks_per_sec": round(cpu_tps, 3),
        "n_particles": N_PARTICLES,
        "substeps_per_tick": fc.num_sub_steps,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

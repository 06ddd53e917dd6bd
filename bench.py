#!/usr/bin/env python
"""Benchmarks: every BASELINE.md config on the accelerator vs the measured
native-C++ CPU reference engines (the upstream reference publishes no
numbers — BASELINE.md; denominators: native/sph_ref.cpp,
native/engine_ref.cpp).

Prints ONE JSON line per config, the HEADLINE (SPH dam break) LAST:
  {"metric": ..., "value": N, "unit": "ticks/s", "vs_baseline": N, ...}

- value: simulation ticks/sec on the default JAX device (1 tick = 10 SPH
  sub-steps at the 120 TPS design rate, reference: fluid.hpp:198).
- vs_baseline: speedup over the native engine on the identical workload,
  measured in-process on this host's CPU.

Env knobs: BENCH_CONFIGS (comma list: rigid,galaxy,coupled,highlight,
north,dam; default all), BENCH_N (dam particles), BENCH_TICKS,
BENCH_ORACLE_TICKS, BENCH_BLOCK (ticks per device dispatch).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

N_PARTICLES = int(os.environ.get("BENCH_N", "100000"))
_DENOMS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_DENOMS.json")


def _denom(key, measure):
    """Pinned-denominator protocol (VERDICT r4 #4): native-baseline
    ticks/s are measured ONCE on an idle host (BENCH_PIN=1 writes them to
    BASELINE_DENOMS.json) and reused verbatim afterwards, so vs_baseline
    is comparable across rounds instead of drifting with host contention.
    BENCH_REMEASURE=1 forces a fresh measurement (not persisted unless
    BENCH_PIN is also set). Keys embed workload sizes, so degraded-mode
    (reduced-size) runs never collide with pinned full-size numbers."""
    d = {}
    if os.path.exists(_DENOMS_PATH):
        try:
            with open(_DENOMS_PATH) as f:
                d = json.load(f)
        except Exception:
            d = {}
    if key in d and not os.environ.get("BENCH_REMEASURE"):
        return float(d[key]), "pinned"
    v = float(measure())
    if os.environ.get("BENCH_PIN"):
        d[key] = v
        with open(_DENOMS_PATH, "w") as f:
            json.dump(d, f, indent=1, sort_keys=True)
    return v, "measured"
TICKS = int(os.environ.get("BENCH_TICKS", "60"))
ORACLE_TICKS = int(os.environ.get("BENCH_ORACLE_TICKS", "3"))
BLOCK = max(1, int(os.environ.get("BENCH_BLOCK", "10")))
CONFIGS = os.environ.get(
    "BENCH_CONFIGS", "rigid,galaxy,coupled,highlight,north,dam").split(",")


def _accelerator_reachable(timeout_s: float = 180.0) -> bool:
    """Probe the default backend in a SUBPROCESS: when the tunneled TPU is
    unreachable, ``jax.devices()`` blocks forever in a reconnect loop (no
    exception to catch), which would hang the whole benchmark run."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit(metric, dev_tps, cpu_tps, baseline, extra=None, fallback=None,
          denom="measured"):
    import jax
    out = {
        "metric": metric,
        "value": round(dev_tps, 3),
        "unit": "ticks/s",
        "vs_baseline": round(dev_tps / cpu_tps, 2) if cpu_tps else None,
        "device": str(jax.devices()[0]),
        "baseline": baseline,
        "cpu_ticks_per_sec": round(cpu_tps, 4),
        "denominator": denom,
    }
    if extra:
        out.update(extra)
    if fallback:
        out["fallback"] = fallback
    print(json.dumps(out), flush=True)


def _time_device(scene, ticks, block, warm_blocks=1, settle_ticks=0):
    """ticks/s of the full tick pipeline via build_run_fn; hard-syncs with
    np.asarray (block_until_ready can return early through the tunnel).
    ``settle_ticks`` advances the sim before the timed window so coupled
    configs are measured at representative contact density (matching the
    settled native baseline), not at the pre-contact t=0 geometry."""
    import numpy as np
    from lpe_tpu.systems import build_run_fn
    run = build_run_fn(scene.spec, scene.cfg, ticks=block, donate=False)
    state = run(scene.state)                    # compile + first block
    _ = np.asarray(state.bodies.pos)
    for _i in range(warm_blocks - 1 + settle_ticks // block):
        state = run(state)
    _ = np.asarray(state.bodies.pos)
    blocks = max(1, ticks // block)
    best = 0.0
    for _i in range(2):   # best of two: the tunnel occasionally stalls
        t0 = time.perf_counter()
        for _j in range(blocks):
            state = run(state)
        _ = np.asarray(state.bodies.pos)
        best = max(best, blocks * block / (time.perf_counter() - t0))
    import jax.numpy as jnp
    assert bool(jnp.isfinite(state.bodies.pos).all()), "non-finite state"
    return best, state


def _rigid_arrays(sc):
    import numpy as np
    b = sc.state.bodies
    sol = np.asarray(b.phase) == 0
    sol &= np.asarray(b.active)
    idx = np.nonzero(sol)[0]
    return dict(
        pos=np.asarray(b.pos, np.float64)[idx],
        vel=np.asarray(b.vel, np.float64)[idx],
        ang=np.asarray(b.angle, np.float64)[idx],
        om=np.asarray(b.omega, np.float64)[idx],
        mass=np.asarray(b.mass, np.float64)[idx],
        inertia=np.asarray(b.inertia, np.float64)[idx],
        verts=np.asarray(b.verts, np.float64)[idx],
        nv=np.asarray(b.nverts, np.int32)[idx],
        rad=np.asarray(b.radius, np.float64)[idx],
        circ=(np.asarray(b.shape_kind)[idx] == 0).astype(np.uint8),
        isw=np.asarray(b.boundary)[idx].astype(np.uint8))


def _bound_kw(sc):
    return dict(universe=sc.cfg.shared.universe_size_m,
                margin=sc.cfg.boundary.margin_pixels
                * sc.cfg.shared.meters_per_pixel)


def bench_rigid(n_bodies, oracle_ticks, fallback):
    import numpy as np
    from lpe_tpu.oracle.native import NativeRigidOracle
    from lpe_tpu.scenarios.bench_scenes import build_rigid_stacks
    sc = build_rigid_stacks(n_bodies, seed=0)
    dev_tps, _ = _time_device(sc, max(10, TICKS // 2), BLOCK)

    def measure():
        A = _rigid_arrays(sc)
        o = NativeRigidOracle(**_bound_kw(sc))
        args = (A["pos"], A["vel"], A["ang"], A["om"], A["mass"],
                A["inertia"], A["verts"], A["nv"], A["rad"], A["circ"],
                A["isw"])
        # settle so the native engine is timed at realistic contact density
        p, v, a, w = o.run(*args, 30)
        t0 = time.perf_counter()
        o.run(p, v, a, w, *args[4:], oracle_ticks)
        return oracle_ticks / (time.perf_counter() - t0)

    cpu_tps, src = _denom(f"rigid_{n_bodies}", measure)
    _emit(f"rigid_stacks_{n_bodies}_ticks_per_sec", dev_tps, cpu_tps,
          "native_cpp_rigid", {"n_bodies": n_bodies}, fallback, src)


def bench_galaxy(n_bodies, oracle_ticks, fallback):
    import numpy as np
    from lpe_tpu.core.constants import REAL_G
    from lpe_tpu.oracle.native import NativeNBodyOracle
    from lpe_tpu.scenarios.bench_scenes import build_galaxy
    sc = build_galaxy(n_bodies, seed=0)
    dev_tps, _ = _time_device(sc, max(10, TICKS // 2), BLOCK)

    def measure():
        b = sc.state.bodies
        o = NativeNBodyOracle(
            G=REAL_G, soft=sc.cfg.shared.gravitational_softener,
            dt=sc.cfg.shared.seconds_per_tick
            * sc.cfg.shared.time_acceleration,
            universe=sc.cfg.shared.universe_size_m)
        t0 = time.perf_counter()
        o.run(np.asarray(b.pos, np.float64), np.asarray(b.vel, np.float64),
              np.asarray(b.mass, np.float64), oracle_ticks)
        return oracle_ticks / (time.perf_counter() - t0)

    cpu_tps, src = _denom(f"galaxy_{n_bodies}", measure)
    _emit(f"galaxy_{n_bodies}_ticks_per_sec", dev_tps, cpu_tps,
          "native_cpp_bh", {"n_bodies": n_bodies}, fallback, src)


def _coupled_baseline(sc, oracle_ticks, settle_ticks=0):
    import numpy as np
    from lpe_tpu.oracle.native import NativeCoupledOracle
    b = sc.state.bodies
    act = np.asarray(b.active)
    ph = np.asarray(b.phase)
    liq = act & (ph == 1)
    gas = act & (ph == 2)
    fpos = np.asarray(b.pos, np.float64)[liq]
    fvel = np.asarray(b.vel, np.float64)[liq]
    fmass = np.asarray(b.mass, np.float64)[liq]
    A = _rigid_arrays(sc)
    fc = sc.cfg.fluid
    o = NativeCoupledOracle(
        h=fc.grid.smoothing_length, rest_density=fc.rest_density,
        stiffness=fc.stiffness, viscosity=fc.viscosity,
        num_sub_steps=fc.num_sub_steps, **_bound_kw(sc))
    gpos = np.asarray(b.pos, np.float64)[gas]
    gvel = np.asarray(b.vel, np.float64)[gas]
    stat = (fpos, fvel, fmass, A["pos"], A["vel"], A["ang"], A["om"])
    if settle_ticks:
        # time at contact density: advance the native engine first, then
        # measure from the settled state (mirrors _time_device settle)
        out = o.run(*stat, A["mass"], A["inertia"], A["verts"], A["nv"],
                    A["rad"], A["circ"], A["isw"], gpos, gvel, settle_ticks)
        fpos, fvel, rpos, rvel, rang, rom, gpos, gvel = out
        stat = (fpos, fvel, fmass, rpos, rvel, rang, rom)
    t0 = time.perf_counter()
    o.run(*stat, A["mass"], A["inertia"], A["verts"], A["nv"], A["rad"],
          A["circ"], A["isw"], gpos, gvel, oracle_ticks)
    return oracle_ticks / (time.perf_counter() - t0)


def bench_coupled(n_fluid, n_rigid, oracle_ticks, fallback, settle=0):
    from lpe_tpu.scenarios.bench_scenes import build_coupled_dam
    sc = build_coupled_dam(n_fluid, n_rigid, seed=0)
    dev_tps, _ = _time_device(sc, TICKS, BLOCK, settle_ticks=settle)
    cpu_tps, src = _denom(
        f"coupled_{n_fluid}_{n_rigid}_s{settle}",
        lambda: _coupled_baseline(sc, oracle_ticks, settle_ticks=settle))
    _emit(f"coupled_dam_{n_fluid}_{n_rigid}_ticks_per_sec", dev_tps,
          cpu_tps, "native_cpp_coupled",
          {"n_fluid": n_fluid, "n_rigid": n_rigid,
           "settle_ticks": settle}, fallback, src)


def bench_north_star(n_fluid, n_rigid, oracle_ticks, fallback, settle=0):
    """THE BASELINE.md north-star workload: 100k SPH + 10k rigid in one
    scene (the 100x/v5e-8 target is defined on this config). Both sides
    settle before timing so the numbers reflect coupled physics at contact
    density, not the pre-contact drop."""
    from lpe_tpu.scenarios.bench_scenes import build_north_star
    sc = build_north_star(n_fluid, n_rigid, seed=0)
    dev_tps, _ = _time_device(sc, max(10, TICKS // 2), BLOCK,
                              settle_ticks=settle)
    cpu_tps, src = _denom(
        f"north_{n_fluid}_{n_rigid}_s{settle}",
        lambda: _coupled_baseline(sc, oracle_ticks, settle_ticks=settle))
    _emit(f"north_star_{n_fluid}_{n_rigid}_ticks_per_sec", dev_tps,
          cpu_tps, "native_cpp_coupled",
          {"n_fluid": n_fluid, "n_rigid": n_rigid,
           "settle_ticks": settle}, fallback, src)


def bench_highlight(n_fluid, n_rigid, n_gas, oracle_ticks, fallback,
                    settle=0):
    from lpe_tpu.scenarios.bench_scenes import build_highlight_reel
    sc = build_highlight_reel(n_fluid, n_rigid, n_gas, seed=0)
    dev_tps, _ = _time_device(sc, TICKS, BLOCK, settle_ticks=settle)
    cpu_tps, src = _denom(
        f"highlight_{n_fluid}_{n_rigid}_{n_gas}_s{settle}",
        lambda: _coupled_baseline(sc, oracle_ticks, settle_ticks=settle))
    _emit(f"highlight_reel_{n_fluid}_{n_rigid}_ticks_per_sec", dev_tps,
          cpu_tps, "native_cpp_coupled",
          {"n_fluid": n_fluid, "n_rigid": n_rigid, "n_gas": n_gas,
           "settle_ticks": settle}, fallback, src)


def bench_dam(n_particles, oracle_ticks, fallback):
    import numpy as np
    from lpe_tpu.scenarios.bench_scenes import build_dam_break
    scene = build_dam_break(n_particles, seed=0)
    dev_tps, _ = _time_device(scene, TICKS, BLOCK)
    liq = scene.spec.liquid_slice
    pos = np.asarray(scene.state.bodies.pos)[liq].astype(np.float64)
    vel = np.asarray(scene.state.bodies.vel)[liq].astype(np.float64)
    mass = np.asarray(scene.state.bodies.mass)[liq].astype(np.float64)
    fc = scene.cfg.fluid
    kw = dict(h=fc.grid.smoothing_length, rest_density=fc.rest_density,
              stiffness=fc.stiffness, viscosity=fc.viscosity,
              **_bound_kw(scene))
    baseline = ["native_cpp"]

    def measure():
        nonlocal pos, vel
        try:
            from lpe_tpu.oracle.native import NativeSphOracle
            oracle = NativeSphOracle(**kw)
            t0 = time.perf_counter()
            oracle.run(pos, vel, mass, oracle_ticks)
            cpu_s = time.perf_counter() - t0
        except Exception:
            from lpe_tpu.oracle.sph_numpy import SphOracle
            oracle = SphOracle(**kw)
            baseline[0] = "numpy"
            t0 = time.perf_counter()
            for _ in range(oracle_ticks):
                pos, vel, _, _ = oracle.tick(pos, vel, mass)
            cpu_s = time.perf_counter() - t0
        return oracle_ticks / cpu_s if oracle_ticks else 0.0

    cpu_tps, src = _denom(f"dam_{n_particles}", measure)
    _emit(f"sph_dam_break_{n_particles}_ticks_per_sec", dev_tps, cpu_tps,
          baseline[0], {"n_particles": n_particles,
                        "substeps_per_tick": fc.num_sub_steps,
                        "ticks_per_dispatch": BLOCK}, fallback, src)


def main():
    global N_PARTICLES, TICKS
    fallback = None
    sizes = dict(dam=N_PARTICLES, rigid=10000, galaxy=1000000,
                 coupled_f=100000, coupled_r=300, hl_f=20000, hl_r=60,
                 hl_g=200, ns_f=100000, ns_r=10000)
    oticks = dict(dam=ORACLE_TICKS, rigid=max(2, ORACLE_TICKS),
                  galaxy=1, coupled=1, highlight=2, north=1)
    settle = dict(coupled=60, highlight=60, north=120)
    if "BENCH_SETTLE" in os.environ:
        settle = {k: int(os.environ["BENCH_SETTLE"]) for k in settle}
    if not _accelerator_reachable():
        # degraded mode: finish with a CPU measurement rather than hang
        fallback = "accelerator unreachable; CPU backend, reduced workload"
        sizes = dict(dam=5000, rigid=500, galaxy=5000, coupled_f=3000,
                     coupled_r=20, hl_f=3000, hl_r=12, hl_g=50,
                     ns_f=3000, ns_r=300)
        TICKS = min(TICKS, 10)
        settle = {k: 0 for k in settle}
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F401  (device selection settled above)

    runners = {
        "rigid": lambda: bench_rigid(sizes["rigid"], oticks["rigid"],
                                     fallback),
        "galaxy": lambda: bench_galaxy(sizes["galaxy"], oticks["galaxy"],
                                       fallback),
        "coupled": lambda: bench_coupled(sizes["coupled_f"],
                                         sizes["coupled_r"],
                                         oticks["coupled"], fallback,
                                         settle=settle["coupled"]),
        "highlight": lambda: bench_highlight(sizes["hl_f"], sizes["hl_r"],
                                             sizes["hl_g"],
                                             oticks["highlight"], fallback,
                                             settle=settle["highlight"]),
        "north": lambda: bench_north_star(sizes["ns_f"], sizes["ns_r"],
                                          oticks["north"], fallback,
                                          settle=settle["north"]),
        "dam": lambda: bench_dam(sizes["dam"], oticks["dam"], fallback),
    }
    # headline (dam) must be LAST: the driver records the tail line
    order = [c for c in ("rigid", "galaxy", "coupled", "highlight", "north")
             if c in CONFIGS] + (["dam"] if "dam" in CONFIGS else [])
    failed = []
    for c in order:
        try:
            runners[c]()
        except Exception as e:  # one config must not sink the others
            failed.append(c)
            print(json.dumps({"metric": c, "error": repr(e)[:200]}),
                  flush=True)
    if failed:  # VERDICT r4 #2: a crashing config fails the run LOUDLY
        print(f"bench: {len(failed)} config(s) errored: "
              f"{','.join(failed)}", file=sys.stderr, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

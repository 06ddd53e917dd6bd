#!/usr/bin/env python
"""Multi-chip scaling evidence (VERDICT r3 task 6): per-device work and
bytes moved per tick for north-star-shaped scenes on an N-device mesh.

The 100x target (BASELINE.md) assumes ~12.5x/chip x 8 chips, so the
collectives XLA inserts must not erase the 8x. This harness compiles the
sharded tick on an N-virtual-device CPU mesh (the same code path the real
v5e-8 would run; collectives are backend-agnostic XLA HLO) and reports,
straight from the optimized HLO:

- per-device FLOPs + bytes accessed (compiled.cost_analysis) at N=1 vs N,
  i.e. how much of the tick actually divides by N;
- every collective op (all-gather / all-reduce / reduce-scatter /
  collective-permute / all-to-all) with its payload bytes — the per-tick
  ICI traffic budget.

Run (1-core host: keep sizes small; shapes, not wall-time, are the
evidence):
  PYTHONPATH=/root/repo:/root/.axon_site \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/multichip_scaling.py [--nf 4000] [--nr 400] [--out F]

Writes one JSON object (also printed) suitable for committing as a
SCALING_rNN.json artifact.
"""
from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")  # noqa: E402  (axon tunnel-proof)

import numpy as np  # noqa: E402

_DT_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "c64": 8}

# e.g. "f32[128,2048]{1,0}" -> bytes
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(s: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(s):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start|-done)?\(", re.M)


def collective_stats(hlo_text: str) -> dict:
    """Payload bytes per collective kind from optimized HLO. '-done' ops
    are skipped (their '-start' twin already carries the payload)."""
    out: dict[str, dict] = {}
    for m in _COLL_RE.finditer(hlo_text):
        shape, kind = m.group(1), m.group(2)
        line = hlo_text[m.start():hlo_text.index("\n", m.start())]
        if f"{kind}-done" in line:
            continue
        b = _shape_bytes(shape)
        d = out.setdefault(kind, dict(count=0, bytes=0))
        d["count"] += 1
        d["bytes"] += b
    return out


def _build(workload: str, nf: int, nr: int):
    from lpe_tpu.scenarios import bench_scenes as bs
    if workload == "rigid":
        return bs.build_rigid_stacks(nr, seed=0)
    if workload == "dam":
        return bs.build_dam_break(nf, seed=0)
    return bs.build_north_star(nf, nr, seed=0)


def measure(nf: int, nr: int, ndev: int, ticks_per_block: int = 1,
            workload: str = "north") -> dict:
    from lpe_tpu.parallel.sharded import build_sharded_run, make_mesh, \
        shard_state

    sc = _build(workload, nf, nr)
    mesh = make_mesh(ndev)
    run = build_sharded_run(sc, mesh, ticks=ticks_per_block)
    lowered = run.lower(shard_state(mesh, sc.state))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    hlo = compiled.as_text()
    colls = collective_stats(hlo)
    # cost_analysis is per-device under SPMD
    rep = dict(
        n_devices=ndev, n_fluid=nf, n_rigid=nr,
        ticks_per_block=ticks_per_block,
        per_device_flops=float(ca.get("flops", -1.0)),
        per_device_bytes=float(ca.get("bytes accessed", -1.0)),
        collectives=colls,
        collective_bytes_total=sum(d["bytes"] for d in colls.values()),
    )
    # one real execution: correctness of the sharded program — then a timed
    # window. The harness host runs every virtual device on ONE core, so
    # multi-device wall-clock ~= SUM of per-device work: the ratio
    # wall(N)/wall(1) is the total-work inflation of the sharded program
    # (1.0 = perfect weak scaling; the achievable N-chip speedup is
    # ~ N / inflation). This is the loop-aware complement to
    # cost_analysis, which does not multiply flops through scan/fori trip
    # counts.
    import time
    st = shard_state(mesh, sc.state)
    out = run(st)
    rep["finite"] = bool(np.isfinite(np.asarray(out.bodies.pos)).all())
    t0 = time.perf_counter()
    for _ in range(2):
        out = run(out)
    np.asarray(out.bodies.pos)
    rep["exec_s_per_tick"] = round(
        (time.perf_counter() - t0) / (2 * ticks_per_block), 4)
    return rep


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=4000)
    ap.add_argument("--nr", type=int, default=400)
    ap.add_argument("--ndev", type=int, default=0,
                    help="0 = all visible devices")
    ap.add_argument("--block", type=int, default=1)
    ap.add_argument("--workload", default="north",
                    choices=("north", "rigid", "dam"))
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    ndev = args.ndev or len(jax.devices())

    res = dict(metric="multichip_scaling", workload=args.workload)
    res["single"] = measure(args.nf, args.nr, 1, args.block,
                            args.workload)
    res["multi"] = measure(args.nf, args.nr, ndev, args.block,
                           args.workload)
    s, m = res["single"], res["multi"]
    if s.get("exec_s_per_tick", 0) > 0:
        infl = m["exec_s_per_tick"] / s["exec_s_per_tick"]
        res["total_work_inflation"] = round(infl, 3)
        res["projected_speedup_at_n"] = round(ndev / max(infl, 1e-9), 2)
    if s["per_device_flops"] > 0:
        res["flops_parallel_fraction"] = round(
            1.0 - m["per_device_flops"] / s["per_device_flops"], 4)
        # Amdahl: work that did NOT divide by N bounds the achievable
        # speedup at N devices
        ser = m["per_device_flops"] / s["per_device_flops"] \
            - (1.0 / ndev)
        res["amdahl_speedup_bound"] = round(
            1.0 / max(1.0 / ndev, m["per_device_flops"]
                      / max(s["per_device_flops"], 1.0)), 2)
        res["serial_flops_fraction"] = round(max(0.0, ser), 4)
    txt = json.dumps(res)
    print(txt, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Regenerate the README benchmark table from the newest BENCH_r*.json (or a
file of bench.py JSON lines) so ledger and driver artifact cannot drift
(VERDICT r2 weak #2: README/CLAUDE claims were better than any artifact).

Usage:
    python scripts/sync_ledger.py            # newest BENCH_r*.json
    python scripts/sync_ledger.py lines.json # a file of bench.py JSON lines

Rewrites the block between BENCH_TABLE markers in README.md.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LABELS = {
    "sph_dam_break": ("SPH dam break", "{n_particles} particles"),
    "rigid_stacks": ("rigid stacks", "{n_bodies} bodies"),
    "galaxy": ("N-body galaxy", "{n_bodies} bodies"),
    "coupled_dam": ("coupled dam", "{n_fluid} fluid + {n_rigid} rigid"),
    "north_star": ("north star", "{n_fluid} fluid + {n_rigid} rigid"),
    "highlight_reel": ("highlight reel",
                       "{n_fluid} fluid + {n_rigid} rigid + {n_gas} gas"),
}


def load_lines(path=None):
    if path:
        text = open(path).read()
        rows = [json.loads(ln) for ln in text.splitlines() if
                ln.strip().startswith("{")]
        src = os.path.basename(path)
        return rows, src
    arts = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifact found")
    art = arts[-1]
    data = json.load(open(art))
    rows = [json.loads(ln) for ln in data.get("tail", "").splitlines()
            if ln.strip().startswith("{")]
    return rows, os.path.basename(art)


def fmt_row(r):
    m = r.get("metric", "")
    if "error" in r or "value" not in r:
        return None
    for key, (name, sizer) in LABELS.items():
        if m.startswith(key):
            size = sizer.format(**{k: f"{v:,}" for k, v in r.items()
                                   if isinstance(v, int)})
            tps = r["value"]
            ms = 1000.0 / tps if tps else float("inf")
            base = r.get("cpu_ticks_per_sec")
            vs = r.get("vs_baseline")
            base_s = (f"{base:.2f} ticks/s ({r.get('baseline', '')})"
                      if base else "—")
            vs_s = f"**{vs}x**" if vs is not None else "—"
            return (f"| {name}, {size} | {tps:.1f} ticks/s "
                    f"({ms:.1f} ms/tick) | {base_s} | {vs_s} |")
    return None


def main(argv):
    rows, src = load_lines(argv[0] if argv else None)
    lines = [fmt_row(r) for r in rows]
    lines = [ln for ln in lines if ln]
    table = "\n".join(
        [f"Measured numbers below are regenerated from `{src}` by",
         "`scripts/sync_ledger.py` (real TPU v5e-1, float32; baselines are",
         "the native C++ engines under `native/`, one CPU core, identical",
         "initial conditions).", "",
         "| workload | TPU v5e-1 | CPU baseline (1 core) | speedup |",
         "|---|---|---|---|"] + lines)
    readme = os.path.join(ROOT, "README.md")
    text = open(readme).read()
    start = "<!-- BENCH_TABLE_START -->"
    end = "<!-- BENCH_TABLE_END -->"
    if start not in text:
        raise SystemExit("README.md lacks BENCH_TABLE markers")
    new = re.sub(re.escape(start) + r".*?" + re.escape(end),
                 start + "\n" + table + "\n" + end, text, flags=re.S)
    open(readme, "w").write(new)
    print(f"README.md bench table regenerated from {src} "
          f"({len(lines)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Bench-scene smoke: build + run every BASELINE.md bench config, tiny,
through the exact entry point bench.py uses (systems.build_run_fn), with
the fluid pair backend FORCED to the TPU-default Pallas path (interpret
mode on CPU).

This is the gate VERDICT r4 #2/#7 asked for: round 4's HEAD shipped a
NameError in the rasterized coupling reduce that only the TPU benches hit,
because CPU tests exercised the XLA coupling branch while TPU defaulted to
the Pallas one. Forcing ``pair_backend="sweep"`` here makes the TPU-default
branch set CI-covered end-to-end — b51028a fails this file at trace time.

Run standalone before snapshot commits:
    python -m pytest tests/test_smoke_bench.py -q
"""
import dataclasses

import jax.numpy as jnp
import pytest

from lpe_tpu.scenarios.bench_scenes import (build_coupled_dam,
                                            build_dam_break, build_galaxy,
                                            build_highlight_reel,
                                            build_north_star,
                                            build_rigid_stacks)
from lpe_tpu.systems import build_run_fn


def _tick(sc, force_pallas=True, ticks=1):
    cfg = sc.cfg
    if force_pallas:
        cfg = cfg.replace(
            fluid=dataclasses.replace(cfg.fluid, pair_backend="sweep"))
    run = build_run_fn(sc.spec, cfg, ticks=ticks, donate=False)
    st = run(sc.state)
    assert bool(jnp.isfinite(st.bodies.pos).all()), "non-finite positions"
    assert bool(jnp.isfinite(st.bodies.vel).all()), "non-finite velocities"
    return st


def test_smoke_rigid():
    _tick(build_rigid_stacks(200, seed=0), force_pallas=False)


def test_smoke_galaxy():
    _tick(build_galaxy(512, seed=0), force_pallas=False)


def test_smoke_dam_pallas():
    _tick(build_dam_break(400, seed=0))


def test_smoke_coupled_pallas():
    # fluid + rigids => exercises the rasterized coupling field build,
    # the fused coupling kernel (interpret), and the per-tick force reduce
    _tick(build_coupled_dam(600, 12, seed=0))


def test_smoke_highlight_pallas():
    _tick(build_highlight_reel(400, 8, 30, seed=0))


def test_smoke_north_pallas():
    _tick(build_north_star(600, 60, seed=0))

"""Scenario catalog + factory.

reference: src/scenario_manager.cpp:19-66 (catalog + factory switch). Each
scenario module exposes ``build(seed=...) -> Scene``; the reference seeds
``std::default_random_engine`` with ``time(nullptr)`` (e.g.
keplerian_disk.cpp:81), so exact trajectories were never reproducible — here
seeds are explicit and deterministic, and distribution/physics parity is what
tests assert.
"""
from __future__ import annotations

from ..core.constants import SimulationType, get_all_scenarios, get_scenario_name
from ..scene import Scene

_BUILDERS = {}


def register(sim_type: SimulationType):
    def deco(fn):
        _BUILDERS[sim_type] = fn
        return fn
    return deco


def create_scenario(sim_type: SimulationType, seed: int = 0, **kw) -> Scene:
    from . import (fluid_and_polygons, galton_board, hourglasses,  # noqa: F401
                   keplerian_disk, planetary_ocean, random_polygons,
                   simple_fluid)
    if isinstance(sim_type, str):
        sim_type = SimulationType[sim_type]
    return _BUILDERS[sim_type](seed=seed, **kw)


def list_scenarios():
    return [(s, get_scenario_name(s)) for s in get_all_scenarios()]

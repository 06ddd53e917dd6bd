"""System composition: one jitted tick in the reference's fixed order.

Order (reference: src/sim.cpp:107-114):
Fluid -> Boundary -> BasicGravity -> RigidBodyCollision -> BarnesHut ->
Rotation -> Movement -> Sleep.

``build_tick_fn(spec, cfg)`` resolves which systems exist for a scenario at
build time (static decisions, mirroring the reference's auto-disable checks)
and returns a single pure function suitable for ``jax.jit``.
"""
from __future__ import annotations

import jax

from ..core.config import ScenarioSystemConfig
from ..scene import SceneSpec
from ..state import SimState
from . import simple
from .barnes_hut import make_barnes_hut


def build_system_list(spec: SceneSpec, cfg: ScenarioSystemConfig,
                      include_dampening: bool = False,
                      fluid_mesh=None, fluid_axis: str = "data"):
    """``fluid_mesh``: a jax Mesh — the fluid system then runs row-band
    spatially sharded over ``fluid_axis`` (shard_map + ppermute halos,
    see systems/fluid/sph.py step_halo)."""
    from .fluid import make_fluid
    from .rigid import make_rigid

    systems = []

    def addn(name, fn):
        if fn is not None:
            systems.append((name, fn))

    addn("fluid", make_fluid(spec, cfg, mesh=fluid_mesh, axis=fluid_axis))
    addn("boundary", simple.make_boundary(spec, cfg))
    addn("gravity", simple.make_gravity(spec, cfg))
    addn("rigid", make_rigid(spec, cfg))
    addn("barnes_hut", make_barnes_hut(spec, cfg))
    addn("rotation", simple.make_rotation(spec, cfg))
    addn("movement", simple.make_movement(spec, cfg))
    addn("sleep", simple.make_sleep(spec, cfg))
    if include_dampening:  # dead code in the reference; opt-in here
        addn("dampening", simple.make_dampening(spec, cfg))
    return systems


def build_tick_fn(spec: SceneSpec, cfg: ScenarioSystemConfig, *,
                  jit: bool = True, donate: bool = True,
                  fluid_mesh=None, fluid_axis: str = "data"):
    systems = build_system_list(spec, cfg, fluid_mesh=fluid_mesh,
                                fluid_axis=fluid_axis)

    def tick(state: SimState) -> SimState:
        for name, fn in systems:
            with jax.named_scope(name):
                state = fn(state)
        return state.replace(tick=state.tick + 1)

    if jit:
        tick = jax.jit(tick, donate_argnums=(0,) if donate else ())
    return tick


def build_run_fn(spec: SceneSpec, cfg: ScenarioSystemConfig, *,
                 ticks: int, jit: bool = True, donate: bool = True,
                 fluid_mesh=None, fluid_axis: str = "data"):
    """One dispatch advancing ``ticks`` ticks (``lax.scan`` over the tick).

    Headless/batch runs should prefer this over calling the single tick in a
    Python loop: state stays on device between ticks and the per-dispatch
    host overhead (milliseconds through a tunneled device) is amortized
    across the block.

    When the fluid system runs grid-resident (TPU default) and no other
    system needs per-tick liquid state in particle order (no Barnes-Hut,
    no liquid Sleep), the fluid grid additionally stays resident across
    the WHOLE block: one sort/scatter at block start, one gather-back at
    block end, with the per-tick boundary/gravity updates applied to the
    liquid planes in grid space (sph.py grid_boundary/grid_gravity). See
    FluidConfig.cross_tick_residency."""
    systems = build_system_list(spec, cfg, fluid_mesh=fluid_mesh,
                                fluid_axis=fluid_axis)
    sysd = dict(systems)
    fl = sysd.get("fluid")
    cross_tick = (getattr(fl, "grid_build", None) is not None
                  and cfg.fluid.cross_tick_residency != "off"
                  and "barnes_hut" not in sysd
                  and not spec.liquid_has_sleep)

    if not cross_tick:
        def tick(state: SimState) -> SimState:
            for name, fn in systems:
                with jax.named_scope(name):
                    state = fn(state)
            return state.replace(tick=state.tick + 1)

        def run(state: SimState) -> SimState:
            return jax.lax.scan(lambda s, _: (tick(s), None), state,
                                None, length=ticks)[0]
    else:
        def tick_ct(state: SimState, D):
            for name, fn in systems:
                with jax.named_scope(name):
                    if name == "fluid":
                        state, D = fl.grid_tick(state, D)
                    else:
                        state = fn(state)
                        if name == "boundary":
                            D = fl.grid_boundary(D)
                        elif name == "gravity":
                            D = fl.grid_gravity(state, D)
            return state.replace(tick=state.tick + 1), D

        def run(state: SimState) -> SimState:
            D = fl.grid_build(state)
            (state, D), _ = jax.lax.scan(
                lambda c, _: (tick_ct(*c), None), (state, D),
                None, length=ticks)
            return fl.grid_readback(state, D)

    if jit:
        run = jax.jit(run, donate_argnums=(0,) if donate else ())
    return run

"""Multi-chip execution: particle-axis sharding over a device mesh.

The reference is strictly single-process / single-GPU (SURVEY.md §2
"parallelism checklist" — no NCCL/MPI/multi-node anywhere), so this layer has
no reference counterpart: it is the TPU-native scale-out design.

Strategy (v1): 1-D mesh over the entity axis. Every per-entity array of
``SimState`` is sharded on its leading axis with ``NamedSharding(P("data"))``;
scalars and the warm-start cache are replicated. The tick function itself is
unchanged — GSPMD propagates the shardings through elementwise systems
(embarrassingly parallel), inserts all-gathers for the O(N^2) gravity tiles
and the SPH neighbor sort, and all-reduces for solver scatter sums. This is
the "annotate and let XLA insert collectives" recipe; hand-tuned
``shard_map`` + ``ppermute`` halo exchange for SPH cells is the planned
next refinement.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..scene import Scene
from ..state import SimState
from ..systems import build_tick_fn

AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def state_shardings(mesh: Mesh, state: SimState):
    """Per-leaf shardings: leading entity axis sharded, scalars replicated.

    The rigid grid pipeline's cell-resident state (``rg_*``: candidate
    rows [NC, R], slot grids [NC*KB, ...]) is sharded on its leading cell
    axis — grid_dims pads the row count to a multiple of 8, so the flat
    cell axis splits into whole y-row bands and the pipeline's ±1-cell
    ``jnp.roll`` neighbor accesses become boundary-row collective-permutes
    under GSPMD instead of gathers (scripts/multichip_scaling.py measures
    the resulting per-tick collective bytes)."""
    entity_n = state.bodies.pos.shape[0]
    sharded = NamedSharding(mesh, P(AXIS))
    replicated = NamedSharding(mesh, P())
    n = mesh.devices.size

    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == entity_n:
            return sharded
        return replicated

    bodies = jax.tree.map(spec, state.bodies)
    scalars = {}
    for f in dataclasses.fields(SimState):
        if f.name == "bodies":
            continue
        leaf = getattr(state, f.name)
        if (f.name.startswith("rg_") and f.name != "rg_flat"
                and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] % max(1, n) == 0):
            scalars[f.name] = sharded
        else:
            scalars[f.name] = replicated
    return SimState(bodies=bodies, **scalars)


def shard_state(mesh: Mesh, state: SimState) -> SimState:
    sh = state_shardings(mesh, state)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)


def _platform_cfg(cfg, mesh: Mesh):
    """'auto' Pallas/residency selections key off the *default* backend; a
    CPU mesh under a TPU-default process must fall back to the XLA scatter
    path."""
    platform = mesh.devices.ravel()[0].platform
    if platform != "tpu":
        repl = {}
        if cfg.fluid.pair_backend == "auto":
            repl["pair_backend"] = "xla"
        if cfg.fluid.residency == "auto":
            repl["residency"] = "off"
        if repl:
            cfg = cfg.replace(fluid=dataclasses.replace(cfg.fluid, **repl))
    return cfg


def build_sharded_tick(scene: Scene, mesh: Mesh, donate: bool = False):
    """Jitted tick with explicit input/output shardings over ``mesh``.

    The fluid system runs row-band spatially sharded (shard_map + ppermute
    halo exchange, systems/fluid/sph.py step_halo) when the mesh has more
    than one device and ``cfg.fluid.partition`` is "auto"/"halo"; everything
    else (elementwise systems, rigid pipeline, gravity) stays GSPMD-sharded
    on the entity axis."""
    cfg = _platform_cfg(scene.cfg, mesh)
    use_halo = (cfg.fluid.partition in ("auto", "halo")
                and mesh.devices.size > 1 and scene.spec.n_liquid > 0)
    tick = build_tick_fn(scene.spec, cfg, jit=False,
                         fluid_mesh=mesh if use_halo else None,
                         fluid_axis=AXIS)
    sh = state_shardings(mesh, scene.state)
    return jax.jit(tick, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())


def build_sharded_run(scene: Scene, mesh: Mesh, *, ticks: int,
                      donate: bool = False):
    """Block dispatch of ``ticks`` ticks with explicit shardings — the
    multi-chip counterpart of systems.build_run_fn. Under the halo path the
    fluid band blocks additionally stay device-resident across the WHOLE
    block (sph.py step_halo grid_* hooks): one all-gather build at block
    start, one reduce-scatter at block end; per-tick communication is the
    O(nx*K) ppermute halo rows plus one [NR] psum."""
    from ..systems import build_run_fn

    cfg = _platform_cfg(scene.cfg, mesh)
    use_halo = (cfg.fluid.partition in ("auto", "halo")
                and mesh.devices.size > 1 and scene.spec.n_liquid > 0)
    run = build_run_fn(scene.spec, cfg, ticks=ticks, jit=False,
                       fluid_mesh=mesh if use_halo else None,
                       fluid_axis=AXIS)
    sh = state_shardings(mesh, scene.state)
    return jax.jit(run, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())

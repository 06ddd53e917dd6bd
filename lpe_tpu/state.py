"""Simulation state: a fixed-capacity structure-of-arrays pytree.

The reference stores entities in an EnTT ECS registry (reference:
include/sim.hpp:85-87) with per-entity components. The TPU-native equivalent
is one dense SoA pytree living permanently in HBM: "has component" checks
become boolean masks, ``registry.view<...>`` becomes ``jnp.where`` on masks,
and the whole tick is a pure function ``SimState -> SimState`` under one jit.

Components mapped (reference: include/entities/entity_components.hpp:8-133):
Position, Velocity, Mass, ParticlePhase, Shape/CircleShape/PolygonShape,
AngularPosition, AngularVelocity, Inertia, Color, Sleep, Material, Boundary,
SpeedOfSound, SPHTemp{density,pressure}; plus the singleton SimulatorState
(reference: include/entities/sim_components.hpp:3-10).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .core import constants


def pytree_dataclass(cls):
    """A frozen dataclass registered as a jax pytree (all fields are leaves)."""
    cls = dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = _replace
    return cls


@pytree_dataclass
class Bodies:
    """Per-entity arrays, capacity ``N`` (padded; see ``active``)."""

    # Kinematics
    pos: jax.Array          # [N, 2] float
    vel: jax.Array          # [N, 2] float
    mass: jax.Array         # [N] float
    angle: jax.Array        # [N] float   (AngularPosition)
    omega: jax.Array        # [N] float   (AngularVelocity)
    inertia: jax.Array      # [N] float   (<=0 means "cannot rotate")

    # Shape
    shape_kind: jax.Array   # [N] int32   (ShapeKind)
    radius: jax.Array       # [N] float   (circle radius / Shape.size)
    verts: jax.Array        # [N, MAX_POLY_VERTS, 2] float, local space, CCW
    nverts: jax.Array       # [N] int32

    # Classification / flags
    phase: jax.Array        # [N] int32   (Phase)
    boundary: jax.Array     # [N] bool
    has_sleep: jax.Array    # [N] bool    (entity owns a Sleep component)
    asleep: jax.Array       # [N] bool
    sleep_counter: jax.Array  # [N] int32
    active: jax.Array       # [N] bool    (capacity padding mask)

    # Material & render
    static_friction: jax.Array   # [N] float
    dynamic_friction: jax.Array  # [N] float
    color: jax.Array        # [N, 3] uint8
    temperature: jax.Array  # [N] float (Temperature component value)
    has_temperature: jax.Array  # [N] bool (entity owns a Temperature comp)

    # SPH per-particle quantities
    h: jax.Array            # [N] float   smoothing length
    c: jax.Array            # [N] float   speed of sound
    density: jax.Array      # [N] float
    pressure: jax.Array     # [N] float
    vhalf: jax.Array        # [N, 2] float (velocity-Verlet half step)

    @property
    def n(self) -> int:
        return self.pos.shape[0]


@pytree_dataclass
class SimState:
    """Full simulation state: bodies + the SimulatorState singleton."""

    bodies: Bodies
    time_scale: jax.Array          # scalar float (UI speed buttons)
    base_time_accel: jax.Array     # scalar float
    tick: jax.Array                # scalar int32
    # Warm-start impulse cache for the rigid solver, keyed by candidate-pair
    # slot and validated against the pair's entity ids (the reference's
    # ContactManager matches manifolds by entity pair + point position,
    # contact_manager.cpp:164-248, but is recreated every tick and thus
    # inert, rigid_body_collision.cpp:40).
    warm_normal: jax.Array         # [max_pairs, max_contacts] float
    warm_tangent: jax.Array        # [max_pairs, max_contacts] float
    warm_ia: jax.Array             # [max_pairs] int32 (-1 = empty slot)
    warm_ib: jax.Array             # [max_pairs] int32
    # Contact-point positions + manifold normal backing the reference's
    # position-based impulse matching (dist^2 < 1e-6, contact_manager.cpp:
    # 222-234) and normal-rotation manifold reset (cos < 0.95, :202-209).
    warm_pt: jax.Array             # [max_pairs, max_contacts, 2] float
    warm_n: jax.Array              # [max_pairs, 2] float
    # Cross-tick broadphase candidate cache (BroadphaseConfig.
    # persist_slack_m > 0): pair ids built from slack-expanded AABBs plus
    # the per-body pose anchors the displacement guard measures against.
    # -1 ids = invalid slot; +inf anchors force a rebuild on first tick.
    bp_ia: jax.Array               # [max_pairs] int32
    bp_ib: jax.Array               # [max_pairs] int32
    bp_anchor_pos: jax.Array       # [n, 2] float
    bp_anchor_ang: jax.Array       # [n] float
    # Grid-resident rigid pipeline caches (systems/rigid/grid_pipeline.py;
    # big scenes only — placeholder [1]-sized arrays otherwise). Rebuilt when
    # the displacement guard trips; +inf bp anchors force the first rebuild.
    rg_flat: jax.Array             # [n_solid] int32 cell*KB+slot (-1 off)
    rg_table: jax.Array            # [NC*KB] int32 body index (S = empty)
    rg_ka: jax.Array               # [NC, R] int32 lo slot per candidate row
    rg_kb: jax.Array               # [NC, R] int32 partner slot / big ordinal
    rg_valid: jax.Array            # [NC, R] bool candidate exists
    rg_verts: jax.Array            # [NC*KB, VS, 2] float (static per rebuild)
    rg_nverts: jax.Array           # [NC*KB] int32
    rg_radius: jax.Array           # [NC*KB] float
    rg_iscirc: jax.Array           # [NC*KB] bool
    rg_invm: jax.Array             # [NC*KB] float
    rg_invi: jax.Array             # [NC*KB] float
    rg_warm_n: jax.Array           # [NC, R, C] float (slot-persistent cache)
    rg_warm_t: jax.Array           # [NC, R, C] float
    rg_warm_pt: jax.Array          # [NC, R, C, 2] float
    rg_warm_nrm: jax.Array         # [NC, R, 2] float


def zero_bodies(n: int, dtype=jnp.float32) -> Bodies:
    V = constants.MAX_POLY_VERTS
    f = lambda *s: jnp.zeros(s, dtype)
    i = lambda *s: jnp.zeros(s, jnp.int32)
    b = lambda *s: jnp.zeros(s, bool)
    return Bodies(
        pos=f(n, 2), vel=f(n, 2), mass=jnp.ones((n,), dtype),
        angle=f(n), omega=f(n), inertia=jnp.ones((n,), dtype),
        shape_kind=i(n), radius=jnp.ones((n,), dtype),
        verts=f(n, V, 2), nverts=i(n),
        phase=i(n), boundary=b(n), has_sleep=b(n),
        asleep=b(n), sleep_counter=i(n), active=b(n),
        static_friction=jnp.full((n,), 0.5, dtype),
        dynamic_friction=jnp.full((n,), 0.3, dtype),
        color=jnp.full((n, 3), 255, jnp.uint8),
        temperature=f(n), has_temperature=b(n),
        h=f(n), c=jnp.full((n,), 1000.0, dtype),
        density=f(n), pressure=f(n), vhalf=f(n, 2),
    )


def make_state(bodies: Bodies, max_pairs: int = 1, max_contacts: int = 8,
               dtype=jnp.float32, grid_cells: int = 0, grid_slots: int = 0,
               grid_rows: int = 0, grid_verts: int = 0,
               n_solid: int = 0) -> SimState:
    # grid-rigid cache sizing: placeholder [1]-shapes when the grid
    # pipeline is off (grid_cells == 0)
    NC = max(1, grid_cells)
    KB = max(1, grid_slots)
    R = max(1, grid_rows)
    VS = max(1, grid_verts)
    NS = max(1, n_solid if grid_cells else 1)
    return SimState(
        bodies=bodies,
        time_scale=jnp.asarray(1.0, dtype),
        base_time_accel=jnp.asarray(1.0, dtype),
        tick=jnp.asarray(0, jnp.int32),
        warm_normal=jnp.zeros((max_pairs, max_contacts), dtype),
        warm_tangent=jnp.zeros((max_pairs, max_contacts), dtype),
        warm_ia=jnp.full((max_pairs,), -1, jnp.int32),
        warm_ib=jnp.full((max_pairs,), -1, jnp.int32),
        warm_pt=jnp.full((max_pairs, max_contacts, 2), 1e30, dtype),
        warm_n=jnp.zeros((max_pairs, 2), dtype),
        bp_ia=jnp.full((max_pairs,), -1, jnp.int32),
        bp_ib=jnp.full((max_pairs,), -1, jnp.int32),
        bp_anchor_pos=jnp.full_like(bodies.pos, jnp.inf),
        bp_anchor_ang=jnp.full_like(bodies.angle, jnp.inf),
        rg_flat=jnp.full((NS,), -1, jnp.int32),
        rg_table=jnp.full((NC * KB,), n_solid, jnp.int32),
        rg_ka=jnp.zeros((NC, R), jnp.int32),
        rg_kb=jnp.zeros((NC, R), jnp.int32),
        rg_valid=jnp.zeros((NC, R), bool),
        rg_verts=jnp.zeros((NC * KB, VS, 2), dtype),
        rg_nverts=jnp.zeros((NC * KB,), jnp.int32),
        rg_radius=jnp.zeros((NC * KB,), dtype),
        rg_iscirc=jnp.zeros((NC * KB,), bool),
        rg_invm=jnp.zeros((NC * KB,), dtype),
        rg_invi=jnp.zeros((NC * KB,), dtype),
        rg_warm_n=jnp.zeros((NC, R, max_contacts), dtype),
        rg_warm_t=jnp.zeros((NC, R, max_contacts), dtype),
        rg_warm_pt=jnp.full((NC, R, max_contacts, 2), 1e30, dtype),
        rg_warm_nrm=jnp.zeros((NC, R, 2), dtype),
    )


def to_numpy(tree):
    return jax.tree.map(np.asarray, tree)

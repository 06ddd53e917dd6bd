"""Trivially-vectorizable systems: Movement, BasicGravity, Boundary,
Rotation, Sleep, Dampening.

Each ``make_*`` returns a pure ``SimState -> SimState`` function specialized
on the static scene spec + config (the reference pushes configs into system
objects at scenario selection, src/sim.cpp:41-79; here they become compile
time constants). Per-entity branching in the reference's loops becomes
``jnp.where`` on masks.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.config import ScenarioSystemConfig
from ..core.constants import PI, Phase
from ..scene import SceneSpec
from ..state import SimState


def make_movement(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """pos += vel*dt for non-boundary, non-liquid entities.

    dt deliberately ignores the runtime timeScale, matching the reference
    quirk (reference: src/systems/movement.cpp:16-17 vs gravity.cpp:28-31).
    reference: src/systems/movement.cpp:13-39.
    """
    sh = cfg.shared
    dt = sh.seconds_per_tick * sh.time_acceleration

    def step(state: SimState) -> SimState:
        b = state.bodies
        mask = b.active & ~b.boundary & (b.phase != int(Phase.LIQUID))
        pos = jnp.where(mask[:, None], b.pos + b.vel * dt, b.pos)
        return state.replace(bodies=b.replace(pos=pos))

    return step


def make_gravity(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """Uniform ``vel.y += g*dt`` (screen-down is +y).

    The reference's per-tick planetary-mass scan (src/systems/gravity.cpp:38-50)
    is resolved at build time: masses are immutable at runtime, so the
    auto-disable is a static decision. Returns ``None`` when disabled.
    reference: src/systems/gravity.cpp:19-59.
    """
    g = cfg.gravity.gravitational_acceleration
    thr = cfg.gravity.planetary_mass_threshold
    if thr > 0.0 and spec.max_nonboundary_mass >= thr:
        return None
    base_dt = cfg.shared.seconds_per_tick

    def step(state: SimState) -> SimState:
        b = state.bodies
        dt = base_dt * state.base_time_accel * state.time_scale
        mask = b.active & ~b.boundary
        vy = jnp.where(mask, b.vel[:, 1] + g * dt, b.vel[:, 1])
        return state.replace(bodies=b.replace(vel=b.vel.at[:, 1].set(vy)))

    return step


def make_boundary(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """Clamp + bounce at universe edges with margin/damping/speed cap.

    reference: src/systems/boundary.cpp:13-71.
    """
    bc = cfg.boundary
    margin = bc.margin_pixels * cfg.shared.meters_per_pixel
    size = cfg.shared.universe_size_m
    damp = bc.bounce_damping
    vmax = bc.max_speed

    def step(state: SimState) -> SimState:
        b = state.bodies
        mask = b.active & ~b.asleep
        x, y = b.pos[:, 0], b.pos[:, 1]
        vx, vy = b.vel[:, 0], b.vel[:, 1]

        lo, hi = margin, size - margin
        hit_l = x < lo
        hit_r = (~hit_l) & (x > hi)
        x2 = jnp.clip(x, lo, hi)
        vx2 = jnp.where(hit_l, jnp.abs(vx) * damp,
                        jnp.where(hit_r, -jnp.abs(vx) * damp, vx))
        hit_t = y < lo
        hit_b = (~hit_t) & (y > hi)
        y2 = jnp.clip(y, lo, hi)
        vy2 = jnp.where(hit_t, jnp.abs(vy) * damp,
                        jnp.where(hit_b, -jnp.abs(vy) * damp, vy))

        bounced = hit_l | hit_r | hit_t | hit_b
        speed = jnp.sqrt(vx2 * vx2 + vy2 * vy2)
        scale = jnp.where(bounced & (speed > vmax), vmax / jnp.maximum(speed, 1e-30), 1.0)
        vx2, vy2 = vx2 * scale, vy2 * scale

        pos = jnp.where(mask[:, None], jnp.stack([x2, y2], -1), b.pos)
        vel = jnp.where(mask[:, None], jnp.stack([vx2, vy2], -1), b.vel)
        return state.replace(bodies=b.replace(pos=pos, vel=vel))

    return step


def make_rotation(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """angle += omega*dt, angular damping, omega clamp, single-step wrap.

    reference: src/systems/rotation.cpp:17-60.
    """
    rc = cfg.rotation
    base_dt = cfg.shared.seconds_per_tick
    two_pi = 2.0 * PI

    def step(state: SimState) -> SimState:
        b = state.bodies
        dt = base_dt * state.base_time_accel * state.time_scale
        mask = b.active & ~b.boundary
        ang = b.angle + b.omega * dt
        om = b.omega
        if rc.angular_damping < 1.0:
            om = om * rc.angular_damping
        if rc.max_angular_speed > 0:
            om = jnp.clip(om, -rc.max_angular_speed, rc.max_angular_speed)
        # Single-step normalization, exactly as the reference does it
        ang = jnp.where(ang > two_pi, ang - two_pi, ang)
        ang = jnp.where(ang < 0.0, ang + two_pi, ang)
        return state.replace(bodies=b.replace(
            angle=jnp.where(mask, ang, b.angle),
            omega=jnp.where(mask, om, b.omega)))

    return step


def make_sleep(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """Sleep counter bookkeeping; sleeping zeroes velocities.

    reference: src/systems/sleep.cpp:19-70.
    """
    sc = cfg.sleep

    def step(state: SimState) -> SimState:
        b = state.bodies
        mask = b.active & b.has_sleep & ~b.boundary
        speed = jnp.sqrt((b.vel ** 2).sum(-1))
        can_rot = b.inertia > 0
        ang_speed = jnp.where(can_rot, jnp.abs(b.omega), 0.0)
        slow = (speed < sc.linear_sleep_threshold) & \
               (ang_speed < sc.angular_sleep_threshold)

        counter = jnp.where(mask & slow & ~b.asleep, b.sleep_counter + 1,
                            jnp.where(mask & ~slow, 0, b.sleep_counter))
        asleep = jnp.where(
            mask, jnp.where(slow,
                            b.asleep | (counter > sc.sleep_frames_threshold),
                            False),
            b.asleep)
        vel = jnp.where((mask & asleep)[:, None], 0.0, b.vel)
        omega = jnp.where(mask & asleep & can_rot, 0.0, b.omega)
        return state.replace(bodies=b.replace(
            vel=vel, omega=omega, asleep=asleep, sleep_counter=counter))

    return step


def make_dampening(spec: SceneSpec, cfg: ScenarioSystemConfig):
    """Uniform velocity damping. Dead code in the reference (declared but
    never added to the system list, src/sim.cpp:107-114); provided for API
    completeness and opt-in use. reference: src/systems/dampening.cpp:19-40.
    """
    k = cfg.dampening.linear_damping

    def step(state: SimState) -> SimState:
        b = state.bodies
        mask = b.active
        vel = jnp.where(mask[:, None], b.vel * k, b.vel)
        omega = jnp.where(mask, b.omega * k, b.omega)
        return state.replace(bodies=b.replace(vel=vel, omega=omega))

    return step

"""Checkpoint / resume: SimState <-> npz on disk.

The reference has no persistence at all (SURVEY.md §5 — only reset/pause/
step). State-as-pytree makes it trivial and it is required infrastructure for
golden-trajectory testing.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..state import Bodies, SimState


def _flatten(tree, prefix=""):
    out = {}
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            out.update(_flatten(getattr(tree, f.name), f"{prefix}{f.name}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_state(path: str, state: SimState) -> None:
    np.savez_compressed(path, **_flatten(state))


def load_state(path: str, dtype=jnp.float32) -> SimState:
    """Missing state fields (e.g. warm-start caches added after a
    checkpoint was written) fall back to their make_state initializers so
    old checkpoints stay loadable — resuming merely cold-starts the new
    caches, which is always a valid solver state."""
    from ..state import make_state

    z = np.load(path)
    bfields = {f.name: jnp.asarray(z[f"bodies.{f.name}"])
               for f in dataclasses.fields(Bodies)}
    bodies = Bodies(**bfields)
    mp, mc = (z["warm_normal"].shape if "warm_normal" in z else (1, 8))
    defaults = make_state(bodies, max_pairs=int(mp), max_contacts=int(mc),
                          dtype=dtype)
    sfields = {f.name: (jnp.asarray(z[f.name]) if f.name in z
                        else getattr(defaults, f.name))
               for f in dataclasses.fields(SimState) if f.name != "bodies"}
    return SimState(bodies=bodies, **sfields)

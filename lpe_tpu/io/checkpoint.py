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
    z = np.load(path)
    def get(name):
        return jnp.asarray(z[name])
    bfields = {f.name: get(f"bodies.{f.name}")
               for f in dataclasses.fields(Bodies)}
    sfields = {f.name: get(f.name) for f in dataclasses.fields(SimState)
               if f.name != "bodies"}
    return SimState(bodies=Bodies(**bfields), **sfields)

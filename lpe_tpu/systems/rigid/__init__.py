"""Rigid-body pipeline (implemented in pipeline.py; wired here)."""
from __future__ import annotations


def make_rigid(spec, cfg):
    if spec.n_solid < 2:
        return None
    from .pipeline import make_rigid_system
    return make_rigid_system(spec, cfg)

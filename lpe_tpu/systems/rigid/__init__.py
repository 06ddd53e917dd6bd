"""Rigid-body pipeline (list pipeline in pipeline.py, grid-resident big-
scene pipeline in grid_pipeline.py; wired here)."""
from __future__ import annotations


def make_rigid(spec, cfg):
    if spec.n_solid < 2:
        return None
    from .grid_pipeline import grid_dims, make_grid_rigid_system
    if grid_dims(spec, cfg) is not None:
        return make_grid_rigid_system(spec, cfg)
    from .pipeline import make_rigid_system
    return make_rigid_system(spec, cfg)

"""Shared test helpers."""
import dataclasses


def light_cfg(cfg, k: int = 16):
    """Shrink the SPH per-cell occupancy cap so CPU-backend tests stay cheap.

    The dense neighbor tensors scale with k^2; the reference contract is a
    64-cap with silent overflow drop (fluid_kernels.metal:60), so a smaller
    cap is the same approximation class — tests that depend on full neighbor
    sets (oracle comparisons) pick k large enough for their packing.
    """
    grid = dataclasses.replace(cfg.fluid.grid, max_per_cell=k)
    return cfg.replace(fluid=dataclasses.replace(cfg.fluid, grid=grid))

"""Spatial row-band sharding with ppermute halo exchange (parallel/halo.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_halo_density_matches_brute_force():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    from jax.sharding import Mesh
    from lpe_tpu.parallel.halo import make_halo_density
    from lpe_tpu.systems.fluid.sph import poly6_coeff_2d

    ny, nx, K, h = 16, 16, 4, 0.05
    cell = h
    nxp = nx + 2
    rng = np.random.default_rng(0)
    # scatter particles into random grid slots; positions inside their cell
    x = np.zeros((ny, K, nxp), np.float32)
    y = np.zeros_like(x)
    m = np.zeros_like(x)
    occ = np.zeros_like(x)
    pts = []
    for _ in range(120):
        r, k, c = rng.integers(0, ny), rng.integers(0, K), rng.integers(1, nxp - 1)
        if occ[r, k, c]:
            continue
        px = (c - 1 + rng.random()) * cell
        py = (r + rng.random()) * cell
        x[r, k, c], y[r, k, c] = px, py
        m[r, k, c] = 0.005
        occ[r, k, c] = 1.0
        pts.append((r, k, c, px, py))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    density = make_halo_density(ny, nx, K, h, mesh)
    rho = np.asarray(density(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m),
                             jnp.asarray(occ)))

    poly6 = poly6_coeff_2d(h)
    for r, k, c, px, py in pts[:40]:
        expect = 0.0
        for r2, k2, c2, qx, qy in pts:
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 < h * h and abs(r2 - r) <= 1 and abs(c2 - c) <= 1:
                expect += 0.005 * poly6 * (h * h - d2) ** 3
        assert np.isclose(rho[r, k, c], expect, rtol=1e-4), (r, k, c)
    # empty slots stay zero
    assert rho[occ == 0].max() == 0.0

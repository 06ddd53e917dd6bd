"""Parity: the fused Pallas narrowphase (ops/pallas_rigid.py, interpret
mode) must reproduce the XLA pair `sat_contact` + `_pair_contacts` on
random convex-polygon rows — same hit set, same axis/penetration, same
2-point manifold (the grid pipeline swaps one for the other wholesale)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpe_tpu.ops.pallas_rigid import make_narrowphase
from lpe_tpu.systems.rigid import geometry as geo
from lpe_tpu.systems.rigid.pipeline import _pair_contacts


def _random_polys(n, V, seed, spread=1.0):
    rng = np.random.default_rng(seed)
    nv = rng.integers(3, V + 1, n)
    ang = rng.uniform(0, 2 * np.pi, (n, V))
    ang = np.sort(ang, axis=1)                       # convex (CCW) rings
    rad = rng.uniform(0.2, 0.6, (n, V))
    verts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    vm = np.arange(V)[None, :] < nv[:, None]
    verts = np.where(vm[..., None], verts, 0.0)
    return dict(
        pos=jnp.asarray(rng.uniform(-spread, spread, (n, 2)), jnp.float32),
        angle=jnp.asarray(rng.uniform(0, 2 * np.pi, n), jnp.float32),
        verts=jnp.asarray(verts, jnp.float32),
        nverts=jnp.asarray(nv, jnp.int32),
        vmask=jnp.asarray(vm),
        is_circle=jnp.zeros(n, bool),
        radius=jnp.zeros(n, jnp.float32),
    )


@pytest.mark.parametrize("spread", [0.3, 1.5])
def test_narrowphase_kernel_matches_xla(spread):
    V, N = 8, 257                                   # odd: exercises padding
    sa = _random_polys(N, V, seed=1, spread=spread)
    sb = _random_polys(N, V, seed=2, spread=spread)

    hit_x, nrm_x, pen_x = jax.vmap(
        lambda a, b: geo.sat_contact(a, b, any_circle=False))(sa, sb)
    pts_x, pens_x, cval_x = jax.vmap(
        lambda a, b, n_, p_: _pair_contacts(a, b, n_, p_, 2))(
            sa, sb, nrm_x, pen_x)

    narrow = make_narrowphase(V, interpret=True)
    hit_k, nrm_k, pen_k, pts_k, pens_k, cval_k = narrow(sa, sb)

    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_x))
    h = np.asarray(hit_x)
    assert h.any() and (~h).any()                   # both regimes exercised
    np.testing.assert_allclose(np.asarray(nrm_k)[h], np.asarray(nrm_x)[h],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pen_k)[h], np.asarray(pen_x)[h],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cval_k)[h],
                                  np.asarray(cval_x)[h])
    cv = np.asarray(cval_x) & h[:, None]
    np.testing.assert_allclose(np.asarray(pts_k)[cv], np.asarray(pts_x)[cv],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pens_k)[cv],
                               np.asarray(pens_x)[cv], atol=1e-4)


def _grid_scene(backend):
    from lpe_tpu.core import constants as C
    from lpe_tpu.core.config import (BroadphaseConfig, RigidBodyConfig,
                                     ScenarioSystemConfig,
                                     SharedSystemConfig)
    from lpe_tpu.core.constants import Phase, ShapeKind
    from lpe_tpu.math.polygon import (build_random_convex_polygon,
                                      calculate_polygon_inertia)
    from lpe_tpu.scene import SceneBuilder
    size = 3.0
    cfg = ScenarioSystemConfig(
        shared=SharedSystemConfig(
            universe_size_m=size, meters_per_pixel=size / C.SCREEN_LENGTH,
            seconds_per_tick=1.0 / C.STEPS_PER_SECOND,
            time_acceleration=1.0,
            grid_size=50, cell_size_pixels=C.SCREEN_LENGTH / 50),
        rigid=RigidBodyConfig(
            broadphase=BroadphaseConfig(max_pairs=4096,
                                        persist_slack_m=0.04),
            grid_pipeline="on", narrowphase_backend=backend))
    rng = np.random.default_rng(7)
    b = SceneBuilder(f"NPHASE_{backend}")
    for wall in ((0.0, size / 2, 0.05, size / 2),
                 (size, size / 2, 0.05, size / 2),
                 (size / 2, 0.0, size / 2, 0.05),
                 (size / 2, size, size / 2, 0.05)):
        b.add_wall(*wall)
    for _ in range(96):
        sz = rng.uniform(0.05, 0.12)
        verts = build_random_convex_polygon(rng, sz)
        mass = max(0.1, rng.normal(1.0, 0.1))
        b.add(pos=(rng.uniform(size * 0.1, size * 0.9),
                   rng.uniform(size * 0.1, size * 0.9)),
              vel=(rng.uniform(-1, 1), rng.uniform(-1, 1)),
              mass=mass, phase=int(Phase.SOLID),
              shape_kind=int(ShapeKind.POLYGON), radius=sz, verts=verts,
              inertia=calculate_polygon_inertia(verts, mass),
              omega=rng.uniform(-1, 1))
    return b.finalize(cfg)


def test_grid_pipeline_backends_agree():
    """End-to-end: the grid rigid pipeline with narrowphase_backend=pallas
    (interpret on CPU) must track the xla backend's trajectory."""
    from lpe_tpu.systems import build_run_fn
    states = {}
    for backend in ("xla", "pallas"):
        sc = _grid_scene(backend)
        run = build_run_fn(sc.spec, sc.cfg, ticks=12, donate=False)
        states[backend] = run(sc.state)
    pa = np.asarray(states["pallas"].bodies.pos)
    px = np.asarray(states["xla"].bodies.pos)
    assert np.isfinite(pa).all()
    np.testing.assert_allclose(pa, px, atol=2e-3)

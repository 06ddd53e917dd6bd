"""GJK/EPA/clipping tests on analytically-known shape pairs
(reference math: src/systems/rigid/{gjk,epa,narrowphase}.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lpe_tpu.core.constants import MAX_POLY_VERTS
from lpe_tpu.systems.rigid import geometry as geo


def shape_circle(x, y, r, dtype=jnp.float64):
    V = MAX_POLY_VERTS
    return dict(pos=jnp.array([x, y], dtype), angle=jnp.asarray(0.0, dtype),
                is_circle=jnp.asarray(True), radius=jnp.asarray(r, dtype),
                verts=jnp.zeros((V, 2), dtype),
                vmask=jnp.zeros(V, bool), nverts=jnp.asarray(0, jnp.int32))


def shape_box(x, y, hw, hh, angle=0.0, dtype=jnp.float64):
    V = MAX_POLY_VERTS
    v = np.zeros((V, 2))
    v[:4] = [[-hw, -hh], [-hw, hh], [hw, hh], [hw, -hh]]
    m = np.zeros(V, bool)
    m[:4] = True
    return dict(pos=jnp.array([x, y], dtype), angle=jnp.asarray(angle, dtype),
                is_circle=jnp.asarray(False), radius=jnp.asarray(hw, dtype),
                verts=jnp.asarray(v, dtype), vmask=jnp.asarray(m),
                nverts=jnp.asarray(4, jnp.int32))


@pytest.fixture(autouse=True)
def _x64():
    import jax
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_gjk_circle_circle():
    a = shape_circle(0, 0, 1.0)
    hit, _ = geo.gjk(a, shape_circle(1.5, 0, 1.0))
    assert bool(hit)
    hit, _ = geo.gjk(a, shape_circle(2.5, 0, 1.0))
    assert not bool(hit)
    # touching-ish (just inside)
    hit, _ = geo.gjk(a, shape_circle(1.99, 0, 1.0))
    assert bool(hit)


def test_gjk_box_box():
    a = shape_box(0, 0, 1, 1)
    assert bool(geo.gjk(a, shape_box(1.5, 0, 1, 1))[0])
    assert not bool(geo.gjk(a, shape_box(2.5, 0, 1, 1))[0])
    assert bool(geo.gjk(a, shape_box(1.9, 1.9, 1, 1))[0])       # corner overlap
    assert not bool(geo.gjk(a, shape_box(2.9, 2.9, 1, 1, angle=0.0))[0])
    # rotated box: 45deg box reaches sqrt(2) along axes
    assert bool(geo.gjk(a, shape_box(2.3, 0, 1, 1, angle=np.pi / 4))[0])


def test_gjk_circle_box():
    a = shape_box(0, 0, 1, 1)
    assert bool(geo.gjk(a, shape_circle(1.8, 0, 1.0))[0])
    assert not bool(geo.gjk(a, shape_circle(2.1, 0, 1.0))[0])


def test_epa_circle_penetration_depth():
    a = shape_circle(0, 0, 1.0)
    b = shape_circle(1.2, 0, 1.0)
    hit, simplex = geo.gjk(a, b)
    assert bool(hit)
    valid, n, pen = geo.epa(a, b, simplex)
    assert bool(valid)
    # normal points from A to B along +x; penetration = r1+r2-d = 0.8
    assert np.isclose(float(pen), 0.8, atol=1e-6)
    assert np.isclose(abs(float(n[0])), 1.0, atol=1e-6)


def test_epa_box_penetration_depth():
    a = shape_box(0, 0, 1, 1)
    b = shape_box(1.7, 0, 1, 1)
    hit, simplex = geo.gjk(a, b)
    valid, n, pen = geo.epa(a, b, simplex)
    assert bool(valid)
    assert np.isclose(float(pen), 0.3, atol=1e-6)
    assert np.isclose(abs(float(n[0])), 1.0, atol=1e-6)
    assert abs(float(n[1])) < 1e-6


def test_polygon_clipping_box_on_box():
    # box B resting on top face of A, offset right: clipped manifold should
    # produce contacts spanning the overlap segment with positive penetration
    a = shape_box(0, 0, 1, 1)
    b = shape_box(0.5, -1.9, 1, 1)  # overlapping A's top face (y-down world)
    hit, simplex = geo.gjk(a, b)
    assert bool(hit)
    valid, n, pen = geo.epa(a, b, simplex)
    assert bool(valid)
    pts, pens, cvalid = geo.polygon_contacts(a, b, n, 8)
    pts = np.asarray(pts)[np.asarray(cvalid)]
    pns = np.asarray(pens)[np.asarray(cvalid)]
    assert len(pts) >= 2
    # contact points lie on/near A's top face y=-1, within the overlap x-range
    assert (pts[:, 1] >= -1.2).all() and (pts[:, 1] <= -0.85).all()
    assert pns.max() <= 0.2 and pns.max() >= 0.0


def test_support_rotated_box():
    s = shape_box(0, 0, 1, 0.5, angle=np.pi / 2)
    p = geo.support_shape(s, jnp.array([1.0, 0.0], jnp.float64))
    # after 90deg rotation, half-height 0.5 lies along x
    assert np.isclose(float(p[0]), 0.5, atol=1e-9)

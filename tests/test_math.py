"""Unit tests for host-side polygon math (reference: include/math/polygon.hpp)."""
import numpy as np

from lpe_tpu.math.polygon import (build_random_convex_polygon,
                                  build_random_polygon, build_regular_polygon,
                                  calculate_polygon_inertia,
                                  polygon_bounding_radius)


def _shoelace(v):
    j = np.roll(v, -1, axis=0)
    return 0.5 * np.sum(v[:, 0] * j[:, 1] - v[:, 1] * j[:, 0])


def test_regular_polygon_geometry():
    v = build_regular_polygon(6, 2.0)
    assert v.shape == (6, 2)
    assert np.allclose(np.linalg.norm(v, axis=1), 2.0)
    # screen-coords CCW = negative mathematical orientation is NOT required;
    # the reference negates y, giving positive shoelace area in y-down coords
    assert _shoelace(v) < 0  # y negated -> clockwise in math coords


def test_square_inertia_matches_analytic():
    # Square of half-side a: I = (2/3) m a^2 about center
    a, m = 1.5, 3.0
    v = np.array([[-a, -a], [a, -a], [a, a], [-a, a]], float)
    analytic = (2.0 / 3.0) * m * a * a
    assert np.isclose(calculate_polygon_inertia(v, m), analytic, rtol=1e-12)


def test_ngon_inertia_approaches_disc():
    # Many-sided regular polygon -> disc inertia 0.5 m r^2
    m, r = 2.0, 1.0
    v = build_regular_polygon(256, r)
    assert np.isclose(calculate_polygon_inertia(v, m), 0.5 * m * r * r,
                      rtol=1e-3)


def test_random_polygons_shapes():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = build_random_convex_polygon(rng, 1.0)
        assert 3 <= len(v) <= 7
        assert polygon_bounding_radius(v) <= 1.0 + 1e-12
        w = build_random_polygon(rng, 1.0)
        assert 5 <= len(w) <= 10
        # sorted by angle around centroid -> simple polygon with finite area
        assert abs(_shoelace(w)) > 0

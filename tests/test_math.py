"""Unit tests for host-side polygon math, coordinates, and debug stats
(reference: include/math/polygon.hpp, include/core/{coordinates,debug}.hpp)."""
import numpy as np


def test_coordinates_roundtrip():
    """reference: include/core/coordinates.hpp:16-93."""
    from lpe_tpu.core.config import SharedSystemConfig
    from lpe_tpu.core.coordinates import Coordinates
    c = Coordinates(SharedSystemConfig(universe_size_m=6.0,
                                       meters_per_pixel=0.01))
    assert c.meters_to_pixels(3.0) == 300.0
    assert c.pixels_to_meters(300.0) == 3.0
    assert c.meters_to_normalized(3.0) == 0.5
    assert c.normalized_to_meters(0.5) == 3.0
    assert c.pixels_per_meter == 100.0


def test_debug_stats_accumulators():
    """reference: include/core/debug.hpp:22-50."""
    from lpe_tpu.core.debug import DebugStats
    d = DebugStats(enabled=True)
    d.update_forces(np.array([1.0, 3.0, 2.0]))
    d.update_movement(np.array([[3.0, 4.0], [0.0, 0.0]]))
    assert d.max_force == 3.0 and d.force_count == 3
    assert d.max_speed == 5.0
    assert d.moving_particles == 1 and d.total_particles == 2
    assert "max_speed" in d.report()
    d2 = DebugStats()                 # disabled by default, like the
    d2.update_forces([9.0])           # reference's ENABLE_DEBUG 0
    assert d2.force_count == 0

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

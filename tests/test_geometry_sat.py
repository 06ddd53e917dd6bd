"""SAT narrowphase (geometry.sat_contact) vs the exact float64 SAT oracle
and vs GJK/EPA: the grid rigid pipeline replaces the iterative GJK->EPA with
closed-form SAT (for 2D convex polygons the minimum-translation direction is
always a face normal, so the converged answers agree; reference computes the
same quantity iteratively, src/systems/rigid/epa.cpp:31-119)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpe_tpu.systems.rigid import geometry as geo

from test_geometry_adversarial import (_rand_poly, _shape, _sweep, _world,
                                       _sat_depth, MARGIN, DEPTH_TOL)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _sat_batch(shapes_a, shapes_b, any_circle=True):
    stack = lambda ds: {k: jnp.stack([d[k] for d in ds]) for k in ds[0]}
    sa, sb = stack(shapes_a), stack(shapes_b)

    @jax.jit
    def run(sa, sb):
        return jax.vmap(
            lambda a, b: geo.sat_contact(a, b, any_circle=any_circle))(sa, sb)

    hit, n, pen = run(sa, sb)
    return np.asarray(hit), np.asarray(n), np.asarray(pen)


def test_sat_poly_pairs_vs_oracle():
    """1000 random 8-16-gon pairs: hit must equal exact SAT overlap and the
    depth must match the exact MTV depth (closed form: tighter than EPA)."""
    sas, sbs, worlds, depth = _sweep(seed=11, n_pairs=1000, offset_scale=1.6)
    hit, n, pen = _sat_batch(sas, sbs, any_circle=False)
    decided = np.abs(depth) > MARGIN
    assert decided.sum() > 800
    np.testing.assert_array_equal(hit[decided], depth[decided] > 0)
    ov = decided & (depth > 0)
    err = np.abs(pen[ov] - depth[ov])
    assert err.max() < DEPTH_TOL, f"SAT depth error {err.max():.2e}"
    assert np.allclose(np.hypot(n[ov, 0], n[ov, 1]), 1.0, atol=1e-9)
    # the normal must separate: push B by n*pen and re-measure
    for i in np.nonzero(ov)[0][:60]:
        wa, wb = worlds[i]
        after = _sat_depth(wa, wb + n[i] * (pen[i] + 1e-9))
        assert after < 5e-3, f"pair {i}: residual depth {after}"


def test_sat_matches_gjk_epa_normals():
    """On overlapping pairs the SAT normal and the EPA normal must agree
    (same MTV axis) up to sign-free tolerance, and depths must match."""
    sas, sbs, _, depth = _sweep(seed=23, n_pairs=200, offset_scale=0.15)
    hit_s, n_s, pen_s = _sat_batch(sas, sbs, any_circle=False)

    stack = lambda ds: {k: jnp.stack([d[k] for d in ds]) for k in ds[0]}
    sa, sb = stack(sas), stack(sbs)

    @jax.jit
    def run(sa, sb):
        def one(a, b):
            hit, simplex = geo.gjk(a, b)
            valid, n, pen = geo.epa(a, b, simplex)
            return hit & valid, n, pen
        return jax.vmap(one)(sa, sb)

    hit_e, n_e, pen_e = map(np.asarray, run(sa, sb))
    ov = depth > MARGIN
    assert (hit_s[ov] == hit_e[ov]).all()
    np.testing.assert_allclose(pen_s[ov], pen_e[ov], atol=5e-4)
    # MTV axis agreement (ties between equal-depth axes allowed a flip)
    dots = (n_s[ov] * n_e[ov]).sum(-1)
    assert (dots > 0.999).mean() > 0.95


def test_sat_circle_cases():
    """Circle-circle and circle-polygon closed forms: penetration and the
    A->B normal orientation against hand-computable configurations."""
    def circ(pos, r):
        return dict(pos=jnp.asarray(np.asarray(pos, np.float64)),
                    angle=jnp.asarray(0.0, jnp.float64),
                    is_circle=jnp.asarray(True),
                    radius=jnp.asarray(float(r), jnp.float64),
                    verts=jnp.zeros((16, 2), jnp.float64),
                    vmask=jnp.zeros(16, bool),
                    nverts=jnp.asarray(0, jnp.int32))

    sq = np.array([[-1., -1.], [-1., 1.], [1., 1.], [1., -1.]])

    # circle-circle: A at origin r=1, B at (1.5, 0) r=1 -> pen 0.5, n=(1,0)
    hit, n, pen = map(np.asarray, geo.sat_contact(circ((0, 0), 1.0),
                                                  circ((1.5, 0), 1.0)))
    assert hit and abs(pen - 0.5) < 1e-12
    np.testing.assert_allclose(n, [1.0, 0.0], atol=1e-12)

    # poly A (unit square) vs circle B outside near the right face:
    # center (1.3, 0) r=0.5 -> pen 0.2, n=(1,0) (A->B)
    hit, n, pen = map(np.asarray, geo.sat_contact(_shape(sq, (0, 0)),
                                                  circ((1.3, 0.0), 0.5)))
    assert hit and abs(pen - 0.2) < 1e-9
    np.testing.assert_allclose(n, [1.0, 0.0], atol=1e-9)

    # circle A inside poly B: deepest face push-out
    hit, n, pen = map(np.asarray, geo.sat_contact(circ((0.7, 0.0), 0.1),
                                                  _shape(sq, (0, 0))))
    assert hit and abs(pen - (0.1 + 0.3)) < 1e-9
    # A->B points from the circle INTO the square interior: -x
    np.testing.assert_allclose(n, [-1.0, 0.0], atol=1e-9)

    # separated circle-poly
    hit, n, pen = map(np.asarray, geo.sat_contact(_shape(sq, (0, 0)),
                                                  circ((2.0, 0.0), 0.5)))
    assert not hit


def test_sat_needles_and_tiny():
    rng = np.random.default_rng(5)
    sas, sbs, depths = [], [], []
    for _ in range(150):
        va = _rand_poly(rng)
        vb = _rand_poly(rng) * np.array([1.0, 0.01])
        pb = rng.uniform(-1.0, 1.0, 2)
        ang = rng.uniform(0, 2 * np.pi)
        sas.append(_shape(va, np.zeros(2)))
        sbs.append(_shape(vb, pb, ang))
        depths.append(_sat_depth(_world(va, np.zeros(2)),
                                 _world(vb, pb, ang)))
    depth = np.asarray(depths)
    hit, n, pen = _sat_batch(sas, sbs, any_circle=False)
    decided = np.abs(depth) > 2e-4
    np.testing.assert_array_equal(hit[decided], depth[decided] > 0)
    ov = decided & (depth > 0)
    if ov.any():
        assert np.abs(pen[ov] - depth[ov]).max() < DEPTH_TOL

"""Adversarial GJK/EPA hardening: seeded random convex 8-16-gon pairs vs an
exact float64 SAT oracle, deep-penetration EPA cap pressure, and
near-degenerate (needle / tiny) shapes.

The reference caps GJK/EPA at 100 iterations (gjk.cpp:99, epa.cpp:58); the
rebuild runs masked fixed-iteration loops (geometry.py GJK_ITERS=32 /
EPA_ITERS=24). These sweeps are the data behind those caps: every
overlapping pair must agree with the exact minimum-translation depth, and
every separated pair must miss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpe_tpu.core.constants import MAX_POLY_VERTS
from lpe_tpu.systems.rigid import geometry as geo


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# float64 oracle: exact SAT minimum-translation depth for convex polygons
# ---------------------------------------------------------------------------
def _sat_depth(A: np.ndarray, B: np.ndarray) -> float:
    """Exact signed clearance: >0 = penetration depth (MTV length),
    <=0 = separated (largest separating gap as negative)."""
    best = np.inf
    for P in (A, B):
        n = len(P)
        for i in range(n):
            e = P[(i + 1) % n] - P[i]
            ax = np.array([-e[1], e[0]], np.float64)
            ln = np.hypot(ax[0], ax[1])
            if ln < 1e-30:
                continue
            ax /= ln
            pa = A @ ax
            pb = B @ ax
            # per-axis minimum translation: push B up or down along the
            # axis (NOT the interval intersection length — for CONTAINED
            # projections the push is larger than the overlap)
            ov = min(pa.max() - pb.min(), pb.max() - pa.min())
            best = min(best, ov)
    return float(best)


def _hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain, engine winding (math-CW: the builders emit
    angle-increasing-with -sin, math/polygon.py:16-34)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cr(a, b):
        return a[0] * b[1] - a[1] * b[0]

    def half(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and cr(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ccw = np.asarray(lower[:-1] + upper[:-1])
    return ccw[::-1]                              # engine winding


def _rand_poly(rng, nmin=8, nmax=16, scale=1.0):
    """Random convex polygon with nmin..nmax vertices (hull of a point
    cloud, resampled until the count lands in range)."""
    for _ in range(80):
        h = _hull(rng.uniform(-scale, scale, (48, 2)))
        if nmin <= len(h) <= nmax:
            return h
    return h[:nmax] if len(h) > nmax else h       # pragma: no cover


def _shape(verts: np.ndarray, pos, angle=0.0):
    V = MAX_POLY_VERTS
    v = np.zeros((V, 2))
    m = np.zeros(V, bool)
    v[:len(verts)] = verts
    m[:len(verts)] = True
    return dict(pos=jnp.asarray(np.asarray(pos, np.float64)),
                angle=jnp.asarray(angle, jnp.float64),
                is_circle=jnp.asarray(False),
                radius=jnp.asarray(float(np.abs(verts).max()), jnp.float64),
                verts=jnp.asarray(v, jnp.float64), vmask=jnp.asarray(m),
                nverts=jnp.asarray(len(verts), jnp.int32))


def _world(verts, pos, angle=0.0):
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    return verts @ R.T + np.asarray(pos)


def _gjk_epa_batch(shapes_a, shapes_b):
    stack = lambda ds: {k: jnp.stack([d[k] for d in ds]) for k in ds[0]}
    sa, sb = stack(shapes_a), stack(shapes_b)

    @jax.jit
    def run(sa, sb):
        def one(a, b):
            hit, simplex = geo.gjk(a, b)
            valid, n, pen = geo.epa(a, b, simplex)
            return hit, valid, n, pen
        return jax.vmap(one)(sa, sb)

    hit, valid, n, pen = run(sa, sb)
    return (np.asarray(hit), np.asarray(valid), np.asarray(n),
            np.asarray(pen))


def _sweep(seed, n_pairs, offset_scale, angle=True, scale_b=1.0):
    """Build n_pairs random polygon pairs; return (shapes, world verts,
    exact SAT clearances)."""
    rng = np.random.default_rng(seed)
    sas, sbs, depths, worlds = [], [], [], []
    for _ in range(n_pairs):
        va = _rand_poly(rng)
        vb = _rand_poly(rng, scale=scale_b)
        pa = rng.uniform(-0.2, 0.2, 2)
        pb = pa + rng.uniform(-offset_scale, offset_scale, 2)
        aa = rng.uniform(0, 2 * np.pi) if angle else 0.0
        ab = rng.uniform(0, 2 * np.pi) if angle else 0.0
        wa, wb = _world(va, pa, aa), _world(vb, pb, ab)
        sas.append(_shape(va, pa, aa))
        sbs.append(_shape(vb, pb, ab))
        worlds.append((wa, wb))
        depths.append(_sat_depth(wa, wb))
    return sas, sbs, worlds, np.asarray(depths)


MARGIN = 2e-3      # skip knife-edge pairs: |clearance| below this is a tie
DEPTH_TOL = 1e-4   # |epa_pen - sat_depth| bound (abs, shapes ~unit scale;
#                    measured: f64 EPA converges to ~1e-15 on every pair of
#                    all three sweeps — this bound is pure safety margin)


def test_random_polygon_pairs_vs_sat_oracle():
    """1000 seeded random 8-16-gon pairs spanning separated / shallow /
    deep: GJK hit must equal exact SAT overlap, and EPA's penetration must
    match the exact MTV depth."""
    sas, sbs, _, depth = _sweep(seed=11, n_pairs=1000, offset_scale=1.6)
    hit, valid, n, pen = _gjk_epa_batch(sas, sbs)
    decided = np.abs(depth) > MARGIN
    assert decided.sum() > 800                    # the margin skips few
    np.testing.assert_array_equal(hit[decided], depth[decided] > 0,
                                  err_msg="GJK disagrees with exact SAT")
    ov = decided & (depth > 0)
    assert valid[ov].all(), "EPA must be valid on every overlapping pair"
    err = np.abs(pen[ov] - depth[ov])
    assert err.max() < DEPTH_TOL, (
        f"EPA depth error max {err.max():.2e} (p99 "
        f"{np.percentile(err, 99):.2e}) exceeds {DEPTH_TOL}")
    # unit normals
    assert np.allclose(np.hypot(n[ov, 0], n[ov, 1]), 1.0, atol=1e-9)


def test_epa_deep_penetration_cap_pressure():
    """Nearly-coincident 14-16-gons (the Minkowski sum has ~30 faces —
    the worst case for EPA's fixed insertion budget): depth must still
    match SAT. reference: epa.cpp:58 runs to 100 iterations."""
    sas, sbs, _, depth = _sweep(seed=23, n_pairs=200, offset_scale=0.15)
    hit, valid, n, pen = _gjk_epa_batch(sas, sbs)
    ov = depth > MARGIN
    assert ov.sum() > 150
    assert hit[ov].all() and valid[ov].all()
    err = np.abs(pen[ov] - depth[ov])
    assert err.max() < DEPTH_TOL, f"deep-pen EPA error {err.max():.2e}"


def test_epa_mtv_separates():
    """Moving B by the EPA normal * penetration must separate the pair
    (orientation check: the returned normal points A -> B)."""
    sas, sbs, worlds, depth = _sweep(seed=37, n_pairs=120, offset_scale=0.8)
    hit, valid, n, pen = _gjk_epa_batch(sas, sbs)
    ov = depth > MARGIN
    checked = 0
    for i in np.nonzero(ov)[0]:
        wa, wb = worlds[i]
        after = _sat_depth(wa, wb + n[i] * (pen[i] + 1e-9))
        assert after < 5e-3, (
            f"pair {i}: pushing B along the EPA normal left depth {after}")
        checked += 1
    assert checked > 80


def test_needle_and_tiny_polygons():
    """Near-degenerate shapes: 100:1 aspect needles and 1e-3-scale tiny
    polygons against unit polygons."""
    rng = np.random.default_rng(5)
    sas, sbs, depths = [], [], []
    for _ in range(150):
        va = _rand_poly(rng)
        vb = _rand_poly(rng) * np.array([1.0, 0.01])   # needle
        pa = np.zeros(2)
        pb = rng.uniform(-1.0, 1.0, 2)
        ang = rng.uniform(0, 2 * np.pi)
        sas.append(_shape(va, pa))
        sbs.append(_shape(vb, pb, ang))
        depths.append(_sat_depth(_world(va, pa), _world(vb, pb, ang)))
    for _ in range(150):
        va = _rand_poly(rng)
        vb = _rand_poly(rng, scale=1e-3)               # tiny
        pa = np.zeros(2)
        pb = rng.uniform(-0.9, 0.9, 2)
        sas.append(_shape(va, pa))
        sbs.append(_shape(vb, pb))
        depths.append(_sat_depth(_world(va, pa), _world(vb, pb)))
    depth = np.asarray(depths)
    hit, valid, n, pen = _gjk_epa_batch(sas, sbs)
    decided = np.abs(depth) > 2e-4                     # tighter shapes
    np.testing.assert_array_equal(hit[decided], depth[decided] > 0)
    ov = decided & (depth > 0)
    if ov.any():
        assert valid[ov].all()
        err = np.abs(pen[ov] - depth[ov])
        assert err.max() < DEPTH_TOL

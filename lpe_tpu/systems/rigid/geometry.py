"""Batched collision geometry: support functions, GJK, EPA, contact clipping.

TPU-native rewrite of the reference narrowphase stack
(reference: src/systems/rigid/{gjk.cpp,epa.cpp,narrowphase.cpp}). The
reference's data-dependent loops (GJK simplex mutation, EPA polytope growth,
Sutherland-Hodgman clipping with std::vector) become fixed-iteration masked
loops over fixed-capacity arrays, vmapped across candidate pairs.

Conventions match the reference:
- GJK starts from direction (1,0) and the same simplex-update case analysis
  (gjk.cpp:9-69).
- EPA returns ``penetration = d`` (the support distance, epa.cpp:103-107) and
  inserts new points after the closest edge.
- Poly-poly contact generation always picks shape A's best face as reference
  (the reference's ``chooseReference`` is hardwired to A,
  narrowphase.cpp:173-174) and clips the full incident polygon against the
  face plane and both side planes (narrowphase.cpp:204-299).
- Circles are approximated by 8-gons *only* for clipping vertices
  (narrowphase.cpp:56-67); support functions use the exact circle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...core.constants import EPSILON

# Fixed capacities
GJK_ITERS_DEFAULT = 32
EPA_ITERS_DEFAULT = 24
EPA_CAP = 3 + EPA_ITERS_DEFAULT + 1       # polytope grows by <=1 per iter
NEG = -1e30


def _rot(v, c, s):
    return jnp.stack([v[..., 0] * c - v[..., 1] * s,
                      v[..., 0] * s + v[..., 1] * c], axis=-1)


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _dot2(a, b):
    return (a * b).sum(-1)


def _select_row(rows, mask):
    """rows[i] for the first i with mask[i], as masked sum — dynamic row
    gathers are slow on TPU, first-match selects are pure vector math."""
    first = mask & (jnp.cumsum(mask, axis=0) == 1)
    return (rows * first[:, None]).sum(0)


def support_shape(shape, d):
    """Furthest point of a shape in direction ``d``.

    ``shape`` is a dict of per-shape leaves (pos[2], angle, is_circle,
    radius, verts[V,2], vmask[V]). reference: include/math/polygon.hpp:55-141.
    """
    # Circle branch (exact)
    dlen = jnp.sqrt(_dot2(d, d))
    dn = d / jnp.maximum(dlen, 1e-9)
    p_circle = shape["pos"] + dn * shape["radius"]
    # Polygon branch
    c, s = jnp.cos(shape["angle"]), jnp.sin(shape["angle"])
    w = shape["pos"][None, :] + _rot(shape["verts"], c, s)      # [V,2]
    proj = jnp.where(shape["vmask"], w @ d, NEG)
    p_poly = _select_row(w, proj == proj.max())
    return jnp.where(shape["is_circle"], p_circle, p_poly)


def support_minkowski(sa, sb, d):
    """reference: include/math/polygon.hpp:124-141."""
    return support_shape(sa, d) - support_shape(sb, -d)


def world_verts(shape, circle_samples: int = 8):
    """World-space vertex ring: rotated polygon verts, or an 8-gon sampling of
    a circle (angle-offset by the body angle), with validity mask.
    reference: src/systems/rigid/narrowphase.cpp:52-79."""
    V = shape["verts"].shape[0]
    c, s = jnp.cos(shape["angle"]), jnp.sin(shape["angle"])
    w_poly = shape["pos"][None, :] + _rot(shape["verts"], c, s)
    k = jnp.arange(V)
    ang = k * (2.0 * jnp.pi / circle_samples) + shape["angle"]
    w_circ = shape["pos"][None, :] + shape["radius"] * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=-1)
    circ_mask = k < circle_samples
    verts = jnp.where(shape["is_circle"], w_circ, w_poly)
    mask = jnp.where(shape["is_circle"], circ_mask, shape["vmask"])
    count = jnp.where(shape["is_circle"], circle_samples, shape["nverts"])
    return verts, mask, count


# ---------------------------------------------------------------------------
# GJK
# ---------------------------------------------------------------------------

def gjk(sa, sb, iters: int = GJK_ITERS_DEFAULT):
    """Boolean intersection test; returns (hit, simplex[3,2]).

    Masked fixed-iteration port of the reference loop (gjk.cpp:71-133) with
    the identical simplex case analysis (gjk.cpp:9-69).
    """
    d0 = jnp.array([1.0, 0.0], sa["pos"].dtype)
    s0 = support_minkowski(sa, sb, d0)
    miss0 = _dot2(s0, d0) < 0
    simplex = jnp.zeros((3, 2), sa["pos"].dtype).at[0].set(s0)
    state0 = dict(simplex=simplex, count=jnp.int32(1), d=-s0,
                  hit=jnp.bool_(False), miss=miss0)

    def body(_, st):
        active = ~st["hit"] & ~st["miss"]
        p = support_minkowski(sa, sb, st["d"])
        new_miss = _dot2(p, st["d"]) < 0
        # append p at index `count`
        idx = jnp.arange(3)
        simplex = jnp.where((idx == st["count"])[:, None], p, st["simplex"])
        count = st["count"] + 1

        # ---- handleSimplex ----
        # count == 2 case: points [b, a] with a = newest
        a2, b2 = simplex[1], simplex[0]
        ab2, ao2 = b2 - a2, -a2
        perp2 = jnp.stack([-ab2[1], ab2[0]])
        perp2 = jnp.where(_dot2(perp2, ao2) < 0,
                          jnp.stack([ab2[1], -ab2[0]]), perp2)
        toward = _dot2(ab2, ao2) > 0
        d_c2 = jnp.where(toward, perp2, ao2)
        simplex_c2 = jnp.where(toward, simplex, simplex.at[0].set(a2))
        count_c2 = jnp.where(toward, jnp.int32(2), jnp.int32(1))
        hit_c2 = jnp.bool_(False)

        # count == 3 case: points [c, b, a], a newest
        a3, b3, c3 = simplex[2], simplex[1], simplex[0]
        ab, ac, ao = b3 - a3, c3 - a3, -a3
        ab_p = jnp.stack([ab[1], -ab[0]])
        ab_p = jnp.where(_dot2(ab_p, ac) > 0, -ab_p, ab_p)
        ac_p = jnp.stack([ac[1], -ac[0]])
        ac_p = jnp.where(_dot2(ac_p, ab) > 0, -ac_p, ac_p)
        out_ab = (_dot2(ab, ao) > 0) & (_dot2(ab_p, ao) > 0)
        out_ac = (~out_ab) & (_dot2(ac, ao) > 0) & (_dot2(ac_p, ao) > 0)
        inside = ~out_ab & ~out_ac
        # out_ab: drop c -> [b, a];  out_ac: drop b -> [c, a]
        simp_ab = simplex.at[0].set(b3).at[1].set(a3)
        simp_ac = simplex.at[1].set(a3)
        simplex_c3 = jnp.where(out_ab, simp_ab,
                               jnp.where(out_ac, simp_ac, simplex))
        d_c3 = jnp.where(out_ab, ab_p, jnp.where(out_ac, ac_p, st["d"]))
        count_c3 = jnp.where(inside, jnp.int32(3), jnp.int32(2))

        is3 = count == 3
        n_simplex = jnp.where(is3, simplex_c3, simplex_c2)
        n_d = jnp.where(is3, d_c3, d_c2)
        n_count = jnp.where(is3, count_c3, count_c2)
        n_hit = is3 & inside

        upd = active & ~new_miss
        return dict(
            simplex=jnp.where(upd, n_simplex, st["simplex"]),
            count=jnp.where(upd, n_count, st["count"]),
            d=jnp.where(upd, n_d, st["d"]),
            hit=jnp.where(upd, n_hit, st["hit"]),
            miss=st["miss"] | (active & new_miss),
        )

    st = jax.lax.fori_loop(0, iters, body, state0)
    # iteration-cap exhaustion counts as "no collision" (gjk.cpp:98-103)
    return st["hit"] & ~st["miss"], st["simplex"]


# ---------------------------------------------------------------------------
# EPA
# ---------------------------------------------------------------------------

def epa(sa, sb, simplex, iters: int = EPA_ITERS_DEFAULT):
    """Penetration normal + depth from a touching simplex.

    Returns (valid, normal[2], penetration). Fixed-capacity polytope with
    masked insertion. reference: src/systems/rigid/epa.cpp:31-119.
    """
    dtype = simplex.dtype
    cap = 3 + iters + 1
    ab = simplex[1] - simplex[0]
    ac = simplex[2] - simplex[0]
    crossv = _cross2(ab, ac)
    degenerate = jnp.abs(crossv) < 1e-14
    # ensure CCW (reverse if cross < 0)
    rev = jnp.stack([simplex[2], simplex[1], simplex[0]])
    tri = jnp.where(crossv < 0, rev, simplex)

    poly = jnp.zeros((cap, 2), dtype).at[:3].set(tri)
    st0 = dict(poly=poly, count=jnp.int32(3), done=degenerate,
               started=jnp.bool_(False),
               normal=jnp.zeros(2, dtype).at[0].set(1.0),
               pen=jnp.asarray(jnp.inf, dtype))

    idx = jnp.arange(cap)
    # Convergence threshold must respect the dtype's noise floor: for smooth
    # (circle) Minkowski boundaries d-closest shrinks geometrically but
    # bottoms out at ~eps(dtype)*scale, so the reference's absolute 1e-9
    # (constants.cpp:9) is unreachable in float32. The reference runs up to
    # 100 iterations and still uses its best estimate when the cap trips
    # (epa.cpp:58-118); we mirror that by always keeping the latest
    # closest-edge estimate.
    eps = max(EPSILON, 32 * float(jnp.finfo(dtype).eps))

    def body(_, st):
        active = ~st["done"]
        p, count = st["poly"], st["count"]
        # ring-next without a gather: roll, then fix the wrap at count-1
        b = jnp.where((idx == count - 1)[:, None], p[0],
                      jnp.roll(p, -1, axis=0))
        a = p
        e = b - a
        n = jnp.stack([e[:, 1], -e[:, 0]], axis=-1)
        n = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
        dist = (n * a).sum(-1)
        n = jnp.where((dist < 0)[:, None], -n, n)
        dist = jnp.abs(dist)
        dist = jnp.where(idx < count, dist, jnp.inf)
        closest = dist.min()
        en = _select_row(n, dist == closest)
        j = jnp.argmin(dist)

        sp = support_minkowski(sa, sb, en)
        d = _dot2(sp, en)
        converged = (d - closest) < eps * jnp.maximum(1.0, d)

        # insert sp at position k = (j+1) % count; p[idx-1] via roll
        k = jnp.where(j + 1 >= count, 0, j + 1)
        shifted = jnp.where((idx < k)[:, None], p,
                            jnp.where((idx == k)[:, None], sp,
                                      jnp.roll(p, 1, axis=0)))
        cap_hit = count >= cap

        # best-so-far estimate: every iteration's d = dot(support(en), en)
        # upper-bounds the true penetration, but it is NOT monotone — on
        # cap exhaustion the LAST d can badly overshoot (measured up to
        # 1.2 on needle shapes, tests/test_geometry_adversarial.py). Keep
        # the MINIMUM d and its normal: the tightest proven bound. The
        # reference returns the converged d (epa.cpp:103-107), which
        # equals the minimum when the loop converges.
        better = active & (d < st["pen"])
        return dict(
            poly=jnp.where(active & ~converged & ~cap_hit, shifted, p),
            count=jnp.where(active & ~converged & ~cap_hit, count + 1, count),
            done=st["done"] | (active & (converged | cap_hit)),
            started=st["started"] | active,
            normal=jnp.where(better, en, st["normal"]),
            pen=jnp.where(better, d, st["pen"]),
        )

    st = jax.lax.fori_loop(0, iters, body, st0)
    pen = jnp.where(jnp.isfinite(st["pen"]), st["pen"], 0.0)
    return st["started"] & ~degenerate, st["normal"], pen


# ---------------------------------------------------------------------------
# SAT narrowphase (closed-form alternative to GJK->EPA)
# ---------------------------------------------------------------------------

def _outward_face_normals(w, mask, count):
    """Unit outward face normals of a masked vertex ring, orientation-
    agnostic (oriented off the centroid, so CW and CCW rings both work)."""
    V = w.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where((idx == count - 1)[:, None], w[0], jnp.roll(w, -1, axis=0))
    e = nxt - w
    n = jnp.stack([e[:, 1], -e[:, 0]], axis=-1)
    n = n / jnp.maximum(jnp.sqrt((n * n).sum(-1, keepdims=True)), 1e-30)
    cen = jnp.where(mask[:, None], w, 0.0).sum(0) / jnp.maximum(
        mask.sum(), 1).astype(w.dtype)
    flip = (_dot2(n, w - cen[None, :]) < 0)[:, None]
    return jnp.where(flip, -n, n), nxt, e


def _proj_minmax(d, w, mask):
    p = w @ d
    return (jnp.where(mask, p, jnp.inf).min(),
            jnp.where(mask, p, -jnp.inf).max())


def _sat_poly_poly(sa, sb):
    """Minimum-translation axis for two convex polygons via the separating-
    axis test over both face-normal sets. For 2D convex polygons the MTV
    direction is always one of the face normals, so this equals the
    *converged* GJK->EPA answer (reference: src/systems/rigid/epa.cpp:31-119)
    without the iterative polytope. Normal points A -> B (EPA convention)."""
    wa, ma, na = world_verts(sa)
    wb, mb, nb = world_verts(sb)
    fa, _, _ = _outward_face_normals(wa, ma, na)
    fb, _, _ = _outward_face_normals(wb, mb, nb)
    # push directions (A -> B): A's outward normals, minus B's outward
    dirs = jnp.concatenate([fa, -fb], axis=0)              # [2V, 2]
    vmask = jnp.concatenate([ma, mb], axis=0)

    def pen_of(d):
        _, amax = _proj_minmax(d, wa, ma)
        bmin, _ = _proj_minmax(d, wb, mb)
        return amax - bmin

    pens = jax.vmap(pen_of)(dirs)
    pens = jnp.where(vmask, pens, jnp.inf)
    hit = (pens > 0.0).all() & vmask.any()
    best = pens == pens.min()
    normal = _select_row(dirs, best)
    pen = jnp.where(vmask, pens, jnp.inf).min()
    return hit, normal, jnp.maximum(pen, 0.0)


def _sat_circle_poly(circ, poly):
    """Circle vs convex polygon, closed form. Returns (hit, normal, pen)
    with the normal pointing poly -> circle (caller orients for A -> B).
    Matches the converged EPA answer on the exact circle support."""
    wv, wm, wc = world_verts(poly)
    fn, nxt, e = _outward_face_normals(wv, wm, wc)
    c = circ["pos"]
    r = circ["radius"]
    d_face = _dot2(fn, c[None, :] - wv)                    # signed per face
    d_face = jnp.where(wm, d_face, -jnp.inf)
    inside = (d_face <= 0.0).all()
    # deepest face when the center is inside
    dmax = d_face.max()
    n_in = _select_row(fn, d_face == dmax)
    pen_in = r - dmax
    # closest boundary point when outside
    ee = jnp.maximum(_dot2(e, e), 1e-30)
    t = jnp.clip(_dot2(c[None, :] - wv, e) / ee, 0.0, 1.0)
    q = wv + e * t[:, None]
    dq2 = ((c[None, :] - q) ** 2).sum(-1)
    dq2 = jnp.where(wm, dq2, jnp.inf)
    qbest = _select_row(q, dq2 == dq2.min())
    dist = jnp.sqrt(jnp.maximum(dq2.min(), 0.0))
    n_out = (c - qbest) / jnp.maximum(dist, 1e-12)
    n_out = jnp.where(dist > 1e-12, n_out, n_in)
    hit = inside | (dist < r)
    normal = jnp.where(inside, n_in, n_out)
    pen = jnp.where(inside, pen_in, r - dist)
    return hit & wm.any(), normal, jnp.maximum(pen, 0.0)


def sat_contact(sa, sb, any_circle: bool = True):
    """(hit, normal[2], penetration) — closed-form narrowphase.

    Drop-in replacement for ``gjk`` + ``epa`` on the hot path: polygons use
    the separating-axis MTV (exact where iterative EPA is ~1e-3 in f32),
    circles their analytic cases. Normal points A -> B. The reference runs
    GJK->EPA for every pair (narrowphase.cpp:352-420); the converged results
    agree, see tests/test_geometry_sat.py. ``any_circle=False`` statically
    drops the circle branches (XLA cannot DCE traced ``is_circle``)."""
    hit, normal, pen = _sat_poly_poly(sa, sb)
    if not any_circle:
        return hit, normal, pen
    a_cir, b_cir = sa["is_circle"], sb["is_circle"]

    # circle-circle closed form
    dcc = sb["pos"] - sa["pos"]
    dlen = jnp.sqrt(_dot2(dcc, dcc))
    rsum = sa["radius"] + sb["radius"]
    ncc = dcc / jnp.maximum(dlen, 1e-12)
    ncc = jnp.where(dlen > 1e-12, ncc, jnp.array([1.0, 0.0], dcc.dtype))

    # circle-poly cases (normal oriented A -> B)
    hit_ab, n_ab, p_ab = _sat_circle_poly(sa, sb)   # A circle, B poly
    hit_ba, n_ba, p_ba = _sat_circle_poly(sb, sa)   # A poly, B circle

    both = a_cir & b_cir
    hit = jnp.where(both, dlen < rsum,
                    jnp.where(a_cir, hit_ab, jnp.where(b_cir, hit_ba, hit)))
    normal = jnp.where(both, ncc,
                       jnp.where(a_cir, -n_ab,
                                 jnp.where(b_cir, n_ba, normal)))
    pen = jnp.where(both, rsum - dlen,
                    jnp.where(a_cir, p_ab, jnp.where(b_cir, p_ba, pen)))
    return hit, normal, jnp.maximum(pen, 0.0)


# ---------------------------------------------------------------------------
# Reference-face clipping (poly-poly manifolds)
# ---------------------------------------------------------------------------

def _best_face(verts, mask, count, normal):
    """Face whose outward normal best aligns with ``normal``; returns the
    face endpoints and unit normal (gather-free first-match selects).
    reference: narrowphase.cpp:126-146 (CCW face normal = rot90-left of edge).
    """
    V = verts.shape[0]
    idx = jnp.arange(V)
    ring_next = jnp.where((idx == count - 1)[:, None], verts[0],
                          jnp.roll(verts, -1, axis=0))
    e = ring_next - verts
    fn = jnp.stack([-e[:, 1], e[:, 0]], axis=-1)
    fn = fn / jnp.maximum(jnp.sqrt((fn * fn).sum(-1, keepdims=True)), 1e-30)
    d = (fn * normal[None, :]).sum(-1)
    d = jnp.where(mask, d, NEG)
    best = d == d.max()
    return (_select_row(verts, best), _select_row(ring_next, best),
            _select_row(fn, best))


def polygon_contacts(sa, sb, normal, max_contacts: int):
    """Poly-poly manifold via reference-face / incident-edge clipping.

    Returns (points[max_contacts,2], penetrations[max_contacts],
    valid[max_contacts]). Normal is the EPA global normal (A->B); shape A is
    always the reference (narrowphase.cpp:173-174).

    Deviation from the reference (documented): the reference Sutherland-
    Hodgman-clips B's *entire* vertex ring against the face + side planes
    (narrowphase.cpp:239-299) and keeps every surviving point. For convex
    shapes the deepest two survivors always lie on the *incident face* (the
    face of B most anti-parallel to the reference normal), so clipping just
    that one edge against the two side planes — closed form, no ring
    compaction — yields the same <=2-point manifold the solver consumes
    (a 2D convex contact is full-rank with 2 points). This removes the 6
    vmapped compaction scatters per pair that dominated narrowphase time on
    TPU (scatters run at the chip's indexed-op floor, not the VPU rate).
    """
    av, am, ac_count = world_verts(sa)
    bv, bm, bc_count = world_verts(sb)
    v1, v2, ref_n = _best_face(av, am, ac_count, normal)
    face_off = _dot2(ref_n, v1)
    edge = v2 - v1
    edge = edge / jnp.maximum(jnp.sqrt(_dot2(edge, edge)), 1e-30)
    # side planes: keep dot(pn, p) <= po
    top_n, top_o = edge, _dot2(edge, v2)
    bot_n, bot_o = -edge, _dot2(-edge, v1)

    # incident face on B: most anti-parallel to the reference normal
    p1, p2, _ = _best_face(bv, bm, bc_count, -ref_n)
    ok1 = jnp.bool_(True)
    ok2 = jnp.bool_(True)
    for pn, po in ((top_n, top_o), (bot_n, bot_o)):
        d1 = _dot2(pn, p1) - po
        d2 = _dot2(pn, p2) - po
        t = d1 / jnp.where(jnp.abs(d1 - d2) < 1e-30, 1e-30, d1 - d2)
        inter = p1 + (p2 - p1) * t
        both_out = (d1 > 0.0) & (d2 > 0.0)
        ok1 = ok1 & ~both_out
        ok2 = ok2 & ~both_out
        p1 = jnp.where((d1 > 0.0) & ~both_out, inter, p1)
        p2 = jnp.where((d2 > 0.0) & ~both_out, inter, p2)

    pen1 = face_off - _dot2(ref_n, p1)
    pen2 = face_off - _dot2(ref_n, p2)
    # only points at/below the reference face are contacts (the reference's
    # first clip plane is the face itself, narrowphase.cpp:305-350)
    ok1 = ok1 & (pen1 >= 0.0)
    ok2 = ok2 & (pen2 >= 0.0)
    # deepest-first so callers can truncate to the leading rows
    swap = pen2 > pen1
    pa = jnp.where(swap, p2, p1)
    pb = jnp.where(swap, p1, p2)
    pena = jnp.where(swap, pen2, pen1)
    penb = jnp.where(swap, pen1, pen2)
    oka = jnp.where(swap, ok2, ok1)
    okb = jnp.where(swap, ok1, ok2)

    C = max_contacts
    pts = jnp.zeros((C, 2), av.dtype).at[0].set(pa)
    pen = jnp.zeros((C,), av.dtype).at[0].set(pena)
    valid = jnp.zeros((C,), bool).at[0].set(oka)
    if C >= 2:
        pts = pts.at[1].set(pb)
        pen = pen.at[1].set(penb)
        valid = valid.at[1].set(okb)
    return pts, pen, valid

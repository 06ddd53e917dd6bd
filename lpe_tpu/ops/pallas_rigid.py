"""Pallas TPU kernel for the grid-rigid narrowphase (SAT + incident-edge
clip, poly-poly only).

The XLA narrowphase (`geometry.sat_contact` + `pipeline._pair_contacts`
vmapped over the dense [NC*R] candidate rows) is memory-bound: the
separating-axis sweep materializes [N, 2V, V]-shaped projection
intermediates and the clip another family of [N, V, 2] rings — measured
~82 ms of the 150 ms north-star rigid tick (scripts/north_rigid_trace.py,
NC*R = 950k rows), ~65 GB of HBM traffic for ~1.5 kFLOP/row of actual math.
This kernel keeps one 8x128 block of rows entirely in VMEM/registers: HBM
touches only the packed shape-parameter planes in (~160 MB) and the 12
result planes out (~45 MB) per tick.

Semantics are bit-identical (up to float reassociation) to the XLA pair:
`_sat_poly_poly` (geometry.py:287-312 — centroid-oriented face normals,
first-minimum axis select) followed by `polygon_contacts`
(geometry.py:405-471 — reference-face pick via the raw CCW rot90-left
normals, incident-edge clip against the two side planes, deepest-first
2-point manifold). Circle branches are NOT ported: the grid pipeline gates
the kernel on `not spec.any_rigid_circle` (the big-scene configs — north
star, rigid stacks — are all-polygon; circle scenes keep the XLA path).
Reference for the algorithm being matched: the upstream GJK->EPA + full
Sutherland-Hodgman clip (src/systems/rigid/narrowphase.cpp:126-350,
epa.cpp:31-119) — see geometry.py for why closed-form SAT equals the
converged EPA answer on convex polygons.

Layout: per-row shape parameters enter as stacked lane planes
[2*F1, NS, 128] (NS sublanes = padded_rows/128; F1 = 5 + 2V planes per
side: pos.x, pos.y, cos, sin, nverts, vx_0..V-1, vy_0..V-1); results leave
as [12, NS, 128] (hit, nx, ny, pen, p0x, p0y, pen0, val0, p1x, p1y, pen1,
val1). Each program handles one (8, 128) block of rows; every loop below
is a static Python unroll over the V vertex slots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
OUT_PLANES = 12


def _nphase_kernel(V, in_ref, out_ref):
    F1 = 5 + 2 * V
    f32 = in_ref.dtype

    def side(off):
        """World verts + masks of one shape side: lists of [8,128] tiles."""
        c = in_ref[off + 2]
        s = in_ref[off + 3]
        nv = in_ref[off + 4]
        px = in_ref[off + 0]
        py = in_ref[off + 1]
        wx, wy, m = [], [], []
        for v in range(V):
            vx = in_ref[off + 5 + v]
            vy = in_ref[off + 5 + V + v]
            wx.append(px + vx * c - vy * s)
            wy.append(py + vx * s + vy * c)
            m.append(jnp.float32(v) < nv)
        return wx, wy, m, nv

    def edges(wx, wy, m, nv):
        """Per-vertex ring edge (to the count-wrapped next vertex), the
        centroid-oriented outward unit normal (geometry._outward_face_
        normals) and the raw rot90-left unit normal (geometry._best_face).
        """
        cnt = jnp.zeros_like(nv)
        cx = jnp.zeros_like(nv)
        cy = jnp.zeros_like(nv)
        for v in range(V):
            cx = cx + jnp.where(m[v], wx[v], 0.0)
            cy = cy + jnp.where(m[v], wy[v], 0.0)
            cnt = cnt + jnp.where(m[v], 1.0, 0.0)
        cnt = jnp.maximum(cnt, 1.0)
        cx = cx / cnt
        cy = cy / cnt
        nxx, nxy, onx, ony, rnx, rny = [], [], [], [], [], []
        for v in range(V):
            last = jnp.float32(v) == (nv - 1.0)
            nx_ = jnp.where(last, wx[0], wx[(v + 1) % V])
            ny_ = jnp.where(last, wy[0], wy[(v + 1) % V])
            ex = nx_ - wx[v]
            ey = ny_ - wy[v]
            ln = jnp.maximum(jnp.sqrt(ex * ex + ey * ey), 1e-30)
            # outward: (ey, -ex), flipped off the centroid
            ox = ey / ln
            oy = -ex / ln
            flip = (ox * (wx[v] - cx) + oy * (wy[v] - cy)) < 0.0
            onx.append(jnp.where(flip, -ox, ox))
            ony.append(jnp.where(flip, -oy, oy))
            # raw rot90-left (CCW-face convention of _best_face)
            rnx.append(-ey / ln)
            rny.append(ex / ln)
            nxx.append(nx_)
            nxy.append(ny_)
        return nxx, nxy, onx, ony, rnx, rny

    awx, awy, am, anv = side(0)
    bwx, bwy, bm, bnv = side(F1)
    anxx, anxy, aonx, aony, arnx, arny = edges(awx, awy, am, anv)
    bnxx, bnxy, bonx, bony, brnx, brny = edges(bwx, bwy, bm, bnv)

    # ---- SAT over both outward face-normal sets (first-minimum axis) ----
    shape = anv.shape
    best = jnp.full(shape, 2.0 * BIG, f32)
    nx = jnp.zeros(shape, f32)
    ny = jnp.zeros(shape, f32)
    hit = anv > -1.0                                   # all-true tile
    anyv = anv < -1.0                                  # all-false tile
    for i in range(2 * V):
        if i < V:
            dvalid, dx_, dy_ = am[i], aonx[i], aony[i]
        else:
            dvalid = bm[i - V]
            dx_ = -bonx[i - V]
            dy_ = -bony[i - V]
        amax = jnp.full(shape, -BIG, f32)
        bmin = jnp.full(shape, BIG, f32)
        for v in range(V):
            pa = awx[v] * dx_ + awy[v] * dy_
            amax = jnp.where(am[v], jnp.maximum(amax, pa), amax)
            pb = bwx[v] * dx_ + bwy[v] * dy_
            bmin = jnp.where(bm[v], jnp.minimum(bmin, pb), bmin)
        pend = jnp.where(dvalid, amax - bmin, BIG)
        hit = hit & ((~dvalid) | (pend > 0.0))
        anyv = anyv | dvalid
        better = pend < best
        best = jnp.where(better, pend, best)
        nx = jnp.where(better, dx_, nx)
        ny = jnp.where(better, dy_, ny)
    hit = hit & anyv
    pen = jnp.maximum(best, 0.0)

    # ---- reference face on A (first-maximum alignment with the normal),
    #      incident face on B (alignment with -ref_n); raw CCW normals ----
    def best_face(nrmx, nrmy, wx, wy, nxx, nxy, rnx, rny, m):
        bd = jnp.full(shape, -2.0 * BIG, f32)
        v1x = jnp.zeros(shape, f32)
        v1y = jnp.zeros(shape, f32)
        v2x = jnp.zeros(shape, f32)
        v2y = jnp.zeros(shape, f32)
        fx = jnp.zeros(shape, f32)
        fy = jnp.zeros(shape, f32)
        for v in range(V):
            d = jnp.where(m[v], rnx[v] * nrmx + rny[v] * nrmy, -BIG)
            bet = d > bd
            bd = jnp.where(bet, d, bd)
            v1x = jnp.where(bet, wx[v], v1x)
            v1y = jnp.where(bet, wy[v], v1y)
            v2x = jnp.where(bet, nxx[v], v2x)
            v2y = jnp.where(bet, nxy[v], v2y)
            fx = jnp.where(bet, rnx[v], fx)
            fy = jnp.where(bet, rny[v], fy)
        return v1x, v1y, v2x, v2y, fx, fy

    v1x, v1y, v2x, v2y, rfx, rfy = best_face(
        nx, ny, awx, awy, anxx, anxy, arnx, arny, am)
    face_off = rfx * v1x + rfy * v1y
    edx = v2x - v1x
    edy = v2y - v1y
    el = jnp.maximum(jnp.sqrt(edx * edx + edy * edy), 1e-30)
    edx = edx / el
    edy = edy / el

    p1x, p1y, p2x, p2y, _ifx, _ify = best_face(
        -rfx, -rfy, bwx, bwy, bnxx, bnxy, brnx, brny, bm)

    ok1 = anv > -1.0
    ok2 = anv > -1.0
    for pnx, pny, po in ((edx, edy, edx * v2x + edy * v2y),
                         (-edx, -edy, -(edx * v1x + edy * v1y))):
        d1 = pnx * p1x + pny * p1y - po
        d2 = pnx * p2x + pny * p2y - po
        dd = d1 - d2
        t = d1 / jnp.where(jnp.abs(dd) < 1e-30, 1e-30, dd)
        ix = p1x + (p2x - p1x) * t
        iy = p1y + (p2y - p1y) * t
        both_out = (d1 > 0.0) & (d2 > 0.0)
        ok1 = ok1 & (~both_out)
        ok2 = ok2 & (~both_out)
        m1 = (d1 > 0.0) & (~both_out)
        m2 = (d2 > 0.0) & (~both_out)
        p1x = jnp.where(m1, ix, p1x)
        p1y = jnp.where(m1, iy, p1y)
        p2x = jnp.where(m2, ix, p2x)
        p2y = jnp.where(m2, iy, p2y)

    pen1 = face_off - (rfx * p1x + rfy * p1y)
    pen2 = face_off - (rfx * p2x + rfy * p2y)
    ok1 = ok1 & (pen1 >= 0.0)
    ok2 = ok2 & (pen2 >= 0.0)
    swap = pen2 > pen1
    pax = jnp.where(swap, p2x, p1x)
    pay = jnp.where(swap, p2y, p1y)
    pbx = jnp.where(swap, p1x, p2x)
    pby = jnp.where(swap, p1y, p2y)
    pena = jnp.where(swap, pen2, pen1)
    penb = jnp.where(swap, pen1, pen2)
    # boolean algebra, not jnp.where: Mosaic cannot legalize bool-valued
    # vector selects (arith.select on vector<i1>)
    oka = (swap & ok2 & hit) | ((~swap) & ok1 & hit)
    okb = (swap & ok1 & hit) | ((~swap) & ok2 & hit)

    one = jnp.ones(shape, f32)
    zero = jnp.zeros(shape, f32)
    out_ref[0] = jnp.where(hit, one, zero)
    out_ref[1] = nx
    out_ref[2] = ny
    out_ref[3] = pen
    out_ref[4] = pax
    out_ref[5] = pay
    out_ref[6] = pena
    out_ref[7] = jnp.where(oka, one, zero)
    out_ref[8] = pbx
    out_ref[9] = pby
    out_ref[10] = penb
    out_ref[11] = jnp.where(okb, one, zero)


def make_narrowphase(V: int, interpret: bool = False):
    """Returns narrow(sa, sb) -> (hit[N], nrm[N,2], pen[N], pts[N,2,2],
    pens[N,2], cval[N,2]) for flat per-row shape dicts (pos [N,2], angle
    [N], verts [N,V,2], nverts [N]) — a drop-in for the vmapped
    `sat_contact` + `_pair_contacts(..., C=2)` pair on all-polygon scenes.
    """

    def planes(sh, N):
        c = jnp.cos(sh["angle"])
        s = jnp.sin(sh["angle"])
        vx = jnp.moveaxis(sh["verts"][..., 0], -1, 0)      # [V, N]
        vy = jnp.moveaxis(sh["verts"][..., 1], -1, 0)
        return jnp.concatenate([
            sh["pos"][:, 0][None], sh["pos"][:, 1][None],
            c[None], s[None], sh["nverts"].astype(jnp.float32)[None],
            vx, vy], axis=0)

    def narrow(sa, sb):
        N = sa["angle"].shape[0]
        Np = -(-N // 1024) * 1024
        NS = Np // 128
        P = jnp.concatenate([planes(sa, N), planes(sb, N)], axis=0)
        P = jnp.pad(P, ((0, 0), (0, Np - N)))
        P = P.reshape(P.shape[0], NS, 128)
        out = pl.pallas_call(
            functools.partial(_nphase_kernel, V),
            grid=(NS // 8,),
            in_specs=[pl.BlockSpec((P.shape[0], 8, 128),
                                   lambda j: (0, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((OUT_PLANES, 8, 128),
                                   lambda j: (0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OUT_PLANES, NS, 128),
                                           jnp.float32),
            interpret=interpret,
        )(P)
        out = out.reshape(OUT_PLANES, Np)[:, :N]
        hit = out[0] > 0.5
        nrm = jnp.stack([out[1], out[2]], axis=-1)
        pen = out[3]
        pts = jnp.stack([jnp.stack([out[4], out[5]], -1),
                         jnp.stack([out[8], out[9]], -1)], axis=1)
        pens = jnp.stack([out[6], out[10]], axis=1)
        cval = jnp.stack([out[7] > 0.5, out[11] > 0.5], axis=1)
        return hit, nrm, pen, pts, pens, cval

    return narrow

"""On-device frame rendering: RGB frames as jitted functions of SimState.

The reference renders with SFML + two Metal round-trips per frame (density
splat -> blur -> CPU max reduce -> normalize -> fragment pass -> texture
readback -> BGRA swizzle; reference: src/renderers/fluid_renderer.cpp:330-556,
presentation_manager.cpp:113-137). Here the entire frame is one XLA program
producing a uint8 [H, W, 3] array on device — the host only ever sees the
finished frame (and only if it asks).

Pipeline parity:
- fluid: unnormalized poly6 splat with smoothing radius 10 px
  (fluid_renderer.cpp:388, kernels.metal:40-76), two 5x5 edge-aware box
  blurs (kernels.metal:82-113), max-normalize (on device — the reference's
  CPU scan of 600x600 floats disappears), smoothstep threshold 0.19 +/- 0.02,
  base color RGBA(40,130,240) premultiplied (fluid_renderer.cpp:486-495).
- solids: filled convex polygons / circles in pixel space with per-entity
  color and the DEFAULT/SLEEP color schemes (solid_renderer.cpp:22-149,
  presentation_manager.cpp:34-48).
- gas: circles at alpha 180 (gas_renderer.cpp:15-44).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import ScenarioSystemConfig
from ..core.constants import MAX_POLY_VERTS, Phase, ShapeKind
from ..scene import SceneSpec
from ..state import SimState

FLUID_BASE_COLOR = (40.0, 130.0, 240.0)
FLUID_THRESHOLD = 0.19
FLUID_SMOOTHNESS = 0.02
FLUID_SMOOTH_RADIUS_PX = 10.0

SCHEME_DEFAULT = 0
SCHEME_SLEEP = 1
SCHEME_TEMPERATURE = 2


def _box_blur5(img):
    """5x5 box blur with boundary-count normalization (kernels.metal:82-113)."""
    ones = jnp.ones_like(img)
    k = ((0, 0),)

    def rw(x):
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (5, 5), (1, 1),
                                     "SAME")

    return rw(img) / rw(ones)


# Above this liquid count the per-particle 21x21 scatter splat (NL*441
# scatter-adds — indexed-op bound at ~60-100M elem/s on TPU) switches to a
# bilinear deposit (NL*4 scatter-adds) + one dense 21x21 convolution with the
# poly6 disc (~160M MACs at 600^2 — VPU/MXU work). The conv path samples the
# kernel at pixel-center offsets via the deposit's bilinear weights: after the
# two 5x5 blurs + max-normalize + smoothstep the <=half-pixel difference is
# invisible, and the exact path stays the default for reference-sized scenes.
_SPLAT_CONV_MIN_NL = 8192


def _fluid_layer(state, spec, H, W, mpp, splat="auto"):
    """Density splat -> blur x2 -> normalize -> smoothstep alpha. [H,W] f32."""
    L0, NL = spec.liquid_start, spec.n_liquid
    pos = state.bodies.pos[L0:L0 + NL] / mpp            # pixel coords
    h = FLUID_SMOOTH_RADIUS_PX
    h2 = h * h
    R = int(h) + 1
    win = 2 * R + 1
    if splat == "conv" or (splat == "auto" and NL >= _SPLAT_CONV_MIN_NL):
        # bilinear deposit: pixel i's center sits at i + 0.5
        u = pos[:, 0] - 0.5
        v = pos[:, 1] - 0.5
        i0 = jnp.floor(u).astype(jnp.int32)
        j0 = jnp.floor(v).astype(jnp.int32)
        fu = u - i0.astype(pos.dtype)
        fv = v - j0.astype(pos.dtype)
        imp = jnp.zeros((H * W + 1,), pos.dtype)
        for di, dj, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                            (1, 0, fu * (1 - fv)),
                            (0, 1, (1 - fu) * fv),
                            (1, 1, fu * fv)):
            xi = i0 + di
            yj = j0 + dj
            ok = (xi >= 0) & (xi < W) & (yj >= 0) & (yj < H)
            idx = jnp.where(ok, yj * W + xi, H * W)
            imp = imp.at[idx].add(wgt, mode="drop")
        d = jnp.arange(-R, R + 1, dtype=pos.dtype)
        r2k = d[:, None] ** 2 + d[None, :] ** 2
        kern = jnp.where(r2k < h2, (h2 - r2k) ** 3, 0.0)
        img = jax.lax.conv_general_dilated(
            imp[:H * W].reshape(1, 1, H, W), kern[None, None],
            window_strides=(1, 1), padding="SAME")[0, 0]
        return _fluid_post(img)
    ox = jnp.floor(pos[:, 0]).astype(jnp.int32) - R
    oy = jnp.floor(pos[:, 1]).astype(jnp.int32) - R
    d = jnp.arange(win)
    gx = ox[:, None] + d[None, :]                        # [NL, win]
    gy = oy[:, None] + d[None, :]
    cx = gx.astype(pos.dtype) + 0.5
    cy = gy.astype(pos.dtype) + 0.5
    dx = cx[:, None, :] - pos[:, 0, None, None]          # [NL, 1, win] x-term
    dy = cy[:, :, None] - pos[:, 1, None, None]          # [NL, win, 1] y-term
    r2 = dx * dx + dy * dy
    w = jnp.where(r2 < h2, (h2 - r2) ** 3, 0.0)          # unnormalized poly6
    # scatter-add patches into the flat grid; OOB indices are dropped
    fy = gy[:, :, None]
    fx = gx[:, None, :]
    ok = (fx >= 0) & (fx < W) & (fy >= 0) & (fy < H)
    flat_idx = jnp.where(ok, fy * W + fx, H * W)
    grid = jnp.zeros((H * W + 1,), pos.dtype)
    grid = grid.at[flat_idx.reshape(-1)].add(w.reshape(-1), mode="drop")
    return _fluid_post(grid[:H * W].reshape(H, W))


def _fluid_post(img):
    """Shared splat postprocess: blur x2 -> max-normalize -> smoothstep."""
    img = _box_blur5(_box_blur5(img))
    max_d = jnp.max(img)
    img = jnp.where(max_d > 1e-12, img / jnp.maximum(max_d, 1e-12), 0.0)
    lo = FLUID_THRESHOLD - FLUID_SMOOTHNESS
    hi = FLUID_THRESHOLD + FLUID_SMOOTHNESS
    t = jnp.clip((img - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)                       # smoothstep alpha


# Above this shape count the painter's fori_loop (count sequential
# full-screen rasterizations) switches to the windowed priority scatter
# below when the scene provides a static shape-size bound.
_RASTER_WINDOW_MIN_COUNT = 256


def _inside_shape(b, k, xpix, ypix, mpp):
    """Pixel coverage of entity k on broadcastable pixel-center grids
    (xpix/ypix in pixel units). Circle or convex polygon, active-gated."""
    px = b.pos[k, 0] / mpp
    py = b.pos[k, 1] / mpp
    dx = xpix - px
    dy = ypix - py
    is_circle = b.shape_kind[k] == int(ShapeKind.CIRCLE)
    rpx = jnp.maximum(b.radius[k] / mpp, 1.0)
    in_circle = dx * dx + dy * dy <= rpx * rpx
    # convex polygon: inside iff on one side of every (valid) edge
    c, s = jnp.cos(b.angle[k]), jnp.sin(b.angle[k])
    v = b.verts[k]                                  # [V,2] meters, local
    wx = (b.pos[k, 0] + v[:, 0] * c - v[:, 1] * s) / mpp
    wy = (b.pos[k, 1] + v[:, 0] * s + v[:, 1] * c) / mpp
    nv = b.nverts[k]
    vi = jnp.arange(MAX_POLY_VERTS)
    nxt = jnp.where(vi + 1 >= nv, 0, vi + 1)
    ex = wx[nxt] - wx
    ey = wy[nxt] - wy
    # cross(edge, p - v_i) sign test per edge, only valid edges count
    crossv = (ex[:, None, None] * (ypix[None] - wy[:, None, None]) -
              ey[:, None, None] * (xpix[None] - wx[:, None, None]))
    vmask = (vi < nv)[:, None, None]
    all_pos = jnp.where(vmask, crossv >= 0, True).all(0)
    all_neg = jnp.where(vmask, crossv <= 0, True).all(0)
    in_poly = (all_pos | all_neg) & (nv >= 3)
    return jnp.where(is_circle, in_circle, in_poly) & b.active[k]


def _shape_masks_loop(state, idx0, count, H, W, mpp):
    """Sequential painter's rasterization (reference draw-loop order)."""
    b = state.bodies
    ypix = (jnp.arange(H, dtype=b.pos.dtype) + 0.5)[:, None]
    xpix = (jnp.arange(W, dtype=b.pos.dtype) + 0.5)[None, :]

    def raster_one(i, canvas):
        color_img, alpha_img = canvas
        k = idx0 + i
        inside = _inside_shape(b, k, xpix, ypix, mpp)
        col = b.color[k].astype(jnp.float32)
        color_img = jnp.where(inside[:, :, None], col[None, None, :],
                              color_img)
        alpha_img = jnp.where(inside, 1.0, alpha_img)
        return color_img, alpha_img

    color0 = jnp.zeros((H, W, 3), jnp.float32)
    alpha0 = jnp.zeros((H, W), jnp.float32)
    if count == 0:
        return color0, alpha0
    return jax.lax.fori_loop(0, count, raster_one, (color0, alpha0))


def _shape_masks_windowed(state, spec, idx0, count, H, W, mpp, WR):
    """Large-count rasterizer: each non-"big" shape tests coverage only in
    its own (2*WR+1)^2 pixel window (vmapped — one dense pass instead of
    ``count`` sequential full-screen ones), then a priority scatter-max of
    entity indices reproduces exact painter's order (highest index wins,
    same as the reference's draw loop). The few oversized solids (walls,
    spec.solid_big_idx) rasterize full-screen into the same priority image,
    so ordering across big/small is exact too."""
    b = state.bodies
    WIN = 2 * WR + 1
    big = spec.solid_big_idx
    big_set = set(big)
    d = jnp.arange(WIN)

    def window_one(k):
        ox = jnp.floor(b.pos[k, 0] / mpp).astype(jnp.int32) - WR
        oy = jnp.floor(b.pos[k, 1] / mpp).astype(jnp.int32) - WR
        gx = ox + d                                     # [WIN]
        gy = oy + d
        xc = (gx.astype(b.pos.dtype) + 0.5)[None, :]    # [1, WIN]
        yc = (gy.astype(b.pos.dtype) + 0.5)[:, None]    # [WIN, 1]
        inside = _inside_shape(b, k, xc, yc, mpp)       # [WIN, WIN]
        ok = inside & (gx >= 0)[None, :] & (gx < W)[None, :] \
            & (gy >= 0)[:, None] & (gy < H)[:, None]
        return jnp.where(ok, gy[:, None] * W + gx[None, :], H * W)

    ks = idx0 + jnp.arange(count)
    # big shapes can exceed the window: exclude them here (priority 0
    # never wins), paint them full-screen below
    is_big = jnp.zeros((count,), bool)
    if big:
        bi = [i - idx0 for i in big if idx0 <= i < idx0 + count]
        if bi:
            is_big = is_big.at[jnp.asarray(bi)].set(True)
    flat = jax.vmap(window_one)(ks)                     # [count, WIN, WIN]
    prio_v = jnp.where(is_big, 0, ks + 1).astype(jnp.int32)
    prio_full = jnp.broadcast_to(prio_v[:, None, None], flat.shape)
    prio = jnp.zeros((H * W + 1,), jnp.int32).at[flat.reshape(-1)].max(
        prio_full.reshape(-1), mode="drop")[:H * W].reshape(H, W)

    if big:
        ypix = (jnp.arange(H, dtype=b.pos.dtype) + 0.5)[:, None]
        xpix = (jnp.arange(W, dtype=b.pos.dtype) + 0.5)[None, :]
        for k in sorted(big_set):
            if not (idx0 <= k < idx0 + count):
                continue
            inside = _inside_shape(b, k, xpix, ypix, mpp)
            prio = jnp.where(inside, jnp.maximum(prio, k + 1), prio)

    covered = prio > 0
    winner = jnp.clip(prio - 1, 0)
    color_img = jnp.where(covered[:, :, None],
                          b.color[winner].astype(jnp.float32),
                          0.0)
    return color_img, covered.astype(jnp.float32)


def _shape_masks(state, spec, idx0, count, H, W, mpp):
    """Rasterize shapes [idx0:idx0+count] -> per-pixel (color, covered),
    later shapes painting over earlier ones (reference draw-loop order).
    Dispatches to the windowed priority rasterizer for large solid counts
    when the scene's static size bound keeps windows small."""
    if count >= _RASTER_WINDOW_MIN_COUNT and idx0 == spec.solid_start \
            and count == spec.n_solid and spec.solid_cell_size > 0:
        WR = int(spec.solid_cell_size / (2.0 * mpp)) + 2
        if 2 * WR + 1 <= 96:
            return _shape_masks_windowed(state, spec, idx0, count, H, W,
                                         mpp, WR)
    return _shape_masks_loop(state, idx0, count, H, W, mpp)


def _debug_overlays(state, spec, img, H, W, mpp):
    """Velocity vectors (cyan, 20 px per m/s) and angular-velocity arcs
    (magenta, radius 15 px, arc = min(|w|*0.5, pi/2) from -pi/2), drawn on
    device. reference: solid_renderer.cpp:206-275."""
    b = state.bodies
    ypix = (jnp.arange(H, dtype=b.pos.dtype) + 0.5)[:, None]
    xpix = (jnp.arange(W, dtype=b.pos.dtype) + 0.5)[None, :]
    cyan = jnp.array([0.0, 255.0, 255.0], jnp.float32)
    magenta = jnp.array([255.0, 0.0, 255.0], jnp.float32)

    def one(i, img):
        k = spec.solid_start + i
        px = b.pos[k, 0] / mpp
        py = b.pos[k, 1] / mpp
        dx = xpix - px
        dy = ypix - py
        # --- velocity line ---
        vx, vy = b.vel[k, 0], b.vel[k, 1]
        vmag = jnp.sqrt(vx * vx + vy * vy)
        vlen = vmag * 20.0
        ux = jnp.where(vmag > 1e-9, vx / jnp.maximum(vmag, 1e-9), 0.0)
        uy = jnp.where(vmag > 1e-9, vy / jnp.maximum(vmag, 1e-9), 0.0)
        t = jnp.clip(dx * ux + dy * uy, 0.0, vlen)
        d2 = (dx - t * ux) ** 2 + (dy - t * uy) ** 2
        on_line = (d2 <= 1.0) & (vlen > 1.0) & b.active[k]
        img = jnp.where(on_line[:, :, None], cyan[None, None, :], img)
        # --- angular arc ---
        w = b.omega[k]
        r = jnp.sqrt(dx * dx + dy * dy)
        ang = jnp.arctan2(dy, dx)
        arc_len = jnp.minimum(jnp.abs(w) * 0.5, jnp.pi / 2)
        rel = ang - (-jnp.pi / 2)
        rel = jnp.where(rel > jnp.pi, rel - 2 * jnp.pi,
                        jnp.where(rel < -jnp.pi, rel + 2 * jnp.pi, rel))
        in_arc = jnp.where(w >= 0, (rel >= 0) & (rel <= arc_len),
                           (rel <= 0) & (rel >= -arc_len))
        on_arc = (jnp.abs(r - 15.0) <= 1.0) & in_arc & \
            (jnp.abs(w) > 0.05) & b.active[k]
        return jnp.where(on_arc[:, :, None], magenta[None, None, :], img)

    if spec.n_solid == 0:
        return img
    return jax.lax.fori_loop(0, spec.n_solid, one, img)


_RG_OVERLAY_MAX_ROWS = 262144


def _contact_overlays(state, spec, img, H, W, mpp):
    """Live contact debug overlay: yellow contact points, a 30 px normal
    line darkened to body A's color, a normal-impulse line (min(|jn|*5,
    50) px, body B's color) and a perpendicular blue tangent-impulse line
    flipped by the impulse sign. reference: solid_renderer.cpp:151-204
    (renderContactDebug) — dead code there (ContactRef is never
    populated, PARITY.md); this rebuild has live solver rows so the
    overlay actually draws. Drawn by SAMPLE SCATTER (segments sampled at
    fixed counts, scattered with drop semantics) instead of dense
    per-contact [H, W] masks, so cost scales with contact count, not
    contacts x pixels. Overlap winners are scatter-order-defined — fine
    for a debug layer. Sources both contact caches: the list pipeline's
    pair-keyed warm_* rows and (when its row count is small enough to
    draw) the grid pipeline's cell-resident rg_warm_* rows."""
    b = state.bodies
    dt = img.dtype
    flat0 = img.reshape(H * W, 3)
    buf = jnp.concatenate([flat0, jnp.zeros((1, 3), dt)])

    def seg(buf, x0, y0, ux, uy, length, color, val, S=16):
        # segment from (x0,y0) px along (ux,uy), S samples, 2x2 thickness
        t = jnp.linspace(0.0, 1.0, S, dtype=x0.dtype)[None, :]
        xs = x0[:, None] + ux[:, None] * t * length[:, None]
        ys = y0[:, None] + uy[:, None] * t * length[:, None]
        v = (val[:, None] & (xs >= 0) & (xs < W - 1)
             & (ys >= 0) & (ys < H - 1))
        xi = jnp.floor(xs).astype(jnp.int32)
        yi = jnp.floor(ys).astype(jnp.int32)
        cs = jnp.broadcast_to(color[:, None, :], xs.shape + (3,)) \
            .reshape(-1, 3)
        for dy in (0, 1):
            for dx in (0, 1):
                idx = jnp.where(v, (yi + dy) * W + xi + dx, H * W)
                buf = buf.at[idx.reshape(-1)].set(cs, mode="drop")
        return buf

    def dot(buf, x0, y0, color, val, r=3):
        xi = jnp.floor(x0).astype(jnp.int32)
        yi = jnp.floor(y0).astype(jnp.int32)
        v = val & (x0 >= r) & (x0 < W - r) & (y0 >= r) & (y0 < H - r)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy > r * r:
                    continue
                idx = jnp.where(v, (yi + dy) * W + xi + dx, H * W)
                buf = buf.at[idx].set(
                    jnp.broadcast_to(color, (idx.shape[0], 3)), mode="drop")
        return buf

    yellow = jnp.array([255.0, 255.0, 0.0], dt)
    blue = jnp.array([0.0, 0.0, 255.0], dt)
    white = jnp.full((3,), 255.0, dt)

    def draw(buf, pt, nrm, jn, jt, val, colA, colB):
        px = pt[:, 0] / mpp
        py = pt[:, 1] / mpp
        nx, ny = nrm[:, 0], nrm[:, 1]
        ln = jnp.full(px.shape, 30.0, dt)
        buf = seg(buf, px, py, nx, ny, ln, colA, val)
        li = jnp.minimum(jnp.abs(jn) * 5.0, 50.0)
        buf = seg(buf, px, py, nx, ny, li, colB,
                  val & (jnp.abs(jn) > 1e-3))
        # tangent: normal rotated +90deg, flipped when jt < 0
        sgn = jnp.where(jt < 0, -1.0, 1.0)
        lt = jnp.minimum(jnp.abs(jt) * 5.0, 50.0)
        buf = seg(buf, px, py, -ny * sgn, nx * sgn, lt,
                  jnp.broadcast_to(blue, colA.shape),
                  val & (jnp.abs(jt) > 1e-3))
        return dot(buf, px, py, yellow, val)

    # list pipeline's pair-keyed cache
    P, C = state.warm_normal.shape
    if P:
        ia = jnp.maximum(state.warm_ia, 0)
        ib = jnp.maximum(state.warm_ib, 0)
        colA = (b.color[ia].astype(dt) * 0.9)[:, None, :] \
            .repeat(C, 1).reshape(-1, 3)
        colB = (b.color[ib].astype(dt) * 0.9)[:, None, :] \
            .repeat(C, 1).reshape(-1, 3)
        pt = state.warm_pt.reshape(-1, 2)
        nrm = state.warm_n[:, None, :].repeat(C, 1).reshape(-1, 2)
        val = ((state.warm_ia >= 0)[:, None]
               & (state.warm_pt[..., 0] < 1e29)).reshape(-1)
        buf = draw(buf, pt, nrm, state.warm_normal.reshape(-1),
                   state.warm_tangent.reshape(-1), val, colA, colB)
    # grid pipeline's cell-resident cache (no body ids in the rows: the
    # normal draws white; skipped entirely when the resident row count
    # would make the overlay itself a workload)
    rg = getattr(state, "rg_warm_n", None)
    if rg is not None and rg.size and rg.size <= _RG_OVERLAY_MAX_ROWS:
        NCc, R, Cc = rg.shape
        pt = state.rg_warm_pt.reshape(-1, 2)
        nrm = state.rg_warm_nrm[:, :, None, :].repeat(Cc, 2).reshape(-1, 2)
        val = (pt[:, 0] < 1e29) & \
            ((jnp.abs(state.rg_warm_n) > 1e-3)
             | (jnp.abs(state.rg_warm_t) > 1e-3)).reshape(-1)
        colW = jnp.broadcast_to(white, (pt.shape[0], 3))
        buf = draw(buf, pt, nrm, state.rg_warm_n.reshape(-1),
                   state.rg_warm_t.reshape(-1), val, colW, colW)
    return buf[:H * W].reshape(H, W, 3)


def _scheme_colors(state, spec, H, W, mpp, scheme):
    """Per-PIXEL property aggregation -> per-entity fill colors for the
    solid slice (reference: renderer_types.hpp:34-73 PixelProperties,
    solid_renderer.cpp:125-149 aggregateSolidParticlesByPixel, :34-59
    fill-color lookup, presentation_manager.cpp:34-48 color mappers).

    The reference buckets every solid entity by its CENTER pixel,
    aggregates mass-weighted temperature / last-writer sleep state per
    bucket, then colors each entity from the aggregate at its own center
    pixel (White when the center is off-screen, i.e. no map entry). One
    deviation, documented: the reference's running weighted mean is
    iteration-order-dependent when temperature-carrying and
    temperature-less entities share a pixel; here temperature is the
    mass-weighted mean over the temperature-carrying entities only
    (order-free, identical whenever sharers all carry temperature)."""
    b = state.bodies
    s0, ns = spec.solid_start, spec.n_solid
    dt = b.pos.dtype
    px = jnp.floor(b.pos[s0:s0 + ns, 0] / mpp).astype(jnp.int32)
    py = jnp.floor(b.pos[s0:s0 + ns, 1] / mpp).astype(jnp.int32)
    act = b.active[s0:s0 + ns]
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & act
    flat = jnp.where(inb, py * W + px, H * W)      # OOB -> dropped slot
    white = jnp.full((ns, 3), 255, jnp.uint8)
    if scheme == SCHEME_SLEEP:
        # is_asleep = the LAST entity with a Sleep component to land on
        # the pixel (registry iteration order = entity index order);
        # pixels whose sharers have no Sleep read awake (green)
        hs = b.has_sleep[s0:s0 + ns] & inb
        rank = jnp.where(hs, jnp.arange(1, ns + 1, dtype=jnp.int32), 0)
        winner = jnp.zeros((H * W + 1,), jnp.int32).at[flat].max(
            rank, mode="drop")
        wk = winner[flat]                           # per-entity pixel winner
        asleep_pix = jnp.where(wk > 0,
                               b.asleep[s0 + jnp.maximum(wk - 1, 0)], False)
        col = jnp.where(asleep_pix[:, None],
                        jnp.array([200, 50, 50], jnp.uint8),
                        jnp.array([50, 200, 50], jnp.uint8))
        return jnp.where(inb[:, None], col, white)
    # TEMPERATURE: mass-weighted mean over has_temperature sharers;
    # no temperature at the pixel -> gray 128 (temperatureColorMapper)
    ht = b.has_temperature[s0:s0 + ns] & inb
    m = jnp.where(ht, b.mass[s0:s0 + ns], 0.0).astype(dt)
    mt = m * b.temperature[s0:s0 + ns].astype(dt)
    zbuf = jnp.zeros((H * W + 1,), dt)
    m_sum = zbuf.at[flat].add(m, mode="drop")[flat]
    mt_sum = zbuf.at[flat].add(mt, mode="drop")[flat]
    has_t = m_sum > 1e-9
    t = jnp.clip(mt_sum / jnp.maximum(m_sum, 1e-9) / 100.0, 0.0, 1.0)
    col = jnp.stack([255.0 * t, jnp.zeros_like(t), 255.0 * (1.0 - t)],
                    axis=-1).astype(jnp.uint8)
    gray = jnp.full((ns, 3), 128, jnp.uint8)
    return jnp.where(inb[:, None], jnp.where(has_t[:, None], col, gray),
                     white)


def make_renderer(spec: SceneSpec, cfg: ScenarioSystemConfig, *,
                  width: int = 600, height: int = 600,
                  color_scheme: int = SCHEME_DEFAULT, jit: bool = True,
                  debug: bool = False, splat: str = "auto"):
    mpp = cfg.shared.meters_per_pixel * (600.0 / width)
    H, W = height, width

    def frame(state: SimState) -> jax.Array:
        b = state.bodies
        img = jnp.zeros((H, W, 3), jnp.float32)
        # fluid underlay (named scopes mark the frame's phases in device
        # traces — SimManager.trace is the profiling entry point)
        if spec.n_liquid > 0:
            with jax.named_scope("render_fluid"):
                alpha = _fluid_layer(state, spec, H, W, mpp, splat)
            base = jnp.array(FLUID_BASE_COLOR, jnp.float32)
            img = img * (1 - alpha[:, :, None]) + base * alpha[:, :, None]
        # color-scheme recolor from per-PIXEL aggregates (SLEEP paints
        # asleep red / awake green, TEMPERATURE maps the pixel's
        # mass-weighted 0..100 mean onto a blue->red ramp, gray when no
        # sharer carries temperature — presentation_manager.cpp:34-48,
        # solid_renderer.cpp:34-59). Solids only: the gas pass always uses
        # the entity's own color (gas_renderer.cpp:29-39).
        st = state
        if color_scheme != SCHEME_DEFAULT and spec.n_solid > 0:
            fill = _scheme_colors(state, spec, H, W, mpp, color_scheme)
            s0 = spec.solid_start
            st = state.replace(bodies=b.replace(
                color=b.color.at[s0:s0 + spec.n_solid].set(fill)))
        # solids
        with jax.named_scope("render_solids"):
            scol, salpha = _shape_masks(st, spec, spec.solid_start,
                                        spec.n_solid, H, W, mpp)
        img = jnp.where(salpha[:, :, None] > 0, scol, img)
        # gas (alpha 180/255)
        if spec.n_gas > 0:
            with jax.named_scope("render_gas"):
                gcol, galpha = _shape_masks(st, spec, spec.gas_start,
                                            spec.n_gas, H, W, mpp)
            ga = galpha[:, :, None] * (180.0 / 255.0)
            img = img * (1 - ga) + gcol * ga
        if debug:
            with jax.named_scope("render_debug"):
                img = _debug_overlays(st, spec, img, H, W, mpp)
                if spec.n_solid > 0:
                    img = _contact_overlays(st, spec, img, H, W, mpp)
        return jnp.clip(img, 0, 255).astype(jnp.uint8)

    return jax.jit(frame) if jit else frame

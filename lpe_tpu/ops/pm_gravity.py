"""Particle-mesh (PM / P3M) N-body gravity for large N.

The reference's far-field strategy is a Barnes-Hut quadtree walk with
theta = 0.5 (reference: src/systems/barnes_hut.cpp:256-312) — a
pointer-chasing, data-dependent traversal that maps terribly onto the TPU.
The TPU-native far-field is a particle-mesh solve:

    CIC deposit -> FFT -> multiply by the free-space force kernels -> IFFT
    -> CIC gather

which is O(G^2 log G) on the device's FFT path regardless of N, plus an
exact direct sum over the few *heavy* bodies (planets/stars above
``heavy_threshold``) so dominant central forces are not smeared by the mesh.
Force law and softening match the reference: |f| = G*M / (d^2 + soft^2),
direction along the separation (barnes_hut.cpp:284-307).

**P3M short-range correction** (``cutoff_cells > 0``, the default through
``BarnesHutConfig``): the mesh kernel is rolled off by a quintic smoothstep
``S(d/rc)`` so the mesh only carries the *smooth* part of the force (which
CIC+FFT represents with small error everywhere — the sharp 1/d^2 peak is
exactly what the plain-PM mesh gets ~7% wrong at close range), and a dense
cell-grid particle-particle pass adds the complementary exact short-range
term ``(1 - S(d/rc)) * f(d)`` for pairs within ``rc = cutoff_cells * cell``
(``make_pp_correction``). Both halves use the *scenario* softener (the
rolloff removes the need for plain PM's one-cell softening clamp), so mesh +
correction telescopes to the exact softened law for d < rc. Per-cell
candidate capacity is a deterministic first-K drop, the same contract as the
SPH grid and the reference's own 64-per-cell cap.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..core.constants import REAL_G


def _ramp(rc: float, cell: float):
    """Mesh/PP blend window (r0, width) for cutoff rc.

    Two competing mesh-error sources fix the window: the mesh cannot be
    trusted below ~2 cells (CIC + sampled-kernel error is tens of percent
    there), so the ramp *starts* at min(2 cells, rc/2); and the mesh cannot
    represent variation sharper than a few cells, so the ramp must be as
    wide as the remaining room to rc. PP covers [0, rc] exactly with weight
    (1 - S)."""
    r0 = min(2.0 * cell, 0.5 * rc)
    return r0, max(rc - r0, 1e-300)


def _smoothstep5(u):
    """C^2 quintic smoothstep: 0 at u<=0, 1 at u>=1 (numpy or jnp)."""
    if isinstance(u, np.ndarray):
        u = np.clip(u, 0.0, 1.0)
    else:
        u = jnp.clip(u, 0.0, 1.0)
    return u * u * u * (u * (u * 6.0 - 15.0) + 10.0)


def make_pm_gravity(universe: float, grid: int, softener: float,
                    dtype=jnp.float32, cutoff_cells: float = 0.0):
    """Returns ``accel(pos[N,2], src_mass[N]) -> [N,2]`` (unscaled by G).

    Free-space (non-periodic) solve via zero padding to 2G x 2G. Sources
    outside the universe are dropped (the reference's buildTree also skips
    out-of-bounds bodies, barnes_hut.cpp:120-127). With ``cutoff_cells > 0``
    the kernel carries only the S-smoothed far field (see module docstring);
    pair the result with ``make_pp_correction`` for the short-range term."""
    G = int(grid)
    cell = universe / G
    if cutoff_cells > 0.0:
        # P3M: the smoothstep rolloff removes the kernel's sharp peak, so no
        # softening clamp is needed — use the scenario's exact softener.
        soft = float(softener)
    else:
        # plain PM cannot resolve below a cell; clamp the softening up to one
        # cell to avoid self-force noise from CIC deposit/gather asymmetry.
        soft = max(float(softener), cell)

    # force kernels K(delta) = (c - c0) / (|d|^2 + soft^2)^{3/2} arranged in
    # wrapped offset order on the padded 2G grid; precomputed once on host
    P = 2 * G
    off = np.arange(P)
    off = np.where(off < G, off, off - P).astype(np.float64) * cell
    dx = off[None, :]          # x varies along axis 1
    dy = off[:, None]
    d2 = dx * dx + dy * dy + soft * soft
    inv = 1.0 / np.power(np.maximum(d2, 1e-300), 1.5)
    if cutoff_cells > 0.0:
        rc = cutoff_cells * cell
        r0, rw = _ramp(rc, cell)
        s = _smoothstep5((np.sqrt(dx * dx + dy * dy) - r0) / rw)
        # s == 0 everywhere the unclamped-softener kernel can blow up
        # (d < r0 covers the origin); kill those entries outright so a zero
        # softener cannot produce inf*0 = NaN at the origin sample
        with np.errstate(over="ignore", invalid="ignore"):
            inv = np.where(s > 0.0, inv * s, 0.0)
    kx = np.fft.rfft2(-dx * inv)       # K(c0 - c) = -(c0-c)/(...)^(3/2)
    ky = np.fft.rfft2(-dy * inv)
    if cutoff_cells > 0.0:
        # Deconvolve the CIC assignment window (applied twice: mass deposit
        # and force gather). CIC's per-axis transform is sinc^2; without this
        # the mesh force is the true force smoothed over ~2 cells, a
        # several-percent error at 4-8 cell separations — exactly the blend
        # window. Amplification is bounded (<= ~37x at the corner Nyquist
        # mode) and the short-range kernel rolloff keeps it out of the
        # PP-corrected range.
        fy = np.fft.fftfreq(P)[:, None]
        fx = np.fft.rfftfreq(P)[None, :]
        w2 = (np.sinc(fy) * np.sinc(fx)) ** 2     # one CIC pass
        kx /= w2 * w2
        ky /= w2 * w2
    # complex64 constants cannot be materialized on this TPU backend
    # (UNIMPLEMENTED) — carry the kernel FFTs as float32 real/imag pairs and
    # do the complex multiply in real arithmetic
    kx_re = jnp.asarray(kx.real.astype(np.float32))
    kx_im = jnp.asarray(kx.imag.astype(np.float32))
    ky_re = jnp.asarray(ky.real.astype(np.float32))
    ky_im = jnp.asarray(ky.imag.astype(np.float32))

    def accel(pos, src_mass):
        x = pos[:, 0] / cell - 0.5
        y = pos[:, 1] / cell - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx_w = x - x0
        fy_w = y - y0
        ix = x0.astype(jnp.int32)
        iy = y0.astype(jnp.int32)
        in_b = (pos[:, 0] >= 0) & (pos[:, 0] < universe) & \
               (pos[:, 1] >= 0) & (pos[:, 1] < universe)
        m = jnp.where(in_b, src_mass, 0.0)

        rho = jnp.zeros((G * G + 1,), dtype)

        def slot(jx, jy):
            ok = (jx >= 0) & (jx < G) & (jy >= 0) & (jy < G)
            return jnp.where(ok, jy * G + jx, G * G)

        corners = []
        for ddx, ddy, w in ((0, 0, (1 - fx_w) * (1 - fy_w)),
                            (1, 0, fx_w * (1 - fy_w)),
                            (0, 1, (1 - fx_w) * fy_w),
                            (1, 1, fx_w * fy_w)):
            rho = rho.at[slot(ix + ddx, iy + ddy)].add(m * w, mode="drop")
            corners.append((ddx, ddy, w))
        rho = rho[:G * G].reshape(G, G)

        pad = jnp.zeros((P, P), dtype).at[:G, :G].set(rho)
        rho_hat = jnp.fft.rfft2(pad)
        rr, ri = jnp.real(rho_hat), jnp.imag(rho_hat)

        def conv(kre, kim):
            prod = jax.lax.complex(rr * kre - ri * kim,
                                   rr * kim + ri * kre)
            return jnp.fft.irfft2(prod, s=(P, P))[:G, :G]

        fx_g = conv(kx_re, kx_im)
        fy_g = conv(ky_re, ky_im)

        # CIC gather (same weights)
        fxp = jnp.zeros((pos.shape[0],), dtype)
        fyp = jnp.zeros((pos.shape[0],), dtype)
        fx_flat = jnp.concatenate([fx_g.reshape(-1), jnp.zeros((1,), dtype)])
        fy_flat = jnp.concatenate([fy_g.reshape(-1), jnp.zeros((1,), dtype)])
        for ddx, ddy, w in corners:
            s = slot(ix + ddx, iy + ddy)
            fxp = fxp + fx_flat[s] * w
            fyp = fyp + fy_flat[s] * w
        return jnp.stack([fxp, fyp], axis=-1)

    return accel


def make_pp_correction(universe: float, grid: int, softener: float,
                       cutoff_cells: float, max_per_cell: int,
                       dtype=jnp.float32, n_bodies: int | None = None):
    """Short-range particle-particle half of the P3M split (unscaled by G).

    Returns ``correct(pos[N,2], src_mass[N]) -> [N,2]``: the exact softened
    pair force scaled by ``1 - S(d/rc)`` summed over pairs with d < rc,
    rc = cutoff_cells * (universe/grid). Complements the S-rolled mesh of
    ``make_pm_gravity(..., cutoff_cells=rc_cells)`` — together they telescope
    to the exact softened law below rc and the mesh's smooth field above.

    Neighbor search is the framework's standard dense cell grid: cells
    rc/m wide for a subdivision m in {1, 2} (scan window (2m+1)^2 shifted
    slices, pure VPU work), deterministic first-K per-cell residency
    (overflow particles get no correction — they keep the smooth mesh
    force; same drop contract as the SPH grid).

    **Occupancy sizing**: with ``n_bodies`` given, the per-cell cap K is
    derived from the expected mean occupancy (3x headroom for clustering)
    instead of trusting ``max_per_cell`` blindly — a 1M-body galaxy on a
    1024 mesh with rc = 8 cells averages ~61 bodies per rc-cell, so a
    fixed K=64 silently drops the short-range force exactly in the dense
    regions the correction exists for. When the derived K exceeds 64 the
    grid subdivides (m=2: 4x the cells, ~K/4 occupancy, 25-slice scan)
    before growing K, keeping the pair tensors bounded. The returned
    function carries ``correct.overflow_fraction(pos) -> float`` — the
    fraction of in-bounds bodies past their cell's K (no correction) —
    so dense scenes can surface the degradation instead of hiding it."""
    cell = universe / int(grid)
    rc = cutoff_cells * cell
    r0, rw = _ramp(rc, cell)
    K = int(max_per_cell)
    m = 1
    nc = int(math.ceil(universe / rc))
    if n_bodies is not None:
        need = int(math.ceil(3.0 * n_bodies / float(nc * nc)))
        if need > 64:
            # subdivide before growing K: 4x the cells, ~1/4 occupancy each
            m = 2
            nc = int(math.ceil(universe / (rc / m)))
            need = int(math.ceil(3.0 * n_bodies / float(nc * nc)))
        # config K is a per-AREA floor (never drop more pairs than asked):
        # after subdividing, the same capacity spreads over m^2 cells, so
        # the floor scales by 1/m^2 — keeping the raw K as a per-cell
        # floor under m=2 quadrupled capacity and made the pair tensors
        # [nc, nc, K, K] explode (64 -> ~1 GB per temporary at nc=256).
        # The occupancy-derived need (3x-mean headroom) grows it; 128
        # bounds the pair tensors; overflow_fraction reports any drops.
        K = min(max(-(-K // (m * m)), need), 128)
    ccell = rc / m                     # actual cell width
    ncells = nc * nc
    s2c = float(softener) * float(softener)
    rc2 = rc * rc

    def correct(pos, src_mass):
        N = pos.shape[0]
        x, y = pos[:, 0], pos[:, 1]
        gx = jnp.floor(x / ccell).astype(jnp.int32)
        gy = jnp.floor(y / ccell).astype(jnp.int32)
        ok = (gx >= 0) & (gx < nc) & (gy >= 0) & (gy < nc)
        cid = jnp.where(ok, gy * nc + gx, ncells)
        order = jnp.argsort(cid, stable=False)
        counts = jnp.zeros((ncells + 1,), jnp.int32).at[cid].add(1)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(counts[:-1], dtype=jnp.int32)])
        sc = cid[order]
        rank = jnp.arange(N) - start[jnp.clip(sc, 0, ncells)]
        valid = (sc < ncells) & (rank < K)
        slot = jnp.where(valid, sc * K + rank, ncells * K)
        slot_p = jnp.full((N,), ncells * K, jnp.int32).at[order].set(
            slot.astype(jnp.int32))

        def scat(f):
            flat = jnp.zeros((ncells * K + 1,), dtype)
            flat = flat.at[slot_p].set(f.astype(dtype), mode="drop")
            return jnp.pad(flat[:ncells * K].reshape(nc, nc, K),
                           ((m, m), (m, m), (0, 0)))

        Dx, Dy = scat(x), scat(y)
        Dm, Do = scat(src_mass), scat(jnp.ones_like(x))
        ctr = lambda v: v[m:-m, m:-m]
        cx = ctr(Dx)[..., :, None]            # [nc, nc, K, 1]
        cy = ctr(Dy)[..., :, None]
        co = ctr(Do)[..., :, None]
        kk = jnp.arange(K)
        diag = kk[:, None] == kk[None, :]
        accx = jnp.zeros((nc, nc, K), dtype)
        accy = jnp.zeros((nc, nc, K), dtype)

        def offset_pass(accx, accy, dy_, dx_, center):
            """One (dy, dx) shifted-slice pair pass. ``center`` (python
            bool or traced bool) excludes the self-pair diagonal."""
            sl = lambda v: jax.lax.dynamic_slice(
                v, (dy_, dx_, 0), (nc, nc, K))[..., None, :]
            ddx = sl(Dx) - cx             # j - i -> [nc, nc, K, K]
            ddy = sl(Dy) - cy
            d2g = ddx * ddx + ddy * ddy
            pair = (co * sl(Do)) > 0
            pair = pair & ~(diag & center)
            pair = pair & (d2g < rc2)
            w = (1.0 - _smoothstep5((jnp.sqrt(d2g) - r0) / rw)) \
                / jnp.power(jnp.maximum(d2g + s2c, 1e-30), 1.5)
            w = jnp.where(pair, sl(Dm) * w, 0.0)
            return accx + (w * ddx).sum(-1), accy + (w * ddy).sum(-1)

        if ncells <= 8192 or jax.default_backend() == "tpu":
            # small grids (and TPU, whose compiler handles the unroll —
            # the r4 galaxy bench path, kept pending a chip A/B): unrolled
            # offsets fuse best (same switch rule as the SPH cell-dense
            # passes, systems/fluid/sph.py)
            for dy_ in range(2 * m + 1):
                for dx_ in range(2 * m + 1):
                    accx, accy = offset_pass(accx, accy, dy_, dx_,
                                             dy_ == m and dx_ == m)
        else:
            # big grids: 25 unrolled [nc, nc, K, K] passes explode XLA
            # compile time/memory — scan one traced pass over the offsets
            offs = jnp.asarray([(dy_, dx_)
                                for dy_ in range(2 * m + 1)
                                for dx_ in range(2 * m + 1)], jnp.int32)

            def body(carry, off):
                ax_, ay_ = carry
                ax_, ay_ = offset_pass(
                    ax_, ay_, off[0], off[1],
                    (off[0] == m) & (off[1] == m))
                return (ax_, ay_), None

            (accx, accy), _ = jax.lax.scan(body, (accx, accy), offs)

        fx_flat = jnp.concatenate([accx.reshape(-1),
                                   jnp.zeros((1,), dtype)])
        fy_flat = jnp.concatenate([accy.reshape(-1),
                                   jnp.zeros((1,), dtype)])
        s = jnp.clip(slot_p, 0, ncells * K)
        res = slot_p < ncells * K
        ax = jnp.where(res, fx_flat[s], 0.0)
        ay = jnp.where(res, fy_flat[s], 0.0)
        return jnp.stack([ax, ay], axis=-1)

    def overflow_fraction(pos) -> float:
        """Host diagnostic: fraction of in-bounds bodies whose cell rank
        is past K (they silently keep only the rolled-off mesh force)."""
        p = np.asarray(pos, np.float64)
        gx = np.floor(p[:, 0] / ccell).astype(np.int64)
        gy = np.floor(p[:, 1] / ccell).astype(np.int64)
        ok = (gx >= 0) & (gx < nc) & (gy >= 0) & (gy < nc)
        if not ok.any():
            return 0.0
        cnt = np.bincount(gy[ok] * nc + gx[ok], minlength=ncells)
        return float(np.maximum(cnt - K, 0).sum() / ok.sum())

    correct.overflow_fraction = overflow_fraction
    correct.K = K
    correct.subdivision = m
    correct.ncells = ncells
    return correct


def make_heavy_direct(heavy_cap: int, softener: float):
    """Exact direct force from up to ``heavy_cap`` dynamically-selected heavy
    sources (unscaled by G): acc(pos, mass, heavy_mask) -> [N,2]."""
    soft2 = softener * softener

    def accel(pos, mass, heavy_mask):
        n = pos.shape[0]
        (hidx,) = jnp.nonzero(heavy_mask, size=heavy_cap, fill_value=n)
        hvalid = hidx < n
        hi = jnp.where(hvalid, hidx, 0)
        hpos = pos[hi]                             # [H,2]
        hm = jnp.where(hvalid, mass[hi], 0.0)
        dx = hpos[None, :, 0] - pos[:, None, 0]    # [N,H]
        dy = hpos[None, :, 1] - pos[:, None, 1]
        d2 = dx * dx + dy * dy + soft2
        self_pair = jnp.arange(n)[:, None] == hi[None, :]
        w = jnp.where(self_pair, 0.0, hm[None, :] / (d2 * jnp.sqrt(d2)))
        return jnp.stack([(w * dx).sum(1), (w * dy).sum(1)], axis=-1)

    return accel

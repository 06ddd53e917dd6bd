"""Particle-mesh (PM) N-body gravity for large N.

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
direction along the separation (barnes_hut.cpp:284-307). Mesh smearing plays
the role of theta-approximation error; at the default 512^2 mesh it is of
the same order (~1%) as theta=0.5 at the reference's scales (validated in
tests/test_barnes_hut.py against the exact direct sum).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.constants import REAL_G


def make_pm_gravity(universe: float, grid: int, softener: float,
                    dtype=jnp.float32):
    """Returns ``accel(pos[N,2], src_mass[N]) -> [N,2]`` (unscaled by G).

    Free-space (non-periodic) solve via zero padding to 2G x 2G. Sources
    outside the universe are dropped (the reference's buildTree also skips
    out-of-bounds bodies, barnes_hut.cpp:120-127)."""
    G = int(grid)
    cell = universe / G
    # PM cannot resolve below a cell; clamp the softening up to one cell to
    # avoid self-force noise from CIC deposit/gather asymmetry.
    soft = max(float(softener), cell)

    # force kernels K(delta) = (c - c0) / (|d|^2 + soft^2)^{3/2} arranged in
    # wrapped offset order on the padded 2G grid; precomputed once on host
    P = 2 * G
    off = np.arange(P)
    off = np.where(off < G, off, off - P).astype(np.float64) * cell
    dx = off[None, :]          # x varies along axis 1
    dy = off[:, None]
    d2 = dx * dx + dy * dy + soft * soft
    inv = 1.0 / np.power(d2, 1.5)
    kx = np.fft.rfft2(-dx * inv)       # K(c0 - c) = -(c0-c)/(...)^(3/2)
    ky = np.fft.rfft2(-dy * inv)
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

#!/usr/bin/env python
"""Primitive-cost survey on the chip for the grid-rigid design decisions.

Times, per call inside a 20-rep jitted loop (amortizes tunnel overhead):
- nonzero compaction at candidate-tensor sizes
- scatter/gather at pair-list sizes
- segmented cumsum, argsort, bincount at body sizes
- one solver iteration: dense k-select-sum vs indexed gather/scatter
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=20):
    f = jax.jit(lambda *a: fn(*a))
    r = f(*args)
    jax.tree.map(lambda x: np.asarray(x), r)   # hard sync
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*args)
    jax.tree.map(lambda x: np.asarray(x), r)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return r


def rep(fn, n=20):
    """Wrap fn in a fori_loop of n applications (output feeds back a scalar
    dependency so XLA cannot hoist), reporting per-application time."""
    def outer(*args):
        def body(_, carry):
            s, = carry
            out = fn(*args, s)
            return (out,)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0),))[0]
    return outer, n


def main():
    rng = np.random.default_rng(0)
    S, W = 10016, 244
    NC, R, KB = 576, 128, 64

    # --- nonzero compaction ------------------------------------------------
    for rows, w in ((10016, 164), (27648, 244), (10016, 244)):
        m = jnp.asarray(rng.random((rows, w)) < (40000.0 / (rows * w)))

        def nz(m, s):
            (flat,) = jnp.nonzero(m.ravel() != (s > 1e30), size=40000,
                                  fill_value=rows * w)
            return s + flat.sum().astype(jnp.float32) * 1e-30
        f, n = rep(nz)
        out = timeit(f"nonzero [{rows}x{w}]={rows*w/1e6:.1f}M -> 40k (x{n})",
                     f, m)

    # --- scatter / gather at pair sizes -------------------------------------
    idx = jnp.asarray(rng.integers(0, NC * R, 40000), jnp.int32)
    val = jnp.asarray(rng.random((40000, 3)), jnp.float32)

    def scat(idx, val, s):
        o = jnp.zeros((NC * R, 3), jnp.float32).at[idx].set(val + s * 1e-30)
        return s + o[0, 0] * 1e-30
    f, n = rep(scat)
    timeit(f"scatter 40k rows x3 -> [{NC*R}] (x{n})", f, idx, val)

    gidx = jnp.asarray(rng.integers(0, S, 80000), jnp.int32)
    big = jnp.asarray(rng.random((S, 3)), jnp.float32)

    def gath(gidx, big, s):
        g = big[gidx] + s * 1e-30
        return s + g.sum() * 1e-30
    f, n = rep(gath)
    timeit(f"gather 80k rows x3 from [{S},3] (x{n})", f, gidx, big)

    # --- sorts / cumsum ------------------------------------------------------
    keys = jnp.asarray(rng.integers(0, NC, S), jnp.int32)

    def asort(keys, s):
        o = jnp.argsort(keys + (s > 1e30), stable=False)
        return s + o.sum().astype(jnp.float32) * 1e-30
    f, n = rep(asort)
    timeit(f"argsort {S} keys (x{n})", f, keys)

    bigm = jnp.asarray(rng.random((NC, 20480)) < 0.003, jnp.float32)

    def cums(bigm, s):
        c = jnp.cumsum(bigm + s * 1e-30, axis=1)
        return s + c[0, -1] * 1e-30
    f, n = rep(cums)
    timeit(f"cumsum [{NC},20480]={NC*20480/1e6:.1f}M (x{n})", f, bigm)

    # --- solver iteration: dense select-sum vs indexed ----------------------
    # dense layout: U [NC, KB, 3]; rows [NC, R] with ka/kb slots
    U = jnp.asarray(rng.random((NC, KB, 3)), jnp.float32)
    ka = jnp.asarray(rng.integers(0, KB, (NC, R)), jnp.int32)
    kb = jnp.asarray(rng.integers(0, KB, (NC, R)), jnp.int32)
    nrm = jnp.asarray(rng.random((NC, R, 2)), jnp.float32)

    def dense_iter(U, ka, kb, nrm, s):
        U = U + s * 1e-30
        # gather both sides via k-unrolled select-sum
        va = jnp.zeros((NC, R, 3), jnp.float32)
        vb = jnp.zeros((NC, R, 3), jnp.float32)
        for k in range(KB):
            uk = U[:, k, :][:, None, :]
            va = va + jnp.where((ka == k)[..., None], uk, 0.0)
            vb = vb + jnp.where((kb == k)[..., None], uk, 0.0)
        dl = ((vb - va)[..., :2] * nrm).sum(-1)
        da = nrm * dl[..., None]
        # scatter-add back via k-unrolled masked reductions
        dU = jnp.zeros_like(U)
        for k in range(KB):
            ca = jnp.where(ka == k, dl, 0.0).sum(1)
            cb = jnp.where(kb == k, dl, 0.0).sum(1)
            dU = dU.at[:, k, 0].add(ca - cb)
        return s + dU.sum() * 1e-30 + da.sum() * 1e-30
    f, n = rep(dense_iter, 8)
    timeit(f"dense solver iter [{NC}x{R} rows, KB={KB}] (x{n})",
           f, U, ka, kb, nrm)

    # indexed layout: u [S,3], rows 80k
    u = jnp.asarray(rng.random((S, 3)), jnp.float32)
    ia = jnp.asarray(rng.integers(0, S, 73728), jnp.int32)
    ib = jnp.asarray(rng.integers(0, S, 73728), jnp.int32)
    nrm2 = jnp.asarray(rng.random((73728, 2)), jnp.float32)

    def idx_iter(u, ia, ib, nrm2, s):
        u = u + s * 1e-30
        va = u[ia]
        vb = u[ib]
        dl = ((vb - va)[:, :2] * nrm2).sum(-1)
        da = jnp.concatenate([nrm2 * dl[:, None],
                              jnp.zeros((73728, 1), jnp.float32)], 1)
        u = u.at[ia].add(-da).at[ib].add(da)
        return s + u.sum() * 1e-30
    f, n = rep(idx_iter, 8)
    timeit(f"indexed solver iter [73728 rows, S={S}] (x{n})",
           f, u, ia, ib, nrm2)


if __name__ == "__main__":
    main()

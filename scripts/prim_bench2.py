#!/usr/bin/env python
"""Primitive survey #2: slot-select implementations for the grid solver.

Variants of one velocity-solve iteration over [NC, R] rows with KB slots:
(a) broadcast-reduce one-hot (where(ka==iota)*U).sum — fused VPU reduce
(b) take_along_axis along the KB axis — XLA gather
(c) batched matmul one-hot — MXU with N-padding
Plus the per-tick costs: rebuild cumsum+placement, narrowphase-sized selects.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: fn(*a))
    r = f(*args)
    jax.tree.map(lambda x: np.asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.tree.map(lambda x: np.asarray(x), r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return r


def rep(fn, n=16):
    def outer(*args):
        def body(_, carry):
            (s,) = carry
            return (fn(*args, s),)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0),))[0]
    return outer, n


NC, R, KB = 576, 160, 48
kiota = jnp.arange(KB, dtype=jnp.int32)


def sel_bcast(U, k):
    """[NC,R,3] <- one-hot(k) . U via broadcast-reduce."""
    m = (k[..., None] == kiota[None, None, :])
    return jnp.where(m[..., None], U[:, None, :, :], 0.0).sum(2)


def scat_bcast(da, k):
    """[NC,KB,3] <- sum_r onehot(k) . da via broadcast-reduce."""
    m = (k[:, :, None] == kiota[None, None, :])
    return jnp.where(m[..., None], da[:, :, None, :], 0.0).sum(1)


def main():
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.random((NC, KB, 3)), jnp.float32)
    ka = jnp.asarray(rng.integers(0, KB, (NC, R)), jnp.int32)
    kb = jnp.asarray(rng.integers(0, KB, (NC, R)), jnp.int32)
    nrm = jnp.asarray(rng.random((NC, R, 2)), jnp.float32)

    def iter_bcast(U, ka, kb, nrm, s):
        U = U + s * 1e-30
        va = sel_bcast(U, ka)
        vb = sel_bcast(jnp.roll(U, 1, axis=0), kb)
        dl = ((vb - va)[..., :2] * nrm).sum(-1)
        da = jnp.concatenate([nrm * dl[..., None],
                              dl[..., None] * 0.1], axis=-1)
        dU = scat_bcast(-da, ka) + jnp.roll(scat_bcast(da, kb), -1, axis=0)
        return s + (U + dU).sum() * 1e-30
    f, n = rep(iter_bcast)
    timeit(f"iter bcast-reduce [{NC}x{R}, KB={KB}] (x{n})",
           f, U, ka, kb, nrm)

    def iter_taa(U, ka, kb, nrm, s):
        U = U + s * 1e-30
        va = jnp.take_along_axis(U, ka[..., None], axis=1)
        vb = jnp.take_along_axis(jnp.roll(U, 1, axis=0), kb[..., None],
                                 axis=1)
        dl = ((vb - va)[..., :2] * nrm).sum(-1)
        da = jnp.concatenate([nrm * dl[..., None],
                              dl[..., None] * 0.1], axis=-1)
        dU = jnp.zeros_like(U)
        cc = jnp.arange(NC, dtype=jnp.int32)[:, None] * 0
        dU = dU.at[cc + jnp.arange(NC)[:, None], ka].add(-da)
        dU = dU.at[cc + jnp.arange(NC)[:, None], kb].add(da)
        return s + (U + dU).sum() * 1e-30
    f, n = rep(iter_taa)
    timeit(f"iter take_along_axis/at-add (x{n})", f, U, ka, kb, nrm)

    def iter_mm(U, ka, kb, nrm, s):
        U = U + s * 1e-30
        oha = (ka[..., None] == kiota[None, None, :]).astype(jnp.float32)
        ohb = (kb[..., None] == kiota[None, None, :]).astype(jnp.float32)
        va = jnp.einsum("crk,ckd->crd", oha, U)
        vb = jnp.einsum("crk,ckd->crd", ohb, jnp.roll(U, 1, axis=0))
        dl = ((vb - va)[..., :2] * nrm).sum(-1)
        da = jnp.concatenate([nrm * dl[..., None],
                              dl[..., None] * 0.1], axis=-1)
        dU = (jnp.einsum("crk,crd->ckd", oha, -da)
              + jnp.roll(jnp.einsum("crk,crd->ckd", ohb, da), -1, axis=0))
        return s + (U + dU).sum() * 1e-30
    f, n = rep(iter_mm)
    timeit(f"iter batched-matmul one-hot (x{n})", f, U, ka, kb, nrm)

    # narrowphase-scale select: verts [NC,KB,7,2] -> [NC,R,7,2], once
    Vg = jnp.asarray(rng.random((NC, KB, 7, 2)), jnp.float32)

    def sel_verts(Vg, ka, s):
        m = (ka[..., None] == kiota[None, None, :])
        out = jnp.where(m[..., None, None], Vg[:, None], 0.0).sum(2)
        return s + out.sum() * 1e-30
    f, n = rep(sel_verts, 4)
    timeit(f"verts select [NC,R,7,2] (x{n})", f, Vg, ka)

    # rebuild-scale: cumsum over [NC*KB, 324] + 8-slot placement
    m324 = jnp.asarray(rng.random((NC * KB, 324)) < 0.02)

    def stage1(m, s):
        r = jnp.cumsum(m.astype(jnp.int32), axis=1)
        out = 0.0
        for slot in range(8):
            pick = m & (r == slot + 1)
            out = out + jnp.where(
                pick, jnp.arange(324, dtype=jnp.int32)[None, :], 0).sum()
        return s + out.astype(jnp.float32) * 1e-30
    f, n = rep(stage1, 4)
    timeit(f"stage1 cumsum+place [{NC*KB},324] (x{n})", f, m324)


if __name__ == "__main__":
    main()

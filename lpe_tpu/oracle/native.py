"""ctypes binding for the native CPU reference engine (native/sph_ref.cpp).

The shared library is compiled on first use (g++ is part of the toolchain);
callers should catch ``NativeUnavailable`` and fall back to the NumPy oracle
when no compiler is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "liblpe_ref.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "sph_ref.cpp"))
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            raise NativeUnavailable(f"cannot build native engine: {e}")
    lib = ctypes.CDLL(so)
    d = ctypes.POINTER(ctypes.c_double)
    lib.lpe_sph_run.restype = ctypes.c_int
    lib.lpe_sph_run.argtypes = [
        ctypes.c_int, d, d, d, d, d,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
    ]
    _LIB = lib
    return lib


class NativeSphOracle:
    """Drop-in counterpart of :class:`lpe_tpu.oracle.sph_numpy.SphOracle`
    backed by the native engine (same math, same tick structure)."""

    def __init__(self, *, h=0.05, rest_density=0.5, stiffness=200.0,
                 viscosity=0.03, gravity=9.8, dt_tick=1.0 / 120.0,
                 num_sub_steps=10, universe=6.0, margin=0.15,
                 bounce_damping=0.7, max_speed=1.0,
                 min_dist2=1e-14, min_density=1e-12):
        self.p = dict(h=h, rest_density=rest_density, stiffness=stiffness,
                      viscosity=viscosity, gravity=gravity, dt_tick=dt_tick,
                      num_sub_steps=num_sub_steps, universe=universe,
                      margin=margin, bounce_damping=bounce_damping,
                      max_speed=max_speed, min_dist2=min_dist2,
                      min_density=min_density)
        self._lib = _load()

    def run(self, pos, vel, mass, ticks: int):
        """Advance `ticks` ticks in place on float64 copies; returns
        (pos, vel, rho, pres)."""
        n = len(pos)
        pos = np.ascontiguousarray(pos, np.float64).copy()
        vel = np.ascontiguousarray(vel, np.float64).copy()
        mass = np.ascontiguousarray(mass, np.float64)
        rho = np.zeros(n)
        pres = np.zeros(n)
        d = ctypes.POINTER(ctypes.c_double)
        c = lambda a: a.ctypes.data_as(d)
        p = self.p
        rc = self._lib.lpe_sph_run(
            n, c(pos), c(vel), c(mass), c(rho), c(pres),
            p["h"], p["rest_density"], p["stiffness"], p["viscosity"],
            p["gravity"], p["dt_tick"], p["num_sub_steps"],
            p["universe"], p["margin"], p["bounce_damping"], p["max_speed"],
            p["min_dist2"], p["min_density"], ticks)
        if rc != 0:
            raise RuntimeError(f"lpe_sph_run failed rc={rc}")
        return pos, vel, rho, pres

    def tick(self, pos, vel, mass):
        return self.run(pos, vel, mass, 1)

"""ctypes bindings for the native C++ CPU solver (csrc/mgpoisson_cpu.cpp)
— the rebuild of the reference's raw-pointer CPU variant (cpu-raw.lua).

The shared library is built on demand with the repo Makefile (no build
step required at install time; the reference's LuaJIT FFI ethos, native
code loaded straight from the session).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SMOOTHERS = {"jacobi": 0, "rbgs": 1, "wjacobi": 2}
_SCHEMES = {"reference": 0, "tuned": 1}

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmgpoisson_cpu.so")

_lib = None


_ABI_VERSION = 2


def _load():
    global _lib
    if _lib is not None:
        return _lib
    # always invoke make: a no-op when fresh, and rebuilds a stale .so
    # left by an older source tree (which would otherwise silently run
    # different numerics)
    subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mg_abi_version.restype = ctypes.c_int
    got = lib.mg_abi_version()
    if got != _ABI_VERSION:
        raise RuntimeError(
            f"libmgpoisson_cpu.so ABI {got} != expected {_ABI_VERSION}; "
            f"run 'make -C {_CSRC} clean' and retry")
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.mg_point_charge_rhs.argtypes = [dptr, ctypes.c_int]
    lib.mg_v_cycle.argtypes = [dptr, dptr, ctypes.c_int, ctypes.c_double,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.mg_solve.argtypes = [dptr, dptr, ctypes.c_int, ctypes.c_double,
                             ctypes.c_double, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, dptr]
    lib.mg_solve.restype = ctypes.c_int
    lib.mg_residual_norm.argtypes = [dptr, dptr, ctypes.c_int,
                                     ctypes.c_double]
    lib.mg_residual_norm.restype = ctypes.c_double
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class MultigridNative:
    """Native CPU solver with the reference's API shape
    (`MultigridCPURaw`, cpu-raw.lua:118-258): construct, run V-cycles,
    solve to tolerance.  2D float64 only."""

    def __init__(self, size: int, *, scheme: str = "reference",
                 smoother: Optional[str] = None,
                 pre_smooth: Optional[int] = None,
                 post_smooth: Optional[int] = None,
                 tol: float = 1e-10, maxiter: int = 1000,
                 coarse_size: int = 1, h: Optional[float] = None):
        if size & (size - 1):
            raise ValueError(f"size must be a power of two, got {size}")
        defaults = {"reference": ("jacobi", 7), "tuned": ("wjacobi", 3)}
        def_smoother, def_nu = defaults[scheme]
        self.size = size
        self.scheme = scheme
        self.smoother = smoother or def_smoother
        self.pre_smooth = def_nu if pre_smooth is None else pre_smooth
        self.post_smooth = def_nu if post_smooth is None else post_smooth
        self.tol = tol
        self.maxiter = maxiter
        self.coarse_size = coarse_size
        self.h = 1.0 / size if h is None else h
        self._lib = _load()

    def point_charge_rhs(self) -> np.ndarray:
        f = np.empty((self.size, self.size), np.float64)
        self._lib.mg_point_charge_rhs(_ptr(f), self.size)
        return f

    def v_cycle(self, u: np.ndarray, f: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(u, np.float64).copy()
        f = np.ascontiguousarray(f, np.float64)
        self._lib.mg_v_cycle(_ptr(u), _ptr(f), self.size, self.h,
                             self.pre_smooth, self.post_smooth,
                             _SMOOTHERS[self.smoother],
                             _SCHEMES[self.scheme], self.coarse_size)
        return u

    def solve(self, f: Optional[np.ndarray] = None,
              psi0: Optional[np.ndarray] = None):
        """Returns (psi, errs) like the oracle's solve."""
        f = self.point_charge_rhs() if f is None else np.ascontiguousarray(
            f, np.float64)
        psi = (-f).copy() if psi0 is None else np.ascontiguousarray(
            psi0, np.float64).copy()
        errs = np.empty(self.maxiter, np.float64)
        it = self._lib.mg_solve(_ptr(psi), _ptr(f), self.size, self.h,
                                self.tol, self.maxiter, self.pre_smooth,
                                self.post_smooth,
                                _SMOOTHERS[self.smoother],
                                _SCHEMES[self.scheme], self.coarse_size,
                                _ptr(errs))
        return psi, errs[:it].copy()

    def residual_norm(self, u: np.ndarray, f: np.ndarray) -> float:
        u = np.ascontiguousarray(u, np.float64)
        f = np.ascontiguousarray(f, np.float64)
        return float(self._lib.mg_residual_norm(_ptr(u), _ptr(f),
                                                self.size, self.h))

"""Pure-NumPy float64 oracle for differential testing.

This module encodes the reference algorithm's *exact* numerics
(thenumbernine/lua-multigrid-poisson) in plain NumPy so the JAX/XLA and
Pallas paths can be diffed against it per stage and per level — the
modern form of the reference's own primary test mechanism: debug dumps
"in a way that I can compare it with the cpu/gpu versions"
(`cpu.lua:17-18`, `cpu-raw.lua:120-121`, `gpu.lua:20-21`).

Two schemes are encoded:

- scheme='reference' — bit-faithful to the reference:
  zero-ghost Dirichlet at every level (`cpu.lua:28-31`), Jacobi 7+7
  (`cpu.lua:20,57`), piecewise-constant injection prolongation
  (`cpu.lua:142-151`), rediscretized coarse operators (`cpu.lua:139`).
  As the dense two-grid analysis in tests/test_convergence shows, this
  scheme's V-cycle rate degrades with grid size (undamped Jacobi leaves
  the (pi,pi) mode undamped, and the rediscretized zero-ghost coarse
  operator is 2x the Galerkin operator for this transfer pair) — the
  reference's own harness shows the same slow convergence.

- scheme='tuned' — same fine-level problem (identical fixed point:
  zero-ghost 5/7-point operator, so it converges to the same discrete
  solution), but coarse levels use face-Dirichlet rediscretized
  operators (ghost = -u, boundary at the cell face — the boundary
  location no longer moves with the level), face-adapted bilinear
  prolongation, and damped-Jacobi smoothing (red-black GS also
  available).  Level-independent V-cycle factors: wjacobi ~0.12 (2+2) /
  ~0.10 (3+3), rbgs ~0.22 (2+2): <10 cycles to 1e-10 relative residual
  at the north-star 4096^2 config.

Reference semantics reproduced (file:line cites into /root/reference):
- 5-point (2D) / 7-point (3D) Laplacian, zero-ghost: OOB neighbors read
  as 0 (`cpu.lua:28-31`, `gpu.lua:72-75`).
- Jacobi sweep u' = (f - askew_u)/adiag, askew_u = sum(nbrs)/h^2,
  adiag = -2*ndim/h^2, out-of-place (`cpu.lua:40-54`, `gpu.lua:83-102`).
- Gauss-Seidel in-place (`cpu.lua:24-37`): provided in deterministic
  red-black order (the reference documents plain GS as racy on parallel
  hardware, `gpu.lua:61-62`) plus exact lexicographic order for parity.
- Residual r = f - (askew_u + adiag*u) (`cpu.lua:111-124`).
- Restriction: 2^ndim-cell average, exact 1/4 (1/8) weights
  (`cpu.lua:127-136`, `gpu.lua:126-137`).
- Prolongation: constant injection to 2^ndim children (`cpu.lua:142-151`);
  correction u += v (`cpu.lua:154-158`, addTo `gpu.lua:163-171`).
- V-cycle (twoGrid): pre-smooth, residual, restrict, recurse with V=0,
  prolong, correct, post-smooth; 1x1 base = single smoother application
  (`cpu.lua:70-165`).
- Convergence: err = sqrt(sum((psi-psi_old)^2)/N) — RMS of the UPDATE
  (`cpu.lua:203`); stop when err < tol or non-finite (`cpu.lua:214`);
  errorCallback(iter, err) early exit (`cpu.lua:213`).
- Secondary metric: masked |1 - psi/psi_old| (calcRelErr,
  `gpu.lua:173-187`).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

import numpy as np

Trace = List[Tuple[str, int, np.ndarray]]


# ---------------------------------------------------------------- stencil ops

def neighbor_sum(u: np.ndarray, bc: str = "ghost0") -> np.ndarray:
    """Sum of the 2*ndim face neighbors.

    bc='ghost0': out-of-range neighbors read 0 (`cpu.lua:28-31`).
    bc='face'  : ghost = -u_edge (Dirichlet on the cell face; used by
                 the tuned scheme's coarse levels).
    """
    s = np.zeros_like(u)
    for ax in range(u.ndim):
        lo = [slice(None)] * u.ndim
        hi = [slice(None)] * u.ndim
        lo[ax] = slice(1, None)
        hi[ax] = slice(None, -1)
        s[tuple(lo)] += u[tuple(hi)]
        s[tuple(hi)] += u[tuple(lo)]
        if bc == "face":
            first = [slice(None)] * u.ndim
            last = [slice(None)] * u.ndim
            first[ax] = 0
            last[ax] = -1
            s[tuple(first)] -= u[tuple(first)]
            s[tuple(last)] -= u[tuple(last)]
    return s


def jacobi_sweep(u: np.ndarray, f: np.ndarray, h: float,
                 bc: str = "ghost0") -> np.ndarray:
    """One out-of-place Jacobi sweep (`cpu.lua:40-54`)."""
    hsq = h * h
    askew = neighbor_sum(u, bc) / hsq
    adiag = -2.0 * u.ndim / hsq
    return (f - askew) / adiag


def _parity_mask(shape: Tuple[int, ...], parity: int) -> np.ndarray:
    idx = np.zeros(shape, dtype=np.int64)
    for ax, n in enumerate(shape):
        sh = [1] * len(shape)
        sh[ax] = n
        idx = idx + np.arange(n).reshape(sh)
    return (idx % 2) == parity


def wjacobi_sweep(u: np.ndarray, f: np.ndarray, h: float,
                  bc: str = "ghost0") -> np.ndarray:
    """Damped Jacobi with the dimension-optimal factor
    omega = 2d/(2d+1) (4/5 in 2D, 6/7 in 3D) — unlike the reference's
    undamped Jacobi, this actually damps the (pi,..,pi) mode, giving
    the tuned scheme its level-independent rate (~0.12 in 2D)."""
    omega = 2.0 * u.ndim / (2.0 * u.ndim + 1.0)
    return u + omega * (jacobi_sweep(u, f, h, bc) - u)


def rbgs_sweep(u: np.ndarray, f: np.ndarray, h: float,
               bc: str = "ghost0") -> np.ndarray:
    """One red-black Gauss-Seidel sweep: red (even parity) with old
    neighbors, then black with the updated reds."""
    hsq = h * h
    adiag = -2.0 * u.ndim / hsq
    u = u.copy()
    for parity in (0, 1):
        mask = _parity_mask(u.shape, parity)
        upd = (f - neighbor_sum(u, bc) / hsq) / adiag
        u[mask] = upd[mask]
    return u


def gs_lex_sweep(u: np.ndarray, f: np.ndarray, h: float,
                 bc: str = "ghost0") -> np.ndarray:
    """Lexicographic Gauss-Seidel, exactly the reference's loop order
    (`cpu.lua:24-37`: i outer, j inner, in-place).  Scalar loops — for
    small-grid parity tests only.  bc='ghost0' only."""
    assert bc == "ghost0"
    hsq = h * h
    adiag = -2.0 * u.ndim / hsq
    u = u.copy()
    for idx in np.ndindex(u.shape):
        s = 0.0
        for ax in range(u.ndim):
            for d in (-1, 1):
                j = list(idx)
                j[ax] += d
                if 0 <= j[ax] < u.shape[ax]:
                    s += u[tuple(j)]
        u[idx] = (f[idx] - s / hsq) / adiag
    return u


def residual(u: np.ndarray, f: np.ndarray, h: float,
             bc: str = "ghost0") -> np.ndarray:
    """r = f - A u (`cpu.lua:111-124`)."""
    hsq = h * h
    askew = neighbor_sum(u, bc) / hsq
    adiag = -2.0 * u.ndim / hsq
    return f - (askew + adiag * u)


def apply_operator(u: np.ndarray, h: float, bc: str = "ghost0") -> np.ndarray:
    """Matrix-free A u — the operator the Krylov harness solves against
    (`test/converge-multigrid-vs-krylov.lua:46-58`)."""
    hsq = h * h
    return (neighbor_sum(u, bc) - 2.0 * u.ndim * u) / hsq


def restrict(r: np.ndarray) -> np.ndarray:
    """Full-weighting restriction: mean over each 2^ndim cell block
    (exact 1/4 in 2D, `cpu.lua:127-136`; 1/8 in 3D)."""
    for ax in range(r.ndim):
        n = r.shape[ax]
        shape = r.shape[:ax] + (n // 2, 2) + r.shape[ax + 1:]
        r = r.reshape(shape).mean(axis=ax + 1)
    return r


def prolong(V: np.ndarray, kind: str = "inject") -> np.ndarray:
    """Prolongation coarse -> fine.

    kind='inject': piecewise-constant injection, each coarse cell copied
    to its 2^ndim children (`cpu.lua:142-151`) — the reference's
    operator; matching it is required to reproduce its convergence
    counts.

    kind='bilinear': cell-centered bi/trilinear interpolation with
    face-Dirichlet boundary weights (fine boundary child = 0.5 * coarse
    edge cell, interpolating to zero at the face) — the tuned scheme.
    """
    if kind == "inject":
        for ax in range(V.ndim):
            V = np.repeat(V, 2, axis=ax)
        return V
    assert kind == "bilinear"
    nd = V.ndim
    for ax in range(nd):
        sl = lambda a, b: tuple(slice(None) if i != ax else slice(a, b)
                                for i in range(nd))
        pad = [(0, 0)] * nd
        pad[ax] = (1, 1)
        Vp = np.pad(V, pad)
        lo = 0.25 * Vp[sl(0, -2)] + 0.75 * Vp[sl(1, -1)]
        hi = 0.75 * Vp[sl(1, -1)] + 0.25 * Vp[sl(2, None)]
        loidx = [slice(None)] * nd
        hiidx = [slice(None)] * nd
        loidx[ax] = 0
        hiidx[ax] = -1
        lo[tuple(loidx)] = 0.5 * V[tuple(loidx)]
        hi[tuple(hiidx)] = 0.5 * V[tuple(hiidx)]
        st = np.stack([lo, hi], axis=ax + 1)
        V = st.reshape(V.shape[:ax] + (2 * V.shape[ax],) + V.shape[ax + 1:])
    return V


def coarse_solve(u: np.ndarray, f: np.ndarray, h: float, smoother: str,
                 bc: str = "ghost0") -> np.ndarray:
    """Coarsest-level solve.

    bc='ghost0': single smoother application (`cpu.lua:76-94`) — exact
    at 1x1 (neighbors are ghosts).
    bc='face': exact 1x1 solve with ghost = -u: u = f*h^2 / (-4*ndim).
    """
    if bc == "face" and u.shape[0] == 1:
        return f * (h * h) / (-4.0 * u.ndim)
    sweep = SMOOTHERS[smoother]
    return sweep(u, f, h, bc)


SMOOTHERS = {
    "jacobi": jacobi_sweep,
    "wjacobi": wjacobi_sweep,
    "rbgs": rbgs_sweep,
    "gs_lex": gs_lex_sweep,
}

SCHEMES = {
    # (coarse bc, prolongation kind, default smoother, default nu)
    "reference": ("ghost0", "inject", "jacobi", 7),
    "tuned": ("face", "bilinear", "wjacobi", 3),
}


# ------------------------------------------------------------------- V-cycle

def v_cycle(u: np.ndarray, f: np.ndarray, h: float, *,
            pre_smooth: int = 7, post_smooth: int = 7,
            smoother: str = "jacobi", coarse_size: int = 1,
            scheme: str = "reference", fine_level: bool = True,
            trace: Optional[Trace] = None) -> np.ndarray:
    """One V-cycle — the reference's recursive twoGrid (`cpu.lua:70-165`).

    The fine level always uses the zero-ghost operator (the problem
    definition); coarse levels use the scheme's bc.  When `trace` is a
    list, named per-stage snapshots are appended in recursion order so
    traces from any implementation can be diffed — the reference's
    debug-dump differential mechanism (`cpu-raw.lua:126-140`).
    """
    coarse_bc, prolong_kind, _, _ = SCHEMES[scheme]
    bc = "ghost0" if fine_level else coarse_bc
    sweep = SMOOTHERS[smoother]
    n = u.shape[0]

    def rec(name, arr):
        if trace is not None:
            trace.append((name, arr.shape[0], arr.copy()))

    if n <= coarse_size:
        rec("f", f)
        u = coarse_solve(u, f, h, smoother, bc)
        rec("u", u)
        return u

    for _ in range(pre_smooth):
        u = sweep(u, f, h, bc)
    rec("u_pre", u)

    r = residual(u, f, h, bc)
    rec("r", r)

    R = restrict(r)
    rec("R", R)

    V = np.zeros_like(R)
    V = v_cycle(V, R, 2 * h, pre_smooth=pre_smooth, post_smooth=post_smooth,
                smoother=smoother, coarse_size=coarse_size, scheme=scheme,
                fine_level=False, trace=trace)
    rec("V", V)

    v = prolong(V, prolong_kind)
    rec("v", v)

    u = u + v
    rec("u_corr", u)

    for _ in range(post_smooth):
        u = sweep(u, f, h, bc)
    rec("u_post", u)
    return u


# ------------------------------------------------------------------- metrics

def rms_update(psi: np.ndarray, psi_old: np.ndarray) -> float:
    """sqrt(sum((psi - psi_old)^2) / N) (`cpu.lua:203`, calcFrobErr
    `gpu.lua:361-369`)."""
    d = psi - psi_old
    return float(np.sqrt(np.sum(d * d) / psi.size))


def rel_err(psi: np.ndarray, psi_old: np.ndarray) -> float:
    """Masked mean |1 - psi/psi_old| over cells with psi_old != 0 and
    psi_old != psi (calcRelErr + count normalization,
    `gpu.lua:173-187`, `test/test-gpu-obj.lua:236-243`)."""
    mask = (psi_old != 0) & (psi_old != psi)
    if not mask.any():
        return 0.0
    return float(np.mean(np.abs(1.0 - psi[mask] / psi_old[mask])))


def residual_norm(u: np.ndarray, f: np.ndarray, h: float) -> float:
    """L2 norm of the true (fine, zero-ghost) residual — the metric
    BASELINE.json tracks alongside the reference's update-RMS."""
    r = residual(u, f, h)
    return float(np.sqrt(np.sum(r * r)))


# --------------------------------------------------------------------- solve

def point_charge_rhs(size: int, ndim: int = 2,
                     charge: float = 1e6, epsilon0: float = 1.0) -> np.ndarray:
    """f = -charge/epsilon0 at the center cell (`cpu-raw.lua:8-20`)."""
    f = np.zeros((size,) * ndim, dtype=np.float64)
    f[(size // 2,) * ndim] = -charge / epsilon0
    return f


def solve(size: int = 64, ndim: int = 2, *, f: Optional[np.ndarray] = None,
          tol: float = 1e-10, maxiter: int = 1000,
          pre_smooth: Optional[int] = None, post_smooth: Optional[int] = None,
          smoother: Optional[str] = None, coarse_size: int = 1,
          scheme: str = "reference", h: Optional[float] = None,
          error_callback: Optional[Callable[[int, float], bool]] = None):
    """Iterate V-cycles to convergence (`cpu.lua:196-216`).

    Returns (psi, errs) with errs[k] = RMS-update error after cycle k+1.
    """
    _, _, def_smoother, def_nu = SCHEMES[scheme]
    smoother = smoother or def_smoother
    pre_smooth = def_nu if pre_smooth is None else pre_smooth
    post_smooth = def_nu if post_smooth is None else post_smooth
    if f is None:
        f = point_charge_rhs(size, ndim)
    psi = -f
    h = 1.0 / size if h is None else h
    errs: List[float] = []
    for it in range(1, maxiter + 1):
        psi_old = psi.copy()
        psi = v_cycle(psi, f, h, pre_smooth=pre_smooth,
                      post_smooth=post_smooth, smoother=smoother,
                      coarse_size=coarse_size, scheme=scheme)
        err = rms_update(psi, psi_old)
        errs.append(err)
        if error_callback is not None and error_callback(it, err):
            break
        if err < tol or not math.isfinite(err):
            break
    return psi, errs

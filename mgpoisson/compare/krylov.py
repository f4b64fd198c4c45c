"""Matrix-free Krylov solvers — the independent solver family the
reference compares multigrid against (`test/converge-multigrid-vs-krylov.lua`).

The reference drives its author's `solver.*` Lua library with a
matrix-free 5-point Laplacian closure and zero-ghost BCs (`:46-58`),
running conjugate gradients (enabled) plus conjres / bicgstab / gmres
(present but commented out, `:31-36`).  Agreement between two unrelated
algorithm families is the correctness gate (SURVEY.md section 4.3).

Here: CG, conjugate residual (CR), and BiCGStab, all matrix-free
against the same `apply_operator` the multigrid path uses, fully
on-device via lax.while_loop.  The operator A = del^2 (zero-ghost) is
negative definite, so CG/CR run on (-A)u = (-f) internally — same
solution, SPD iteration.

Reference semantics kept:
- x0 = -f (`:44`, mirroring psi0 = -f)
- per-iteration errorCallback(err, iter) hook (`:59-67`)
- iterate until ||r||^2 / ||b||^2 < tol^2 (the `solver.*` convention)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mgpoisson.kernels import xla


@dataclasses.dataclass
class KrylovResult:
    x: jax.Array
    iterations: int
    converged: bool
    residuals: jax.Array   # ||r||/||b|| history, length `iterations`
    # per-iteration ||x||_inf — what the reference harness records from
    # its Krylov errorCallback(err, iter, psi, ...) hook
    # (`test/converge-multigrid-vs-krylov.lua:59-67`); recorded on
    # device inside the solve loop (no per-iteration host sync).  For
    # gmres the iterate only exists at restart boundaries, so each
    # cycle's end value is repeated for its inner steps.
    xnorms: Optional[jax.Array] = None


def _dot(a, b):
    return jnp.sum(a * b)


def poisson_operator(h: float, bc: str = "ghost0") -> Callable:
    """The same matrix-free operator the reference harness builds
    (`test/converge-multigrid-vs-krylov.lua:46-58`)."""
    return lambda u: xla.apply_operator(u, h, bc)


def _run_loop(body, init, maxiter, tol, bnorm, rnorm0):
    """Shared while_loop driver; carry = (state..., it, rnorm, hist,
    xhist).  state[0] is the iterate x by convention; its L-inf norm is
    recorded per iteration on device (the reference hook's metric)."""

    def cond(carry):
        *_, it, rnorm, _hist, _xhist = carry
        return (it < maxiter) & (rnorm > tol * bnorm) & jnp.isfinite(rnorm)

    def wrapped(carry):
        *state, it, rnorm, hist, xhist = carry
        state, rnorm = body(state)
        hist = hist.at[it].set((rnorm / bnorm).astype(hist.dtype))
        xhist = xhist.at[it].set(
            jnp.max(jnp.abs(state[0])).astype(xhist.dtype))
        return (*state, it + 1, rnorm, hist, xhist)

    hist0 = jnp.full((maxiter,), jnp.nan, dtype=rnorm0.dtype)
    carry = jax.lax.while_loop(cond, wrapped, (*init, jnp.int32(0),
                                               rnorm0, hist0, hist0))
    *state, it, rnorm, hist, xhist = carry
    return state, it, rnorm, hist, xhist


def cg(A: Callable, b: jax.Array, x0: Optional[jax.Array] = None, *,
       tol: float = 1e-10, maxiter: int = 10000,
       error_callback=None) -> KrylovResult:
    """Conjugate gradients on the (negated, SPD) Poisson system."""
    # negate so the operator is SPD (A itself is negative definite)
    An = lambda u: -A(u)
    bn = -b
    x = -b if x0 is None else x0      # reference: x = -f (`:44`)
    return _krylov_common("cg", An, bn, x, tol, maxiter, error_callback)


def pcg(A: Callable, b: jax.Array, x0: Optional[jax.Array] = None, *,
        M: Callable, tol: float = 1e-10, maxiter: int = 10000,
        error_callback=None) -> KrylovResult:
    """Preconditioned CG.  M(r) ≈ A⁻¹r must be (near-)symmetric
    positive definite for the SPD form of A; with
    `M = mg_preconditioner(spec)` this is MGCG — the natural
    composition of the two solver families the reference compares
    (`test/converge-multigrid-vs-krylov.lua`): grid-independent
    multigrid convergence with CG's robustness margin."""
    An = lambda u: -A(u)
    Mn = lambda r: -M(r)    # M approximates A^-1; An = -A
    x = -b if x0 is None else x0
    return _krylov_common("pcg", An, -b, x, tol, maxiter,
                          error_callback, M=Mn)


def mg_preconditioner(spec) -> Callable:
    """One zero-initial-guess multigrid V-cycle as M(r) ≈ A⁻¹r.  Uses
    symmetric weighted-Jacobi smoothing (same pre/post sweep count) so
    the preconditioner is symmetric, as CG requires; the caller's
    scheme/backend/dtype choices are preserved otherwise."""
    from mgpoisson.cycle.vcycle import make_cycle
    nu = max(spec.nu_pre, spec.nu_post, 1)
    pspec = spec.with_(smoother="wjacobi", pre_smooth=nu, post_smooth=nu)
    cyc = make_cycle(pspec)
    h = pspec.fine_h
    return lambda r: cyc(jnp.zeros_like(r), r, h)


def conjugate_residual(A, b, x0=None, *, tol=1e-10, maxiter=10000,
                       error_callback=None) -> KrylovResult:
    An = lambda u: -A(u)
    return _krylov_common("cr", An, -b, -b if x0 is None else x0,
                          tol, maxiter, error_callback)


def bicgstab(A, b, x0=None, *, tol=1e-10, maxiter=10000,
             error_callback=None) -> KrylovResult:
    # BiCGStab does not need SPD; run on A directly
    return _krylov_common("bicgstab", A, b, -b if x0 is None else x0,
                          tol, maxiter, error_callback)


def _krylov_common(kind, A, b, x0, tol, maxiter, error_callback, M=None):
    x0 = jnp.asarray(x0)
    b = jnp.asarray(b, x0.dtype)
    bnorm = jnp.sqrt(_dot(b, b))

    solve = _LOOPS[kind]
    if kind == "pcg":
        x, it, rnorm, hist, xhist = solve(A, M, b, x0, tol, maxiter)
    else:
        x, it, rnorm, hist, xhist = solve(A, b, x0, tol, maxiter)
    it = int(it)
    res = KrylovResult(x=x, iterations=it,
                       converged=bool(rnorm <= tol * bnorm),
                       residuals=hist[:it], xnorms=xhist[:it])
    if error_callback is not None:
        # replay the recorded history through the reference-style hook
        for k, r in enumerate(res.residuals, start=1):
            if error_callback(k, float(r)):
                break
    return res


def _cg_loop(A, b, x0, tol, maxiter):
    r0 = b - A(x0)
    p0 = r0

    def body(state):
        x, r, p, rs = state
        Ap = A(p)
        alpha = rs / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = _dot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new), jnp.sqrt(rs_new)

    bnorm = jnp.sqrt(_dot(b, b))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    (x, *_), it, rnorm, hist, xhist = _run_loop(
        body, (x0, r0, p0, _dot(r0, r0)), maxiter, tol, bnorm, rnorm0)
    return x, it, rnorm, hist, xhist


def _pcg_loop(A, M, b, x0, tol, maxiter):
    r0 = b - A(x0)
    z0 = M(r0)
    p0 = z0

    def body(state):
        x, r, p, rz = state
        Ap = A(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new), jnp.sqrt(_dot(r, r))

    bnorm = jnp.sqrt(_dot(b, b))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    (x, *_), it, rnorm, hist, xhist = _run_loop(
        body, (x0, r0, p0, _dot(r0, z0)), maxiter, tol, bnorm, rnorm0)
    return x, it, rnorm, hist, xhist


def _cr_loop(A, b, x0, tol, maxiter):
    r0 = b - A(x0)
    p0 = r0
    Ar0 = A(r0)
    Ap0 = Ar0

    def body(state):
        x, r, p, Ar, Ap, rAr = state
        alpha = rAr / _dot(Ap, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        Ar = A(r)
        rAr_new = _dot(r, Ar)
        beta = rAr_new / rAr
        p = r + beta * p
        Ap = Ar + beta * Ap
        return (x, r, p, Ar, Ap, rAr_new), jnp.sqrt(_dot(r, r))

    bnorm = jnp.sqrt(_dot(b, b))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    (x, *_), it, rnorm, hist, xhist = _run_loop(
        body, (x0, r0, p0, Ar0, Ap0, _dot(r0, Ar0)), maxiter, tol, bnorm,
        rnorm0)
    return x, it, rnorm, hist, xhist


def _bicgstab_loop(A, b, x0, tol, maxiter):
    r0 = b - A(x0)
    rhat = r0

    def body(state):
        x, r, p, v, rho, alpha, omega = state
        rho_new = _dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = A(p)
        alpha = rho_new / _dot(rhat, v)
        s = r - alpha * v
        t = A(s)
        omega = _dot(t, s) / _dot(t, t)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega), jnp.sqrt(_dot(r, r))

    one = jnp.asarray(1.0, x0.dtype)
    bnorm = jnp.sqrt(_dot(b, b))
    rnorm0 = jnp.sqrt(_dot(r0, r0))
    (x, *_), it, rnorm, hist, xhist = _run_loop(
        body, (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one),
        maxiter, tol, bnorm, rnorm0)
    return x, it, rnorm, hist, xhist


def gmres(A, b, x0=None, *, tol=1e-10, maxiter=10000, restart=100,
          error_callback=None) -> KrylovResult:
    """Restarted GMRES(m).  The reference's solver table carries
    `restart = 100` for its (commented-out) gmres entry
    (`test/converge-multigrid-vs-krylov.lua:41`)."""
    x0 = -b if x0 is None else x0
    x0 = jnp.asarray(x0)
    b = jnp.asarray(b, x0.dtype)
    bnorm = float(jnp.sqrt(_dot(b, b)))
    shape = b.shape

    def flat_A(v):
        return A(v.reshape(shape)).ravel()

    x = x0.ravel()
    bf = b.ravel()
    residuals = []
    xnorms = []
    it = 0
    converged = False
    while it < maxiter and not converged:
        steps_before = it
        x, rnorms = _gmres_cycle(flat_A, bf, x, restart)
        for rn in np.asarray(rnorms):
            it += 1
            rel = float(rn) / bnorm
            residuals.append(rel)
            if error_callback is not None and error_callback(it, rel):
                converged = True
                break
            if rel < tol or not np.isfinite(rel):
                converged = rel < tol
                break
            if it >= maxiter:
                break
        # the iterate only materializes at restart boundaries; repeat
        # its norm for the cycle's inner steps (see KrylovResult.xnorms)
        xnorms.extend([float(jnp.max(jnp.abs(x)))] * (it - steps_before))
    return KrylovResult(x=x.reshape(shape), iterations=it,
                        converged=converged,
                        residuals=jnp.asarray(residuals),
                        xnorms=jnp.asarray(xnorms))


@partial(jax.jit, static_argnums=(0, 3))
def _gmres_cycle(A, b, x0, m):
    """One GMRES(m) cycle via Arnoldi + Givens rotations; returns the
    updated iterate and the m per-step residual norms."""
    n = x0.shape[0]
    dtype = x0.dtype
    r0 = b - A(x0)
    beta = jnp.sqrt(jnp.sum(r0 * r0))
    Q = jnp.zeros((m + 1, n), dtype).at[0].set(r0 / jnp.maximum(beta, 1e-300))
    H = jnp.zeros((m + 1, m), dtype)
    cs = jnp.zeros((m,), dtype)
    sn = jnp.zeros((m,), dtype)
    g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
    rnorms = jnp.zeros((m,), dtype)

    def body(k, carry):
        Q, H, cs, sn, g, rnorms = carry
        w = A(Q[k])
        # modified Gram-Schmidt against all m+1 rows (rows > k are zero)
        def mgs(j, wh):
            w, hcol = wh
            hj = jnp.where(j <= k, jnp.sum(w * Q[j]), 0.0)
            return w - hj * Q[j], hcol.at[j].set(hj)

        w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                    (w, jnp.zeros((m + 1,), dtype)))
        hk1 = jnp.sqrt(jnp.sum(w * w))
        hcol = hcol.at[k + 1].set(hk1)
        Q = Q.at[k + 1].set(w / jnp.maximum(hk1, 1e-300))

        # apply previous Givens rotations to the new column
        def rot(j, hc):
            hj = jnp.where(j < k, cs[j] * hc[j] + sn[j] * hc[j + 1], hc[j])
            hj1 = jnp.where(j < k, -sn[j] * hc[j] + cs[j] * hc[j + 1],
                            hc[j + 1])
            return hc.at[j].set(hj).at[j + 1].set(hj1)

        hcol = jax.lax.fori_loop(0, m, rot, hcol)
        denom = jnp.sqrt(hcol[k] ** 2 + hcol[k + 1] ** 2)
        ck = hcol[k] / jnp.maximum(denom, 1e-300)
        sk = hcol[k + 1] / jnp.maximum(denom, 1e-300)
        hcol = hcol.at[k].set(denom).at[k + 1].set(0.0)
        cs = cs.at[k].set(ck)
        sn = sn.at[k].set(sk)
        gk = g[k]
        g = g.at[k].set(ck * gk).at[k + 1].set(-sk * gk)
        H = H.at[:, k].set(hcol)
        rnorms = rnorms.at[k].set(jnp.abs(g[k + 1]))
        return Q, H, cs, sn, g, rnorms

    Q, H, cs, sn, g, rnorms = jax.lax.fori_loop(
        0, m, body, (Q, H, cs, sn, g, rnorms))

    # back-substitute H y = g (upper triangular after the rotations)
    def back(i, y):
        k = m - 1 - i
        s = g[k] - jnp.sum(H[k, :] * y)
        return y.at[k].set(s / jnp.where(H[k, k] != 0, H[k, k], 1.0))

    y = jax.lax.fori_loop(0, m, back, jnp.zeros((m,), dtype))
    x = x0 + Q[:m].T @ y
    return x, rnorms


_LOOPS = {
    "cg": jax.jit(_cg_loop, static_argnums=(0, 3, 4)),
    "cr": jax.jit(_cr_loop, static_argnums=(0, 3, 4)),
    "bicgstab": jax.jit(_bicgstab_loop, static_argnums=(0, 3, 4)),
    "pcg": jax.jit(_pcg_loop, static_argnums=(0, 1, 4, 5)),
}

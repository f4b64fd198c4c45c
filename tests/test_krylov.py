"""Krylov solver tests + the multigrid-vs-Krylov agreement gate
(the reference's primary correctness mechanism,
`test/converge-multigrid-vs-krylov.lua`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgpoisson import MultigridPoisson, Spec, oracle
from mgpoisson.compare import krylov


def _dense_solve(size):
    """Direct dense solve of the zero-ghost 5-point system (independent
    ground truth for small grids)."""
    h = 1.0 / size
    N = size * size
    A = np.zeros((N, N))
    for i in range(size):
        for j in range(size):
            k = i * size + j
            A[k, k] = -4.0 / h**2
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < size and 0 <= jj < size:
                    A[k, ii * size + jj] = 1.0 / h**2
    f = oracle.point_charge_rhs(size).ravel()
    return np.linalg.solve(A, f).reshape(size, size)


@pytest.mark.parametrize("solver", ["cg", "cr", "bicgstab"])
def test_krylov_matches_dense_solve(solver):
    size = 8
    exact = _dense_solve(size)
    f = jnp.asarray(oracle.point_charge_rhs(size))
    A = krylov.poisson_operator(1.0 / size)
    fn = {"cg": krylov.cg, "cr": krylov.conjugate_residual,
          "bicgstab": krylov.bicgstab}[solver]
    res = fn(A, f, tol=1e-12, maxiter=2000)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), exact, rtol=1e-6,
                               atol=1e-6 * np.abs(exact).max())


def test_cg_residual_history_decreases():
    size = 16
    f = jnp.asarray(oracle.point_charge_rhs(size))
    res = krylov.cg(krylov.poisson_operator(1.0 / size), f, tol=1e-10)
    hist = np.asarray(res.residuals)
    assert hist[-1] < 1e-10
    assert hist[-1] < hist[0]


def test_multigrid_vs_cg_agreement_gate():
    # the reference's gate: two unrelated algorithm families agree
    for size in (16, 32):
        spec = Spec(size=size, dtype="float64", scheme="tuned",
                    tol=1e-12, backend="xla")
        mg_res = MultigridPoisson(spec).solve()
        f = jnp.asarray(oracle.point_charge_rhs(size))
        cg_res = krylov.cg(krylov.poisson_operator(1.0 / size), f, tol=1e-12)
        scale = np.abs(np.asarray(mg_res.psi)).max()
        d = np.abs(np.asarray(cg_res.x) - np.asarray(mg_res.psi)).max()
        assert d / scale < 1e-8, f"size {size}: mg vs cg diff {d / scale:.2e}"


def test_multigrid_beats_cg_iteration_count():
    # the point of multigrid (demonstrated by the reference study):
    # O(1) cycles vs CG's O(size) iterations
    size = 64
    spec = Spec(size=size, dtype="float64", scheme="tuned",
                stop="residual", tol=1e-10, backend="xla")
    mg_res = MultigridPoisson(spec).solve()
    f = jnp.asarray(oracle.point_charge_rhs(size))
    cg_res = krylov.cg(krylov.poisson_operator(1.0 / size), f, tol=1e-10)
    assert mg_res.iterations < cg_res.iterations / 5


def test_mgcg_matches_dense_and_beats_cg():
    """MG-preconditioned CG: matches the dense ground truth AND
    converges in grid-independent iteration counts (far fewer than
    plain CG) — the composition of the two solver families the
    reference study compares."""
    size = 8
    exact = _dense_solve(size)
    f = jnp.asarray(oracle.point_charge_rhs(size))
    A = krylov.poisson_operator(1.0 / size)
    M = krylov.mg_preconditioner(
        Spec(size=size, dtype="float64", scheme="tuned", backend="xla"))
    res = krylov.pcg(A, f, M=M, tol=1e-12, maxiter=200)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), exact, rtol=1e-6,
                               atol=1e-6 * np.abs(exact).max())

    size = 64
    f = jnp.asarray(oracle.point_charge_rhs(size))
    A = krylov.poisson_operator(1.0 / size)
    M = krylov.mg_preconditioner(
        Spec(size=size, dtype="float64", scheme="tuned", backend="xla"))
    mgcg = krylov.pcg(A, f, M=M, tol=1e-10, maxiter=500)
    plain = krylov.cg(A, f, tol=1e-10, maxiter=5000)
    assert mgcg.converged
    assert mgcg.iterations < plain.iterations / 5, \
        f"mgcg {mgcg.iterations} vs cg {plain.iterations}"


def test_error_callback_replay():
    size = 16
    f = jnp.asarray(oracle.point_charge_rhs(size))
    seen = []
    krylov.cg(krylov.poisson_operator(1.0 / size), f, tol=1e-10,
              error_callback=lambda it, err: seen.append((it, err)) or False)
    assert seen and seen[0][0] == 1
    assert seen[-1][1] < 1e-10


def test_converge_study_runs(tmp_path):
    from mgpoisson.bench import converge
    study = converge.run_study(16, scheme="tuned", solvers=["cg"],
                               epsilon=1e-10)
    converge.write_outputs(study, str(tmp_path))
    assert (tmp_path / "16.txt").exists()
    d = np.abs(study["krylov"]["cg"]["psi"] - study["psi_mg"]).max()
    assert d / np.abs(study["psi_mg"]).max() < 1e-6


def test_gmres_matches_dense_solve():
    size = 8
    exact = _dense_solve(size)
    f = jnp.asarray(oracle.point_charge_rhs(size))
    res = krylov.gmres(krylov.poisson_operator(1.0 / size), f, tol=1e-12,
                       maxiter=500, restart=40)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), exact, rtol=1e-6,
                               atol=1e-6 * np.abs(exact).max())


def test_gmres_restart_and_callback():
    size = 16
    f = jnp.asarray(oracle.point_charge_rhs(size))
    seen = []
    res = krylov.gmres(krylov.poisson_operator(1.0 / size), f, tol=1e-10,
                       maxiter=400, restart=25,
                       error_callback=lambda it, e: seen.append(it) or False)
    assert res.converged
    assert seen == list(range(1, res.iterations + 1))


def test_xnorm_history_recorded():
    # per-iteration ||x||_inf history — the quantity the reference's
    # Krylov errorCallback records (`converge-…lua:59-67`), kept
    # on-device in the solve loop
    size = 16
    f = jnp.asarray(oracle.point_charge_rhs(size))
    res = krylov.cg(krylov.poisson_operator(1.0 / size), f, tol=1e-10)
    assert res.xnorms is not None
    assert res.xnorms.shape == (res.iterations,)
    assert np.isfinite(np.asarray(res.xnorms)).all()
    # the last recorded norm is the returned solution's norm
    np.testing.assert_allclose(float(res.xnorms[-1]),
                               float(jnp.max(jnp.abs(res.x))), rtol=1e-12)

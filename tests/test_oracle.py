"""Oracle self-consistency: encodes the reference's semantics
(SURVEY.md section 2.2 N1-N10) and its convergence behavior."""

import numpy as np
import pytest

from mgpoisson import oracle


def test_point_charge_rhs():
    f = oracle.point_charge_rhs(8)
    # -1e6 at the single center cell (size//2, size//2), 0 elsewhere
    # (`cpu-raw.lua:8-20`, `gpu.lua:41-59`)
    assert f[4, 4] == -1e6
    assert np.count_nonzero(f) == 1


def test_neighbor_sum_zero_ghost():
    u = np.arange(16, dtype=np.float64).reshape(4, 4)
    s = oracle.neighbor_sum(u)
    # corner (0,0): neighbors are (1,0)=4 and (0,1)=1; OOB read 0
    assert s[0, 0] == u[1, 0] + u[0, 1]
    # interior (1,1): 4 neighbors
    assert s[1, 1] == u[0, 1] + u[2, 1] + u[1, 0] + u[1, 2]


def test_neighbor_sum_face_bc():
    u = np.ones((4, 4))
    s = oracle.neighbor_sum(u, bc="face")
    # interior: 4; edge: 3 real + 1 ghost(-1) = 2; corner: 2 real + 2*(-1) = 0
    assert s[1, 1] == 4
    assert s[0, 1] == 2
    assert s[0, 0] == 0


def test_jacobi_single_cell_exact():
    # 1x1 grid: u = f * h^2 / (-4) (`cpu.lua:76-94` base case)
    f = np.array([[8.0]])
    u = oracle.jacobi_sweep(np.zeros((1, 1)), f, h=1.0)
    assert u[0, 0] == pytest.approx(8.0 / -4.0)


def test_restrict_exact_quarter_weights():
    r = np.arange(16, dtype=np.float64).reshape(4, 4)
    R = oracle.restrict(r)
    assert R.shape == (2, 2)
    assert R[0, 0] == pytest.approx((r[0, 0] + r[1, 0] + r[0, 1] + r[1, 1]) / 4)
    assert R[1, 1] == pytest.approx((r[2, 2] + r[3, 2] + r[2, 3] + r[3, 3]) / 4)


def test_prolong_inject():
    V = np.array([[1.0, 2.0], [3.0, 4.0]])
    v = oracle.prolong(V, "inject")
    assert v.shape == (4, 4)
    assert (v[0:2, 0:2] == 1.0).all()
    assert (v[2:4, 2:4] == 4.0).all()


def test_prolong_restrict_adjointness():
    # <P V, r> == 4 <V, restrict(r)> for injection P and average R
    rng = np.random.default_rng(0)
    V = rng.normal(size=(4, 4))
    r = rng.normal(size=(8, 8))
    lhs = np.sum(oracle.prolong(V, "inject") * r)
    rhs = 4.0 * np.sum(V * oracle.restrict(r))
    assert lhs == pytest.approx(rhs)


def test_prolong_bilinear_interior_weights():
    V = np.zeros((4, 4))
    V[1, 1] = 1.0
    v = oracle.prolong(V, "bilinear")
    # fine cell (2,2) is the (even,even) child of coarse (1,1):
    # weight 0.75*0.75 toward its own coarse cell
    assert v[2, 2] == pytest.approx(0.75 * 0.75)
    assert v[3, 3] == pytest.approx(0.75 * 0.75)
    assert v[1, 1] == pytest.approx(0.25 * 0.25)


def test_rbgs_fixed_point_is_exact_solution():
    # a Gauss-Seidel sweep leaves the exact discrete solution unchanged
    rng = np.random.default_rng(1)
    n, h = 8, 1.0 / 8
    u = rng.normal(size=(n, n))
    f = oracle.apply_operator(u, h)
    u2 = oracle.rbgs_sweep(u, f, h)
    np.testing.assert_allclose(u2, u, atol=1e-12)


def test_gs_lex_matches_rbgs_fixed_point():
    rng = np.random.default_rng(2)
    n, h = 8, 1.0 / 8
    u = rng.normal(size=(n, n))
    f = oracle.apply_operator(u, h)
    np.testing.assert_allclose(oracle.gs_lex_sweep(u, f, h), u, atol=1e-12)


def test_residual_zero_at_solution():
    rng = np.random.default_rng(3)
    u = rng.normal(size=(16, 16))
    f = oracle.apply_operator(u, 1.0 / 16)
    r = oracle.residual(u, f, 1.0 / 16)
    np.testing.assert_allclose(r, 0, atol=1e-9)


def test_reference_scheme_converges_16():
    # the reference's own committed behavior: slow but convergent
    psi, errs = oracle.solve(16, scheme="reference")
    assert errs[-1] < 1e-10
    # the solve result actually solves the discrete system
    f = oracle.point_charge_rhs(16)
    rel = oracle.residual_norm(psi, f, 1.0 / 16) / np.sqrt(np.sum(f * f))
    assert rel < 1e-8


def test_tuned_scheme_north_star_rate():
    # BASELINE.json north star: <10 V-cycles to 1e-10 relative residual.
    # Level-independent factor ~0.22 with rbgs 2+2 (tests at 64, 128).
    for size in (64, 128):
        f = oracle.point_charge_rhs(size)
        h = 1.0 / size
        psi = -f
        r0 = oracle.residual_norm(psi, f, h)
        cycles = 0
        for _ in range(10):
            psi = oracle.v_cycle(psi, f, h, pre_smooth=2, post_smooth=2,
                                 smoother="rbgs", scheme="tuned")
            cycles += 1
            if oracle.residual_norm(psi, f, h) / r0 < 1e-10:
                break
        assert oracle.residual_norm(psi, f, h) / r0 < 1e-10, \
            f"size {size}: {cycles} cycles insufficient"
        assert cycles < 10


def test_tuned_and_reference_same_fixed_point():
    # both schemes share the fine-level operator, hence the fixed point
    size = 32
    f = oracle.point_charge_rhs(size)
    psi_ref, _ = oracle.solve(size, scheme="reference", tol=1e-12,
                              maxiter=3000)
    psi_tuned, _ = oracle.solve(size, scheme="tuned", tol=1e-12)
    np.testing.assert_allclose(psi_tuned, psi_ref,
                               rtol=1e-6, atol=1e-6 * np.abs(psi_ref).max())


def test_rms_update_metric():
    a = np.zeros((2, 2))
    b = np.full((2, 2), 2.0)
    assert oracle.rms_update(b, a) == pytest.approx(2.0)


def test_rel_err_metric_masking():
    old = np.array([[2.0, 0.0], [4.0, 5.0]])
    new = np.array([[1.0, 3.0], [4.0, 10.0]])
    # cell (0,1): old == 0 -> excluded; cell (1,0): old == new -> excluded
    expected = np.mean([abs(1 - 1.0 / 2.0), abs(1 - 10.0 / 5.0)])
    assert oracle.rel_err(new, old) == pytest.approx(expected)


def test_error_callback_early_exit():
    calls = []

    def cb(it, err):
        calls.append((it, err))
        return it >= 3

    _, errs = oracle.solve(16, error_callback=cb)
    assert len(calls) == 3
    assert len(errs) == 3

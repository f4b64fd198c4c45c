"""Native C++ solver differential tests vs the NumPy oracle — the
modern form of the reference's cpu.lua <-> cpu-raw.lua byte-compare
workflow (`cpu-raw.lua:120-121`)."""

import numpy as np
import pytest

from mgpoisson import oracle

native = pytest.importorskip("mgpoisson.native")


@pytest.fixture(scope="module")
def lib_available():
    try:
        native._load()
    except Exception as e:  # no compiler on this host
        pytest.skip(f"native lib unavailable: {e}")


def test_point_charge_rhs(lib_available):
    mg = native.MultigridNative(16)
    np.testing.assert_array_equal(mg.point_charge_rhs(),
                                  oracle.point_charge_rhs(16))


@pytest.mark.parametrize("scheme", ["reference", "tuned"])
def test_vcycle_matches_oracle(lib_available, scheme):
    size = 32
    mg = native.MultigridNative(size, scheme=scheme)
    f = oracle.point_charge_rhs(size)
    u0 = -f
    got = mg.v_cycle(u0, f)
    want = oracle.v_cycle(u0.copy(), f, 1.0 / size,
                          pre_smooth=mg.pre_smooth,
                          post_smooth=mg.post_smooth,
                          smoother=mg.smoother, scheme=scheme)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("scheme", ["reference", "tuned"])
def test_solve_iterate_parity(lib_available, scheme):
    size = 16
    maxiter = 25
    mg = native.MultigridNative(size, scheme=scheme, maxiter=maxiter)
    psi_n, errs_n = mg.solve()
    psi_o, errs_o = oracle.solve(size, scheme=scheme, maxiter=maxiter)
    assert len(errs_n) == len(errs_o)
    np.testing.assert_allclose(errs_n, errs_o, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(psi_n, psi_o, rtol=1e-10, atol=1e-8)


def test_tuned_solves_system(lib_available):
    size = 64
    mg = native.MultigridNative(size, scheme="tuned", tol=1e-11)
    psi, errs = mg.solve()
    f = mg.point_charge_rhs()
    rel = mg.residual_norm(psi, f) / np.sqrt((f * f).sum())
    assert rel < 1e-9
    assert len(errs) < 40


def test_residual_norm_matches_oracle(lib_available):
    size = 16
    rng = np.random.default_rng(0)
    u = rng.normal(size=(size, size))
    f = rng.normal(size=(size, size))
    mg = native.MultigridNative(size)
    np.testing.assert_allclose(mg.residual_norm(u, f),
                               oracle.residual_norm(u, f, 1.0 / size),
                               rtol=1e-12)

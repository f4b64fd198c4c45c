"""Pallas kernel differential tests (interpreter mode on CPU — the
cross-backend diffing the reference does between its CPU and GPU
variants, `cpu-raw.lua:120-140`).

Covers both the whole-array-in-VMEM path and the striped
double-buffered-DMA path (forced via a tiny VMEM budget), all
smoothers, bcs, and edge stripes."""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson import oracle
from mgpoisson.kernels import pallas as pk


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, n)).astype(np.float32)
    f = rng.normal(size=(n, n)).astype(np.float32)
    return u, f


def _oracle_smooth(u, f, h, nu, smoother, bc):
    w = u.astype(np.float64)
    for _ in range(nu):
        w = oracle.SMOOTHERS[smoother](w, f.astype(np.float64), h, bc)
    return w


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
@pytest.mark.parametrize("nu", [1, 2, 3])
def test_smooth_whole_array_path(smoother, bc, nu):
    n = 256
    u, f = _data(n)
    got = np.asarray(pk.smooth(jnp.asarray(u), jnp.asarray(f), 1.0 / n, nu,
                               smoother, bc))
    want = _oracle_smooth(u, f, 1.0 / n, nu, smoother, bc)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
@pytest.mark.parametrize("nu", [1, 2])
def test_smooth_striped_path(smoother, bc, nu, monkeypatch):
    # shrink the VMEM budget so n=256 runs the striped DMA kernel
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 400 * 1024)
    n = 256
    u, f = _data(n, seed=1)
    halo, bm = pk._smooth_plan(n, nu, smoother, 4)
    assert n // bm >= 2, "budget did not force striping"
    got = np.asarray(pk._smooth_fused(jnp.asarray(u), jnp.asarray(f),
                                      h=1.0 / n, nu=nu, smoother=smoother,
                                      bc=bc, interpret=True,
                                      halo=halo, bm=bm))
    want = _oracle_smooth(u, f, 1.0 / n, nu, smoother, bc)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_smooth_deep_nu_chains_kernels():
    # nu beyond the per-call halo cap chains multiple kernels
    n = 256
    u, f = _data(n, seed=2)
    got = np.asarray(pk.smooth(jnp.asarray(u), jnp.asarray(f), 1.0 / n, 7,
                               "jacobi", "ghost0"))
    want = _oracle_smooth(u, f, 1.0 / n, 7, "jacobi", "ghost0")
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-4)


def test_unsupported_shapes_fall_back_to_xla():
    # 3D, non-square, small, and f64 arrays must route to XLA ops
    from mgpoisson.kernels import xla
    u3 = jnp.zeros((8, 8, 8))
    assert not pk._supported(u3)
    assert not pk._supported(jnp.zeros((64, 64), jnp.float32))
    got = pk.smooth(u3, u3, 0.125, 1, "jacobi", "ghost0")
    want = xla.smooth(u3, u3, 0.125, 1, "jacobi", "ghost0")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_get_ops_dispatch():
    from mgpoisson.kernels import get_ops, xla
    from mgpoisson import Spec
    spec_xla = Spec(size=512, backend="xla")
    assert get_ops(spec_xla, 512) is xla
    spec_pallas = Spec(size=512, backend="pallas")
    assert get_ops(spec_pallas, 512) is pk
    # 3D now routes to the pallas module too (its blocked 3D fused
    # smoother; non-smoother ops delegate to XLA inside the module)
    spec_3d = Spec(size=512, ndim=3, backend="pallas")
    assert get_ops(spec_3d, 512) is pk


@pytest.mark.parametrize("bc", ["ghost0", "face"])
@pytest.mark.parametrize("nu", [1, 2])
def test_wjacobi_smooth_paths(bc, nu, monkeypatch):
    n = 256
    u, f = _data(n, seed=5)
    want = _oracle_smooth(u, f, 1.0 / n, nu, "wjacobi", bc)
    got = np.asarray(pk.smooth(jnp.asarray(u), jnp.asarray(f), 1.0 / n, nu,
                               "wjacobi", bc))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 400 * 1024)
    halo, bm = pk._smooth_plan(n, nu, "wjacobi", 4)
    assert n // bm >= 2, "budget did not force striping"
    got = np.asarray(pk._smooth_fused(jnp.asarray(u), jnp.asarray(f),
                                      h=1.0 / n, nu=nu, smoother="wjacobi",
                                      bc=bc, interpret=True,
                                      halo=halo, bm=bm))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 1)])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_rr_fused_zero_matches_explicit_zeros(smoother, nu, bc):
    """From-zero down-leg kernel (every coarse V-cycle entry,
    cycle/vcycle.py u=None) == the normal fused kernel fed an explicit
    zeros array — same arithmetic, only the zeros' HBM round trip is
    elided."""
    from mgpoisson.kernels import xla as X

    n = 256
    _, f = _data(n, seed=7)
    h = 1.0 / n
    fj = jnp.asarray(f)
    # forced striped geometry (the production path for n >= 4096)
    u_got, R_got = pk._rr_fused_zero(fj, h=h, nu=nu, smoother=smoother,
                                     bc=bc, interpret=True, halo=8,
                                     bm=32)
    u_ref, R_ref = X.smooth_residual_restrict(
        jnp.zeros_like(fj), fj, h, nu, smoother, bc)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(R_got), np.asarray(R_ref),
                               rtol=1e-3, atol=3e-7 / h ** 2)

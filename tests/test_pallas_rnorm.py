"""Fused residual-norm (free stop='residual') differential tests.

The up-leg kernels can emit sum(r^2) of their result from data already
in VMEM (VERDICT r2 item 3).  Each Pallas path (striped / whole / wide /
3D) is compared against xla.prolong_correct_smooth_rnorm in interpreter
mode — the reference's cross-backend diffing (`cpu-raw.lua:120-140`)
applied to the new output.

bc is fixed to 'ghost0': the rnorm composite only runs at the fine
level, where the cycle always uses the problem's zero-ghost operator
(vcycle.py), matching xla.residual_norm.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson.kernels import pallas as pk
from mgpoisson.kernels import xla


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(n // 2, n // 2)), jnp.float32)
    return u, f, V


def _check(got_u, got_r2, u, f, V, h, nu, smoother, kind):
    ref_u, ref_r2 = xla.prolong_correct_smooth_rnorm(
        u, f, V, h, nu, smoother, "ghost0", kind)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=2e-5, atol=2e-5)
    # r2 scales with 1/h^4; compare relative
    np.testing.assert_allclose(float(got_r2), float(ref_r2), rtol=1e-4)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
@pytest.mark.parametrize("kind", ["inject", "bilinear"])
def test_pc_whole_rnorm(smoother, nu, kind):
    n = 256
    u, f, V = _data(n, seed=1)
    h = 1.0 / n
    got_u, racc = pk._pc_whole(u, f, V, h=h, nu=nu, smoother=smoother,
                               bc="ghost0", kind=kind, interpret=True,
                               rnorm=True)
    assert racc.shape == (1, n) and racc.dtype == jnp.float32
    _check(got_u, jnp.sum(racc), u, f, V, h, nu, smoother, kind)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
@pytest.mark.parametrize("kind", ["inject", "bilinear"])
def test_pc_striped_rnorm(smoother, nu, kind):
    n = 256
    u, f, V = _data(n, seed=2)
    h = 1.0 / n
    halo, bm = pk._fused_plan(n, nu, smoother, 4)
    bm = min(bm, 64)            # force several stripes at n=256
    got_u, racc = pk._pc_smooth_fused(u, f, V, h=h, nu=nu,
                                      smoother=smoother, bc="ghost0",
                                      kind=kind, interpret=True,
                                      halo=halo, bm=bm, rnorm=True)
    assert racc.shape == (1, n)
    _check(got_u, jnp.sum(racc), u, f, V, h, nu, smoother, kind)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
def test_pc_wide_rnorm(kind):
    n = 1024
    u, f, V = _data(n, seed=3)
    h = 1.0 / n
    got_u, racc = pk._pc_fused_wide(u, f, V, h=h, nu=3,
                                    smoother="wjacobi", bc="ghost0",
                                    kind=kind, interpret=True, hr=8,
                                    bm=256, bcw=256, rnorm=True)
    assert racc.shape == (1, 256)
    _check(got_u, jnp.sum(racc), u, f, V, h, 3, "wjacobi", kind)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
def test_pc3d_rnorm(smoother, nu):
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(32, 64, 128)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(32, 64, 128)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(16, 32, 64)), jnp.float32)
    h = 1.0 / 64
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    got_u, racc = pk._pc_fused_3d(u, f, V, h=h, nu=nu, smoother=smoother,
                                  bc="ghost0", kind="inject",
                                  interpret=True, hz=hz, bz=8, by=32,
                                  rnorm=True)
    assert racc.shape == (1, 32, 128)
    ref_u, ref_r2 = xla.prolong_correct_smooth_rnorm(
        u, f, V, h, nu, smoother, "ghost0", "inject")
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(jnp.sum(racc)), float(ref_r2),
                               rtol=1e-4)


@pytest.mark.parametrize("path", ["whole", "striped"])
def test_public_wrapper_rnorm(path, monkeypatch):
    if path == "striped":
        monkeypatch.setattr(pk, "_VMEM_BUDGET", 400 * 1024)
    n = 256
    u, f, V = _data(n, seed=5)
    h = 1.0 / n
    got_u, got_r2 = pk.prolong_correct_smooth_rnorm(
        u, f, V, h, 3, "wjacobi", "ghost0", "inject")
    _check(got_u, got_r2, u, f, V, h, 3, "wjacobi", "inject")


def test_face_bc_rnorm_matches_xla_contract():
    """bc='face' (never produced by the solver, but part of the public
    signature): the rnorm must still be the ZERO-GHOST operator like
    xla.prolong_correct_smooth_rnorm — the pallas wrapper takes the
    metric separately in that case rather than letting the fused
    kernels' face-bc residual leak into it."""
    n = 256
    u, f, V = _data(n, seed=9)
    h = 1.0 / n
    got_u, got_r2 = pk.prolong_correct_smooth_rnorm(
        u, f, V, h, 2, "wjacobi", "face", "bilinear")
    ref_u, ref_r2 = xla.prolong_correct_smooth_rnorm(
        u, f, V, h, 2, "wjacobi", "face", "bilinear")
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(got_r2), float(ref_r2), rtol=2e-4)


def test_solver_residual_stop_uses_fused_norm():
    """End-to-end: a residual-stop solve's error history equals
    ||r||/||r0|| computed independently on the returned history's
    iterates (spot check final state)."""
    from mgpoisson import MultigridPoisson, Spec

    spec = Spec(size=64, dtype="float64", scheme="tuned",
                stop="residual", tol=1e-10, backend="xla")
    mg = MultigridPoisson(spec)
    f = mg.rhs()
    res = mg.solve(f)
    assert res.converged
    rel = float(mg.residual_norm(res.psi, f)) / float(
        mg.residual_norm(mg.init_state(f), f))
    assert rel < 1e-10
    assert abs(rel - float(res.errs[-1])) <= 1e-12 + 1e-3 * rel

"""bfloat16 Pallas kernel differentials (interpreter mode).

dtype is an explicit behavioral axis of the reference (fp64-preferring
device selection with an fp32 fallback, `gpu.lua:7-15,32`); on TPU the
low-precision axis is bfloat16 — half the HBM traffic and double the
VPU rate.  Each fused Pallas path must agree with the XLA ops RUN IN
BFLOAT16 TOO (same-precision comparison: this measures kernel parity,
not precision loss; bf16 has ~3 significant decimal digits, so a few
ulps of op-reordering noise is the expected scale).

The achievable-tolerance story (what a bf16 SOLVE can reach) is
measured on hardware by bench.py (bf16_solve_floor) and documented in
the README.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson.kernels import pallas as pk, xla

BF = jnp.bfloat16
# same-precision comparison: bf16 ulp ~ 0.8% relative; sweeps compound
# reordering noise over nu applications and value scales vary, so 5%
# relative of the field magnitude is the meaningful bound
RTOL = dict(rtol=0.05, atol=0.05)


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(n, n)), BF)
    f = jnp.asarray(rng.normal(size=(n, n)), BF)
    return u, f


def _cmp(got, ref):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(float(np.max(np.abs(ref))), 1e-30)
    np.testing.assert_allclose(got / scale, ref / scale, **RTOL)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
def test_smooth_bf16_matches_xla_bf16(smoother, nu):
    n = 512
    u, f = _data(n)
    got = pk.smooth(u, f, 1.0 / n, nu, smoother, "ghost0")
    assert got.dtype == BF
    _cmp(got, xla.smooth(u, f, 1.0 / n, nu, smoother, "ghost0"))


def test_rr_fused_bf16(monkeypatch):
    # small budget forces the STRIPED path (2048 whole-VMEM otherwise)
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 400 * 1024)
    n = 512
    u, f = _data(n, seed=1)
    g_u, g_R = pk.smooth_residual_restrict(u, f, 1.0 / n, 3, "wjacobi",
                                           "ghost0")
    r_u, r_R = xla.smooth_residual_restrict(u, f, 1.0 / n, 3, "wjacobi",
                                            "ghost0")
    _cmp(g_u, r_u)
    _cmp(g_R, r_R)


def test_pc_fused_bf16(monkeypatch):
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 400 * 1024)
    n = 512
    u, f = _data(n, seed=2)
    V = jnp.asarray(np.random.default_rng(3).normal(size=(n // 2, n // 2)),
                    BF)
    got = pk.prolong_correct_smooth(u, f, V, 1.0 / n, 3, "wjacobi",
                                    "face", "bilinear")
    ref = xla.prolong_correct_smooth(u, f, V, 1.0 / n, 3, "wjacobi",
                                     "face", "bilinear")
    _cmp(got, ref)


def test_wide_bf16():
    n = 1024
    u, f = _data(n, seed=4)
    got = pk._smooth_fused_wide(u, f, h=1.0 / n, nu=3, smoother="wjacobi",
                                bc="ghost0", interpret=True, hr=8,
                                bm=256, bcw=256)
    _cmp(got, xla.smooth(u, f, 1.0 / n, 3, "wjacobi", "ghost0"))


def test_sharded_strips_bf16():
    n = 512
    u, f = _data(n, seed=5)
    plan = pk.sharded_plan((n, n), 3, "wjacobi", BF)
    assert plan is not None
    h8 = plan[0]
    zrow = jnp.zeros((h8, n), BF)
    zcol = jnp.zeros((n + 2 * h8, 128), BF)
    strips = (zrow, zrow, zcol, zcol)
    flags = jnp.ones((4,), jnp.int32)
    g_u, g_R = pk.smooth_rr_sharded(u, f, strips, strips, flags, 1.0 / n,
                                    3, "wjacobi", "ghost0", plan=plan)
    r_u, r_R = xla.smooth_residual_restrict(u, f, 1.0 / n, 3, "wjacobi",
                                            "ghost0")
    _cmp(g_u, r_u)
    _cmp(g_R, r_R)


def test_bf16_solve_converges_to_bf16_floor():
    """A full bf16 solve on the XLA path reaches a ~1e-2 relative
    residual floor (documented: bf16 is for memory-bound scale, with
    metrics/refinement in f32 — see README)."""
    from mgpoisson import MultigridPoisson, Spec

    spec = Spec(size=128, dtype="bfloat16", scheme="tuned", backend="xla",
                stop="residual", tol=5e-2, maxiter=30)
    res = MultigridPoisson(spec).solve()
    assert res.converged, float(res.final_err)

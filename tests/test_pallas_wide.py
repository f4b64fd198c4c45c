"""Two-axis-blocked ("wide") 2D Pallas kernel tests (interpreter mode).

At n >= 8192 a full row stripe no longer fits VMEM, so the fused
kernels block BOTH axes (8-aligned row halo, 128-lane column halo).
These kernels carry the fine levels of BASELINE config 5 (16384^2:
V-cycle 119 ms -> 24.7 ms on one v5e chip when they engage).
Differential-tested against the XLA ops at a small size with the
block geometry forced, covering interior blocks and all four global
edges (4x4 blocks).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson.kernels import pallas as pk, xla


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    return u, f


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_smooth_wide_matches_xla(smoother, nu, bc):
    n = 1024
    u, f = _data(n)
    h = 1.0 / n
    got = pk._smooth_fused_wide(u, f, h=h, nu=nu, smoother=smoother, bc=bc,
                                interpret=True, hr=8, bm=256, bcw=256)
    ref = xla.smooth(u, f, h, nu, smoother, bc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_rr_wide_matches_xla(bc):
    n = 1024
    u, f = _data(n, seed=1)
    h = 1.0 / n
    u1, R1 = pk._rr_fused_wide(u, f, h=h, nu=3, smoother="wjacobi", bc=bc,
                               interpret=True, hr=8, bm=256, bcw=256)
    u2, R2 = xla.smooth_residual_restrict(u, f, h, 3, "wjacobi", bc)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=2e-5, atol=2e-5)
    # residual values scale with 1/h^2; compare relative to magnitude
    scale = float(jnp.max(jnp.abs(R2)))
    np.testing.assert_allclose(np.asarray(R1) / scale,
                               np.asarray(R2) / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
def test_pc_wide_matches_xla(kind):
    n = 1024
    u, f = _data(n, seed=2)
    rng = np.random.default_rng(3)
    V = jnp.asarray(rng.normal(size=(n // 2, n // 2)), jnp.float32)
    h = 1.0 / n
    got = pk._pc_fused_wide(u, f, V, h=h, nu=3, smoother="wjacobi",
                            bc="face", kind=kind, interpret=True, hr=8,
                            bm=256, bcw=256)
    ref = xla.prolong_correct_smooth(u, f, V, h, 3, "wjacobi", "face", kind)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_plan_wide_geometries():
    """Wide plans exist exactly where single-axis striping degenerates."""
    for n in (8192, 16384, 32768):
        plan = pk._plan_wide(n, 3, "wjacobi", 4)
        assert plan is not None, n
        hr, bm, bc = plan
        assert hr == 8 and n % bm == 0 and n % bc == 0
        assert bm % 16 == 0 and bc % 256 == 0
        vmem = 4 * (4 * (bm + 16) * (bc + 2 * pk._HC) + 2 * bm * bc)
        assert vmem <= pk._VMEM_BUDGET
    # too-deep halo: rbgs nu=8 -> radius 16 > 8-row halo
    assert pk._plan_wide(16384, 8, "rbgs", 4) is None


def test_fused_plan_picks_wide_for_large_grids():
    import jax
    u = jax.ShapeDtypeStruct((16384, 16384), jnp.float32)
    plan = pk._fused_plan_or_whole(u, 3, "wjacobi")
    assert plan is not None and plan[0] == "wide"
    mode, hr, (bm, bc) = plan
    assert hr == 8 and 16384 % bm == 0 and 16384 % bc == 0
    # rbgs nu=4 would need 2*4+1 = 9 halo rows > 8: no wide plan
    assert pk._fused_plan_or_whole(u, 4, "rbgs") is None

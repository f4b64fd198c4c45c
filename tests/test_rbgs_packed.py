"""Packed-parity red-black GS vs the where-select form.

The packed form (`pallas._rbgs_packed_sweeps`) computes each RB sweep
as two half-stencils on checkerboard-packed (R, n/2) arrays instead of
two full-stencil evaluations with half discarded (the where-select
form, the reference's GaussSeidel semantics made deterministic,
`gpu.lua:61-81`).  Both are pure-jnp sweep bodies shared by every 2D
Pallas kernel, so they can be diffed directly without pallas_call.
Differences are add-order rounding only (~1e-7 f32).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import mgpoisson.kernels.pallas as P

RNG = np.random.default_rng(7)
F32 = jnp.float32


def _ws_sweeps(uv, fv, nu, bc, hsq, halo, bm, isf, isl, edge=True):
    """The where-select reference: _sweeps with packing disabled."""
    import unittest.mock as mock
    with mock.patch.object(P, "_RBGS_PACKED", False):
        return P._sweeps(uv, fv, nu, "rbgs", bc, hsq, 0.0, halo, bm,
                         jnp.asarray(isf), jnp.asarray(isl), edge)


@pytest.mark.parametrize("bc", ["ghost0", "face"])
@pytest.mark.parametrize("nu", [1, 3])
@pytest.mark.parametrize("isf,isl,edge", [
    (True, False, True), (False, True, True),
    (False, False, True), (False, False, False)])
def test_stripe_packed_matches_where_select(bc, nu, isf, isl, edge):
    halo, bm, n = 8, 48, 512
    R = bm + 2 * halo
    u = jnp.asarray(RNG.standard_normal((R, n)), F32)
    f = jnp.asarray(RNG.standard_normal((R, n)), F32)
    hsq = (1.0 / n) ** 2
    a = _ws_sweeps(u, f, nu, bc, hsq, halo, bm, isf, isl, edge)
    b = P._rbgs_packed_sweeps(u, f, nu, bc, hsq, halo=halo, bm=bm,
                              is_first=jnp.asarray(isf),
                              is_last=jnp.asarray(isl), edge=edge)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_whole_grid_packed(bc):
    import unittest.mock as mock
    n = 256
    u = jnp.asarray(RNG.standard_normal((n, n)), F32)
    f = jnp.asarray(RNG.standard_normal((n, n)), F32)
    hsq = (1.0 / n) ** 2
    with mock.patch.object(P, "_RBGS_PACKED", False):
        a = P._whole_sweeps(u, f, 2, "rbgs", bc, hsq)
    b = P._rbgs_packed_sweeps(u, f, 2, bc, hsq, halo=0, bm=n,
                              is_first=True, is_last=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


@pytest.mark.parametrize("rf,rl", [(True, False), (False, False),
                                   (False, True)])
@pytest.mark.parametrize("cf,cl", [(True, False), (False, False),
                                   (False, True)])
def test_wide_block_packed(rf, rl, cf, cl):
    import unittest.mock as mock
    hr, bm, hc, bcw = 8, 48, 128, 256
    R, C = bm + 2 * hr, bcw + 2 * hc
    u = jnp.asarray(RNG.standard_normal((R, C)), F32)
    f = jnp.asarray(RNG.standard_normal((R, C)), F32)
    hsq = (1.0 / 4096) ** 2
    t = jnp.asarray
    with mock.patch.object(P, "_RBGS_PACKED", False):
        a = P._sweeps_wide(u, f, 2, "rbgs", "ghost0", hsq, hr, bm, hc,
                           bcw, t(rf), t(rl), t(cf), t(cl))
    b = P._rbgs_packed_sweeps(u, f, 2, "ghost0", hsq, halo=hr, bm=bm,
                              is_first=t(rf), is_last=t(rl),
                              hc=hc, bcw=bcw, cf=t(cf), cl=t(cl))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_bf16_packed():
    u = jnp.asarray(RNG.standard_normal((64, 256)), jnp.bfloat16)
    f = jnp.asarray(RNG.standard_normal((64, 256)), jnp.bfloat16)
    a = _ws_sweeps(u, f, 2, "ghost0", 1e-4, 8, 48, True, True)
    b = P._rbgs_packed_sweeps(u, f, 2, "ghost0", 1e-4, halo=8, bm=48,
                              is_first=jnp.asarray(True),
                              is_last=jnp.asarray(True))
    d = float(jnp.max(jnp.abs((a - b).astype(jnp.float32))))
    assert d < 0.05


def test_pack_unpack_roundtrip_exact():
    u = jnp.asarray(RNG.standard_normal((40, 512)), F32)
    se, so = P._pack_sel_mats(F32)
    out = P._lane_unpack(P._lane_pack(u, se), P._lane_pack(u, so), se, so)
    assert float(jnp.max(jnp.abs(out - u))) == 0.0

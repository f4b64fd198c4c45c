"""3D fused-smoother Pallas kernel tests (interpreter mode on CPU).

The 3D blocked kernel (BASELINE config 4's hardware path) mirrors the
2D striped smoother: (z, y) blocks with clipped two-axis halo DMA and
the full x row in lanes.  Differential-tested against the XLA 7-point
sweeps — the cross-backend diffing the reference does between its CPU
and GPU variants (`cpu-raw.lua:120-140`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson.core.spec import Spec
from mgpoisson.kernels import get_ops, pallas as pk, xla


def _data(shape, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=shape), jnp.float32)
    f = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return u, f


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("jacobi", 2),
                                         ("rbgs", 2)])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_smooth3d_matches_xla(smoother, nu, bc):
    u, f = _data((32, 64, 128))
    h = 1.0 / 64
    hz = (2 if smoother == "rbgs" else 1) * nu
    got = pk._smooth_fused_3d(u, f, h=h, nu=nu, smoother=smoother, bc=bc,
                              interpret=True, hz=hz, bz=8, by=32)
    ref = xla.smooth(u, f, h, nu, smoother, bc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_smooth3d_single_y_stripe():
    """ny // by == 1: the clipped DMA degenerates to a single case."""
    u, f = _data((16, 32, 128), seed=3)
    h = 1.0 / 32
    got = pk._smooth_fused_3d(u, f, h=h, nu=2, smoother="wjacobi",
                              bc="ghost0", interpret=True, hz=2, bz=8,
                              by=32)
    ref = xla.smooth(u, f, h, 2, "wjacobi", "ghost0")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_rr3d_matches_xla(smoother, nu, bc):
    u, f = _data((32, 64, 128), seed=4)
    h = 1.0 / 64
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    u1, R1 = pk._rr_fused_3d(u, f, h=h, nu=nu, smoother=smoother, bc=bc,
                             interpret=True, hz=hz, bz=8, by=32)
    u2, R2 = xla.smooth_residual_restrict(u, f, h, nu, smoother, bc)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=2e-5, atol=2e-5)
    scale = float(jnp.max(jnp.abs(R2)))
    np.testing.assert_allclose(np.asarray(R1) / scale,
                               np.asarray(R2) / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
@pytest.mark.parametrize("smoother,nu,bc", [("wjacobi", 3, "face"),
                                            ("wjacobi", 3, "ghost0"),
                                            ("rbgs", 2, "ghost0")])
def test_pc3d_matches_xla(kind, smoother, nu, bc):
    """Covers the production fine-level path (bc='ghost0') as well as
    the tuned coarse-level one (bc='face')."""
    u, f = _data((32, 64, 128), seed=5)
    rng = np.random.default_rng(6)
    V = jnp.asarray(rng.normal(size=(16, 32, 64)), jnp.float32)
    h = 1.0 / 64
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    got = pk._pc_fused_3d(u, f, V, h=h, nu=nu, smoother=smoother,
                          bc=bc, kind=kind, interpret=True, hz=hz,
                          bz=8, by=32)
    ref = xla.prolong_correct_smooth(u, f, V, h, nu, smoother, bc, kind)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_plan3d_composite_geometries():
    """Composite plans carry the +1 residual ring and fit the coarse
    pc blocks (chz <= bz/2)."""
    for shape, nu, smoother in [((256,) * 3, 3, "wjacobi"),
                                ((256,) * 3, 2, "rbgs")]:
        plan = pk._plan3d(shape, nu, smoother, 4, composite=True)
        assert plan is not None
        hz, bz, by = plan
        radius = 2 if smoother == "rbgs" else 1
        assert hz == radius * nu + 1
        assert hz <= bz and (hz + 3) // 2 <= bz // 2 and by // 2 >= 8


def test_plan3d_geometries():
    """Plans exist for the BASELINE config-4 shapes and respect VMEM."""
    for shape, nu, smoother in [((256,) * 3, 3, "wjacobi"),
                                ((256,) * 3, 2, "rbgs"),
                                ((512,) * 3, 3, "wjacobi")]:
        plan = pk._plan3d(shape, nu, smoother, 4)
        assert plan is not None, (shape, nu, smoother)
        hz, bz, by = plan
        radius = 2 if smoother == "rbgs" else 1
        assert hz == radius * nu
        nz, ny, nx = shape
        assert nz % bz == 0 and ny % by == 0
        Rz, Ry = bz + 2 * hz, by + 2 * 8
        assert 4 * nx * (4 * Rz * Ry + 2 * bz * by) <= pk._VMEM_BUDGET

    # too-deep halo (rbgs nu=8 -> radius 16 > 8-row y halo) has no plan
    assert pk._plan3d((256,) * 3, 8, "rbgs", 4) is None


def test_smooth3_public_dispatch(monkeypatch):
    """pallas.smooth routes >=MIN_BYTES_3D 3D arrays to the fused
    kernel and smaller ones to XLA."""
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")
    calls = []
    orig = pk._smooth_fused_3d

    def spy(u, f, **kw):
        calls.append(kw)
        return orig(u, f, **kw)

    monkeypatch.setattr(pk, "_smooth_fused_3d", spy)
    # small 3D array: under the byte gate -> XLA, no kernel call
    u, f = _data((32, 32, 128))
    out = pk.smooth(u, f, 1.0 / 32, 2, "wjacobi", "ghost0")
    assert not calls
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(xla.smooth(u, f, 1.0 / 32, 2, "wjacobi", "ghost0")),
        rtol=1e-6)
    # force the gate low: the fused path engages and chains deep nu
    monkeypatch.setattr(pk, "MIN_BYTES_3D", 0)
    u2, f2 = _data((16, 64, 128), seed=1)
    out2 = pk.smooth(u2, f2, 1.0 / 64, 5, "rbgs", "ghost0")
    # rbgs caps nu at 4 per kernel call -> chained 4 + 1
    assert [k["nu"] for k in calls] == [4, 1]
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(xla.smooth(u2, f2, 1.0 / 64, 5, "rbgs", "ghost0")),
        rtol=2e-5, atol=2e-5)


def test_get_ops_3d_dispatch():
    """ndim=3 + backend='pallas' returns the pallas module; 'auto' off
    TPU and 'xla' return the XLA module (the cpuDepth-style switch,
    `cpu-gpu.lua:17-52`)."""
    spec_p = Spec(size=256, ndim=3, backend="pallas")
    assert get_ops(spec_p, 256) is pk
    spec_x = Spec(size=256, ndim=3, backend="xla")
    assert get_ops(spec_x, 256) is xla
    spec_a = Spec(size=256, ndim=3, backend="auto")
    assert get_ops(spec_a, 256) is xla  # tests run on CPU

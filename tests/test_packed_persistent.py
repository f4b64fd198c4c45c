"""Packed-PERSISTENT fine-level path vs the unpacked reference.

The packed state layout is up = [xr | xb] (left half red plane, right
half black), held in HBM across the whole solve (VERDICT r3 item 1:
the per-call packed form loses to pack/unpack cost; the persistent
form realizes the 2.5x-cheaper sweep).  These differentials run the
real Pallas kernels in interpret mode on CPU against the XLA
where-select ops — every difference is add-order rounding (~1e-6 f32).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mgpoisson.kernels.pallas as P
import mgpoisson.kernels.xla as X
from mgpoisson.core.spec import Spec
from mgpoisson.cycle import packed as PK
from mgpoisson.cycle.vcycle import make_cycle

RNG = np.random.default_rng(11)
F32 = jnp.float32


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _rand(n):
    u = jnp.asarray(RNG.standard_normal((n, n)), F32)
    f = jnp.asarray(RNG.standard_normal((n, n)), F32)
    return u, f


def test_pack_unpack_roundtrip_exact():
    u, _ = _rand(256)
    assert float(jnp.max(jnp.abs(P.unpack_grid(P.pack_grid(u)) - u))) == 0.0


def test_packed_plan_geometries():
    assert P.packed_plan(256, 1, 4) is not None
    assert P.packed_plan(4096, 1, 4) is not None
    assert P.packed_plan(4096, 3, 4) is not None
    assert P.packed_plan(128, 1, 4) is None      # below lane chunk
    assert P.packed_plan(4096, 4, 4) is None     # rbgs halo cap


@pytest.mark.parametrize("n,nu", [(256, 1), (256, 2), (512, 1)])
def test_packed_rr_matches_unpacked(n, nu):
    u, f = _rand(n)
    h = 1.0 / n
    us = X.smooth(u, f, h, nu, "rbgs", "ghost0")
    R = X.residual_restrict(us, f, h, "ghost0")
    up, Rp = P.packed_smooth_residual_restrict(
        P.pack_grid(u), P.pack_grid(f), h, nu)
    np.testing.assert_allclose(np.asarray(P.unpack_grid(up)),
                               np.asarray(us), atol=5e-6)
    # R carries the 1/h^2 scale (~1e5 values at n=256): relative diff
    # is the meaningful measure there
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(R),
                               rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
@pytest.mark.parametrize("n,nu", [(256, 1), (512, 2)])
def test_packed_pc_matches_unpacked(kind, n, nu):
    u, f = _rand(n)
    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    h = 1.0 / n
    uc = X.prolong_correct(u, V, kind)
    ue = X.smooth(uc, f, h, nu, "rbgs", "ghost0")
    up = P.packed_prolong_correct_smooth(
        P.pack_grid(u), P.pack_grid(f), V, h, nu, kind=kind)
    np.testing.assert_allclose(np.asarray(P.unpack_grid(up)),
                               np.asarray(ue), atol=5e-6)


@pytest.mark.parametrize("nu", [1, 2, 3])
def test_packed_multi_stripe_geometry(nu):
    """Forced halo=8, bm=32 at n=256 -> 8 stripes: pins the
    multi-stripe handoff, the i>=2 output-drain waits, and the
    per-stripe parity logic that the default plan (bm=n//2, 2 stripes)
    never exercises at CI sizes (ADVICE r4)."""
    n = 256
    u, f = _rand(n)
    h = 1.0 / n
    up, fp = P.pack_grid(u), P.pack_grid(f)
    us = X.smooth(u, f, h, nu, "rbgs", "ghost0")
    R = X.residual_restrict(us, f, h, "ghost0")
    u2p, Rp = P._packed_rr_fused(up, fp, h=h, nu=nu, interpret=True,
                                 halo=8, bm=32)
    np.testing.assert_allclose(np.asarray(P.unpack_grid(u2p)),
                               np.asarray(us), atol=5e-6)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(R),
                               rtol=1e-3, atol=1e-2)
    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    for kind in ("inject", "bilinear"):
        uc = X.smooth(X.prolong_correct(u, V, kind), f, h, nu, "rbgs",
                      "ghost0")
        gp = P._packed_pc_fused(up, fp, V, h=h, nu=nu, kind=kind,
                                interpret=True, halo=8, bm=32)
        np.testing.assert_allclose(np.asarray(P.unpack_grid(gp)),
                                   np.asarray(uc), atol=5e-6)
    # rnorm variant through the same forced geometry
    g2, racc = P._packed_pc_fused(up, fp, V, h=h, nu=nu, kind="inject",
                                  interpret=True, halo=8, bm=32,
                                  rnorm=True)
    expect = X.residual_sq_sum(P.unpack_grid(g2), f, h)
    np.testing.assert_allclose(float(jnp.sum(racc)), float(expect),
                               rtol=1e-4)


def test_packed_cycle_rejects_constrain():
    """A sharding constrain composed with the packed cycle must be
    rejected loudly, not silently dropped (ADVICE r4)."""
    spec = Spec(size=256, scheme="fast", backend="xla")
    with pytest.raises(ValueError, match="single-device"):
        PK.make_packed_cycle(spec, constrain=lambda x: x)


@pytest.mark.parametrize("nu", [1, 2])
def test_packed_wide_matches_unpacked(nu):
    """Two-axis packed kernels (the n >= 8192 geometry) at a testable
    size with forced blocks: n=512, bm=64, bcp=128 -> 8x2 block grid
    exercises row AND lane halos, all four edge-flag combinations, and
    the per-color window DMA."""
    n, bm, bcp = 512, 64, 128
    u, f = _rand(n)
    h = 1.0 / n
    up, fp = P.pack_grid(u), P.pack_grid(f)

    us = X.smooth(u, f, h, nu, "rbgs", "ghost0")
    R = X.residual_restrict(us, f, h, "ghost0")
    u2p, Rp = P._packed_rr_fused_wide(up, fp, h=h, nu=nu,
                                      interpret=True, hr=8, bm=bm,
                                      bcp=bcp)
    np.testing.assert_allclose(np.asarray(P.unpack_grid(u2p)),
                               np.asarray(us), atol=5e-6)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(R),
                               rtol=1e-3, atol=3e-7 / h ** 2)

    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    for kind in ("inject", "bilinear"):
        uc = X.smooth(X.prolong_correct(u, V, kind), f, h, nu, "rbgs",
                      "ghost0")
        gp = P._packed_pc_fused_wide(up, fp, V, h=h, nu=nu, kind=kind,
                                     interpret=True, hr=8, bm=bm,
                                     bcp=bcp)
        np.testing.assert_allclose(np.asarray(P.unpack_grid(gp)),
                                   np.asarray(uc), atol=5e-6)
    g2, racc = P._packed_pc_fused_wide(up, fp, V, h=h, nu=nu,
                                       kind="inject", interpret=True,
                                       hr=8, bm=bm, bcp=bcp, rnorm=True)
    expect = X.residual_sq_sum(P.unpack_grid(g2), f, h)
    np.testing.assert_allclose(float(jnp.sum(racc)), float(expect),
                               rtol=1e-4)


def test_packed_plan_any_dispatch():
    """Plain stripes while wide (<= ~12.5% overlap), write-through
    stripes at 2x bm in the thin-stripe regime, two-axis blocks only
    past the striped VMEM ceiling (n >= 32768)."""
    assert P.packed_plan_any(4096, 1, 4) == ("striped", 8, 128, False)
    assert P.packed_plan_any(8192, 1, 4) == ("striped", 8, 64, False)
    assert P.packed_plan_any(16384, 1, 4) == ("striped", 8, 32, False)
    assert P.packed_plan_any(16384, 1, 2) == ("striped", 8, 64, False)
    # write-through never auto-engages (measured slower than thin
    # plain stripes); forced via env for re-tuning
    assert P.packed_plan_wt(16384, 1, 4) == (8, 64)
    assert P.packed_wide_plan(16384, 1, 4) == (8, 128, 2048)
    p32k = P.packed_plan_any(32768, 1, 4)
    assert p32k is not None and p32k[0] == "wide"


@pytest.mark.parametrize("nu", [1, 2])
def test_packed_write_through_matches(nu):
    """The write-through drain variant (large-n geometry) is exactly
    the plain kernel's math — only the VMEM drain path differs."""
    n = 256
    u, f = _rand(n)
    h = 1.0 / n
    up, fp = P.pack_grid(u), P.pack_grid(f)
    us = X.smooth(u, f, h, nu, "rbgs", "ghost0")
    R = X.residual_restrict(us, f, h, "ghost0")
    u2p, Rp = P._packed_rr_fused(up, fp, h=h, nu=nu, interpret=True,
                                 halo=8, bm=32, write_through=True)
    np.testing.assert_allclose(np.asarray(P.unpack_grid(u2p)),
                               np.asarray(us), atol=5e-6)
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(R),
                               rtol=1e-3, atol=3e-7 / h ** 2)
    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    for kind in ("inject", "bilinear"):
        uc = X.smooth(X.prolong_correct(u, V, kind), f, h, nu, "rbgs",
                      "ghost0")
        gp = P._packed_pc_fused(up, fp, V, h=h, nu=nu, kind=kind,
                                interpret=True, halo=8, bm=32,
                                write_through=True)
        np.testing.assert_allclose(np.asarray(P.unpack_grid(gp)),
                                   np.asarray(uc), atol=5e-6)
    g2, racc = P._packed_pc_fused(up, fp, V, h=h, nu=nu, kind="inject",
                                  interpret=True, halo=8, bm=32,
                                  rnorm=True, write_through=True)
    expect = X.residual_sq_sum(P.unpack_grid(g2), f, h)
    np.testing.assert_allclose(float(jnp.sum(racc)), float(expect),
                               rtol=1e-4)


def test_packed_pc_rnorm_matches():
    n = 256
    u, f = _rand(n)
    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    h = 1.0 / n
    up, r2 = P.packed_prolong_correct_smooth_rnorm(
        P.pack_grid(u), P.pack_grid(f), V, h, 1, kind="bilinear")
    expect = X.residual_sq_sum(P.unpack_grid(up), f, h)
    np.testing.assert_allclose(float(r2), float(expect), rtol=1e-4)


def test_packed_cycle_matches_unpacked_cycle(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    n = 256
    spec = Spec(size=n, scheme="fast", backend="xla")
    u, f = _rand(n)
    h = spec.fine_h
    ref = make_cycle(spec)(u, f, h)
    pc = PK.make_packed_cycle(spec)
    got = PK.unpack(pc(PK.pack(u), PK.pack(f), h))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize("stop,stop_check,cycle", [
    ("update", "every", "v"),
    ("residual", "every", "v"),
    ("residual", "adaptive", "v"),
    ("residual", "every", "fmg"),
])
def test_packed_solve_matches_unpacked(monkeypatch, stop, stop_check,
                                       cycle):
    from mgpoisson import MultigridPoisson
    n = 256
    # update-RMS floor: the packed cycle's f32 noise floor sits a few
    # x higher than the where-select form's (different add orders at
    # the 1/h^2 residual scale); pick tolerances above both floors so
    # the packed/unpacked trajectories stop at the same cycle
    tol = 2e-5 if stop == "update" else 1e-6
    spec = Spec(size=n, scheme="fast", stop=stop, stop_check=stop_check,
                cycle=cycle, tol=tol, maxiter=12)
    monkeypatch.setenv("MGPOISSON_PACKED", "0")
    mg0 = MultigridPoisson(spec)
    assert not mg0._packed
    r0 = mg0.solve()
    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    mg1 = MultigridPoisson(spec)
    assert mg1._packed
    r1 = mg1.solve()
    assert r1.converged == r0.converged
    # rounding-profile differences near the stop threshold can move
    # the stopping cycle by one
    assert abs(r1.iterations - r0.iterations) <= 1
    np.testing.assert_allclose(np.asarray(r1.psi), np.asarray(r0.psi),
                               atol=1e-4, rtol=1e-3)
    k = min(r1.iterations, r0.iterations, 5)
    np.testing.assert_allclose(np.asarray(r1.errs[:k]),
                               np.asarray(r0.errs[:k]), rtol=5e-2)


def test_packed_not_engaged_off_or_unsupported(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    # wjacobi (tuned) never packs; mesh never packs
    assert not PK.supported(Spec(size=256, scheme="tuned"))
    assert not PK.supported(Spec(size=256, scheme="fast",
                                 mesh_shape=(2, 2), smoother="rbgs"))
    monkeypatch.setenv("MGPOISSON_PACKED", "0")
    assert not PK.supported(Spec(size=256, scheme="fast"))


def test_packed_bf16_solve_engages_and_matches(monkeypatch):
    """The bf16 packed auto-engage (unblocked by the r5 on-device
    parity sweep): a bf16 fast solve runs packed and lands within
    bf16 reorder noise of the unpacked bf16 solve."""
    from mgpoisson import MultigridPoisson

    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    spec = Spec(size=256, scheme="fast", backend="pallas",
                dtype="bfloat16", stop="residual", tol=1e-2, maxiter=8)
    mg1 = MultigridPoisson(spec)
    assert mg1._packed
    r1 = mg1.solve()
    monkeypatch.setenv("MGPOISSON_PACKED", "0")
    mg0 = MultigridPoisson(spec)
    assert not mg0._packed
    r0 = mg0.solve()
    assert abs(r1.iterations - r0.iterations) <= 1
    a = np.asarray(r1.psi, dtype=np.float32)
    b = np.asarray(r0.psi, dtype=np.float32)
    scale = max(np.abs(b).max(), 1e-30)
    np.testing.assert_allclose(a / scale, b / scale, atol=0.05)

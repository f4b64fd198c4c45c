"""Packed-persistent fine level composed with the explicit shard_map
partition (VERDICT r4 item 4).

Two gates, mirroring tests/test_pallas_sharded.py's structure:
1. kernel-level (no shard_map): the packed strip kernels
   (`kernels/pallas.py packed_rr_sharded / packed_pc_sharded`) run per
   row block with strips assembled exactly as the ppermute exchange
   delivers them, and the reassembled result matches the unsharded XLA
   ops on the unpacked layout;
2. solve-level: a (2,1)-mesh spmd solve with the packed path engaged
   matches the same solve with it forced off.

Key invariant under test: pack_grid is row-preserving, so on a
row-sharded mesh the globally packed array IS the per-shard packed
array and row strips of the packed array are valid packed strips.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import mgpoisson.kernels.pallas as pk
import mgpoisson.kernels.xla as X
from mgpoisson.core.spec import Spec
from mgpoisson.cycle import packed as PK

RNG = np.random.default_rng(23)
F32 = jnp.float32


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _rand(n):
    u = jnp.asarray(RNG.standard_normal((n, n)), F32)
    f = jnp.asarray(RNG.standard_normal((n, n)), F32)
    return u, f


def _row_strips(G, i0, nl, depth):
    """(top, bot, None, None) row strips for row-block i0 of G,
    zero-filled outside the grid — the ppermute exchange's delivery."""
    Gp = jnp.pad(G, ((depth, depth), (0, 0)))
    r0 = depth + i0 * nl
    return (Gp[r0 - depth:r0, :], Gp[r0 + nl:r0 + nl + depth, :],
            None, None)


def _flags(i0, px):
    return jnp.asarray([i0 == 0, i0 == px - 1, 1, 1], jnp.int32)


@pytest.mark.parametrize("n,px,nu", [(256, 2, 1), (512, 4, 2)])
def test_packed_rr_sharded_matches_xla(n, px, nu):
    u, f = _rand(n)
    h = 1.0 / n
    nl = n // px
    UP, FP = pk.pack_grid(u), pk.pack_grid(f)
    plan = pk.packed_sharded_plan((nl, n), nu, 4)
    assert plan is not None
    d = plan[0]

    us_ref = X.smooth(u, f, h, nu, "rbgs", "ghost0")
    R_ref = X.residual_restrict(us_ref, f, h, "ghost0")

    up_out = np.zeros((n, n), np.float32)
    R_out = np.zeros((n // 2, n // 2), np.float32)
    for i0 in range(px):
        ub = UP[i0 * nl:(i0 + 1) * nl, :]
        fb = FP[i0 * nl:(i0 + 1) * nl, :]
        ustr = _row_strips(UP, i0, nl, d)
        fstr = _row_strips(FP, i0, nl, d)
        ublk, Rblk = pk.packed_rr_sharded(ub, fb, ustr, fstr,
                                          _flags(i0, px), h, nu,
                                          plan=plan)
        up_out[i0 * nl:(i0 + 1) * nl, :] = np.asarray(ublk)
        R_out[i0 * nl // 2:(i0 + 1) * nl // 2, :] = np.asarray(Rblk)

    got = np.asarray(pk.unpack_grid(jnp.asarray(up_out)))
    np.testing.assert_allclose(got, np.asarray(us_ref), atol=5e-6)
    # R carries the 1/h^2 scale: residual entries ~1 are differences
    # of ~1e5-scale terms, so add-order noise is absolute ~1e-7/h^2
    np.testing.assert_allclose(R_out, np.asarray(R_ref), rtol=1e-3,
                               atol=3e-7 / h ** 2)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
@pytest.mark.parametrize("n,px,nu", [(256, 2, 1), (512, 4, 2)])
def test_packed_pc_sharded_matches_xla(kind, n, px, nu):
    u, f = _rand(n)
    V = jnp.asarray(RNG.standard_normal((n // 2, n // 2)), F32)
    h = 1.0 / n
    nl = n // px
    UP, FP = pk.pack_grid(u), pk.pack_grid(f)
    plan = pk.packed_sharded_plan((nl, n), nu, 4)
    assert plan is not None
    d = plan[0]

    uc = X.prolong_correct(u, V, kind)
    ue_ref = X.smooth(uc, f, h, nu, "rbgs", "ghost0")
    r2_ref = X.residual_sq_sum(ue_ref, f, h)

    up_out = np.zeros((n, n), np.float32)
    r2_acc = 0.0
    for i0 in range(px):
        ub = UP[i0 * nl:(i0 + 1) * nl, :]
        fb = FP[i0 * nl:(i0 + 1) * nl, :]
        Vb = V[i0 * nl // 2:(i0 + 1) * nl // 2, :]
        ustr = _row_strips(UP, i0, nl, d)
        fstr = _row_strips(FP, i0, nl, d)
        vstr = _row_strips(V, i0, nl // 2, 8)
        ublk, racc = pk.packed_pc_sharded(
            ub, fb, Vb, ustr, fstr, vstr, _flags(i0, px), h, nu, kind,
            plan=plan, rnorm=True)
        up_out[i0 * nl:(i0 + 1) * nl, :] = np.asarray(ublk)
        r2_acc += float(jnp.sum(racc))

    got = np.asarray(pk.unpack_grid(jnp.asarray(up_out)))
    np.testing.assert_allclose(got, np.asarray(ue_ref), atol=5e-6)
    np.testing.assert_allclose(r2_acc, float(r2_ref), rtol=1e-4)


@pytest.mark.parametrize("stop,stop_check", [
    ("residual", "every"),
    ("update", "every"),
    ("residual", "adaptive"),
])
def test_packed_spmd_solve_matches_unpacked(monkeypatch, stop,
                                            stop_check):
    """(2,1)-mesh spmd solve with the packed fine level engaged ==
    the same solve with MGPOISSON_PACKED=0 (same stopping cycle +-1,
    matching iterates)."""
    from mgpoisson import MultigridPoisson

    n = 256
    tol = 2e-5 if stop == "update" else 1e-6
    spec = Spec(size=n, scheme="fast", backend="pallas",
                mesh_shape=(2, 1), partition="spmd", stop=stop,
                stop_check=stop_check, tol=tol, maxiter=12)
    monkeypatch.setenv("MGPOISSON_PACKED", "0")
    mg0 = MultigridPoisson(spec)
    assert not mg0._packed
    r0 = mg0.solve()
    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    mg1 = MultigridPoisson(spec)
    assert mg1._packed
    r1 = mg1.solve()
    assert r1.converged == r0.converged
    assert abs(r1.iterations - r0.iterations) <= 1
    np.testing.assert_allclose(np.asarray(r1.psi), np.asarray(r0.psi),
                               atol=1e-4, rtol=1e-3)


def test_packed_spmd_matches_single_device_packed(monkeypatch):
    """The sharded packed solve equals the single-device packed solve
    (the fast path survives distribution — the hybrid's lesson,
    `cpu-gpu.lua:17-52`)."""
    from mgpoisson import MultigridPoisson

    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    n = 256
    spec1 = Spec(size=n, scheme="fast", backend="pallas",
                 stop="residual", tol=1e-6, maxiter=12)
    specS = spec1.with_(mesh_shape=(2, 1), partition="spmd")
    mg1 = MultigridPoisson(spec1)
    assert mg1._packed
    r1 = mg1.solve()
    mgS = MultigridPoisson(specS)
    assert mgS._packed
    rS = mgS.solve()
    assert rS.converged == r1.converged
    assert abs(rS.iterations - r1.iterations) <= 1
    scale = float(jnp.max(jnp.abs(r1.psi)))
    np.testing.assert_allclose(np.asarray(rS.psi) / scale,
                               np.asarray(r1.psi) / scale,
                               rtol=3e-5, atol=3e-5)


def test_packed_spmd_gating(monkeypatch):
    """Column-sharded meshes, wjacobi, bf16, and MGPOISSON_PACKED=0
    never take the packed spmd path."""
    from mgpoisson.shard.mesh import build_mesh

    monkeypatch.setenv("MGPOISSON_PACKED", "1")
    base = Spec(size=256, scheme="fast", backend="pallas",
                partition="spmd")
    m21 = build_mesh((2, 1))
    m22 = build_mesh((2, 2))
    assert PK.supported_spmd(base.with_(mesh_shape=(2, 1)), m21)
    # column-sharded: no packed column machinery
    assert not PK.supported_spmd(base.with_(mesh_shape=(2, 2)), m22)
    # wjacobi never packs
    assert not PK.supported_spmd(
        base.with_(mesh_shape=(2, 1), scheme="tuned"), m21)
    # bf16 fenced (same gate as the single-device packed path)
    assert not PK.supported_spmd(
        base.with_(mesh_shape=(2, 1), dtype="bfloat16"), m21)
    monkeypatch.setenv("MGPOISSON_PACKED", "0")
    assert not PK.supported_spmd(base.with_(mesh_shape=(2, 1)), m21)

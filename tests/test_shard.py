"""Sharded-execution tests on 8 virtual CPU devices (set in conftest via
xla_force_host_platform_device_count — SURVEY.md section 4 'multi-device
without a cluster').  Gate: sharded == single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpoisson import MultigridPoisson, Spec
from mgpoisson.shard.gspmd import level_partition_spec
from mgpoisson.shard.mesh import build_mesh, mesh_shape_for


def test_mesh_shape_factorization():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(4) == (2, 2)
    assert mesh_shape_for(16) == (4, 4)
    assert mesh_shape_for(1) == (1, 1)


def test_build_mesh_8_devices():
    mesh = build_mesh((4, 2))
    assert mesh.shape == {"x": 4, "y": 2}


def test_level_partition_spec_policy():
    mesh = build_mesh((4, 2))
    ps_fine = level_partition_spec(256, 2, mesh, replicate_below=16)
    assert tuple(ps_fine) == ("x", "y")
    ps_coarse = level_partition_spec(8, 2, mesh, replicate_below=16)
    assert tuple(ps_coarse) == (None, None)
    # 3D: only the first two axes shard
    ps_3d = level_partition_spec(64, 3, mesh, replicate_below=16)
    assert tuple(ps_3d) == ("x", "y", None)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2), (8, 1)])
def test_sharded_step_matches_single_device(mesh_shape):
    spec1 = Spec(size=64, dtype="float64", backend="xla", scheme="tuned")
    specN = spec1.with_(mesh_shape=mesh_shape, replicate_below=8)
    mg1 = MultigridPoisson(spec1)
    mgN = MultigridPoisson(specN)

    f = mg1.rhs()
    psi = mg1.init_state(f)
    psi1, err1 = mg1.step(psi, f)
    psiN, errN = mgN.step(psi, f)
    np.testing.assert_allclose(np.asarray(psiN), np.asarray(psi1),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(float(errN), float(err1), rtol=1e-12)


def test_sharded_solve_matches_single_device():
    spec1 = Spec(size=64, dtype="float64", backend="xla", scheme="tuned",
                 stop="residual", tol=1e-10)
    specN = spec1.with_(mesh_shape=(4, 2), replicate_below=8)
    res1 = MultigridPoisson(spec1).solve()
    resN = MultigridPoisson(specN).solve()
    assert res1.iterations == resN.iterations
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-10, atol=1e-8)


def test_sharded_reference_scheme_matches():
    spec1 = Spec(size=32, dtype="float64", backend="xla", scheme="reference",
                 maxiter=5)
    specN = spec1.with_(mesh_shape=(2, 2), replicate_below=8)
    res1 = MultigridPoisson(spec1).solve()
    resN = MultigridPoisson(specN).solve()
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-11, atol=1e-9)


def test_sharded_3d():
    spec1 = Spec(size=32, ndim=3, dtype="float64", backend="xla",
                 scheme="tuned", maxiter=3)
    specN = spec1.with_(mesh_shape=(2, 2), replicate_below=8)
    res1 = MultigridPoisson(spec1).solve()
    resN = MultigridPoisson(specN).solve()
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-11, atol=1e-9)


def test_fine_level_actually_sharded():
    # the fine-level psi produced by a sharded step carries the 2D layout
    spec = Spec(size=64, dtype="float64", backend="xla", scheme="tuned",
                mesh_shape=(4, 2), replicate_below=8)
    mg = MultigridPoisson(spec)
    f = mg.rhs()
    psi, _ = mg.step(mg.init_state(f), f)
    shardings = {tuple(s.data.shape) for s in psi.addressable_shards}
    assert shardings == {(16, 32)}  # 64/4 x 64/2


# ---------------------------------------------------------------- spmd path

@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2), (8, 1)])
@pytest.mark.parametrize("scheme", ["tuned", "reference"])
def test_spmd_step_matches_single_device(mesh_shape, scheme):
    spec1 = Spec(size=64, dtype="float64", backend="xla", scheme=scheme)
    specN = spec1.with_(mesh_shape=mesh_shape, partition="spmd",
                        replicate_below=8)
    mg1 = MultigridPoisson(spec1)
    mgN = MultigridPoisson(specN)
    f = mg1.rhs()
    psi = mg1.init_state(f)
    psi1, err1 = mg1.step(psi, f)
    psiN, errN = mgN.step(psi, f)
    np.testing.assert_allclose(np.asarray(psiN), np.asarray(psi1),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(float(errN), float(err1), rtol=1e-12)


def test_spmd_solve_matches_gspmd():
    base = Spec(size=64, dtype="float64", backend="xla", scheme="tuned",
                stop="residual", tol=1e-10, replicate_below=8,
                mesh_shape=(4, 2))
    res_g = MultigridPoisson(base).solve()
    res_s = MultigridPoisson(base.with_(partition="spmd")).solve()
    assert res_g.iterations == res_s.iterations
    np.testing.assert_allclose(np.asarray(res_s.psi), np.asarray(res_g.psi),
                               rtol=1e-10, atol=1e-8)


def test_spmd_3d_matches_single_device():
    spec1 = Spec(size=32, ndim=3, dtype="float64", backend="xla",
                 scheme="tuned", maxiter=3)
    specN = spec1.with_(mesh_shape=(4, 2), partition="spmd",
                        replicate_below=8)
    res1 = MultigridPoisson(spec1).solve()
    resN = MultigridPoisson(specN).solve()
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-11, atol=1e-9)
    shardings = {tuple(s.data.shape) for s in resN.psi.addressable_shards}
    assert shardings == {(8, 16, 32)}


def test_spmd_wcycle_matches_single_device():
    spec1 = Spec(size=64, dtype="float64", backend="xla", scheme="tuned",
                 cycle="w", maxiter=3)
    specN = spec1.with_(mesh_shape=(2, 2), partition="spmd",
                        replicate_below=8)
    res1 = MultigridPoisson(spec1).solve()
    resN = MultigridPoisson(specN).solve()
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-11, atol=1e-9)


@pytest.mark.parametrize("scheme", ["tuned", "reference"])
def test_spmd_fmg_matches_unsharded(scheme):
    # FMG under the explicit partition: the sharded FMG initializer and
    # the subsequent sharded solve must match the single-device FMG path
    spec1 = Spec(size=64, dtype="float64", scheme=scheme, cycle="fmg",
                 backend="xla", maxiter=6)
    specN = spec1.with_(mesh_shape=(2, 2), partition="spmd",
                        replicate_below=8)
    mg1 = MultigridPoisson(spec1)
    mgN = MultigridPoisson(specN)
    f = mg1.rhs()

    u0_1 = mg1.init_state(f)
    u0_N = mgN.init_state(f)
    np.testing.assert_allclose(np.asarray(u0_N), np.asarray(u0_1),
                               rtol=1e-11, atol=1e-9)

    res1 = mg1.solve(f)
    resN = mgN.solve(f)
    assert resN.iterations == res1.iterations
    np.testing.assert_allclose(np.asarray(resN.psi), np.asarray(res1.psi),
                               rtol=1e-11, atol=1e-9)


def test_mesh_fences_pallas_backend():
    # GSPMD cannot partition a pallas_call; under a mesh get_ops must
    # return the XLA ops for every level regardless of backend choice
    from mgpoisson.kernels import get_ops, xla

    for backend in ("auto", "pallas"):
        spec = Spec(size=512, backend=backend, mesh_shape=(4, 2),
                    pallas_min_size=64)
        assert get_ops(spec, 512) is xla

    # and a solver constructed with an explicit mesh normalizes
    # spec.mesh_shape so the fence applies
    from mgpoisson.shard.mesh import build_mesh
    mg = MultigridPoisson(Spec(size=64, backend="auto"),
                          mesh=build_mesh((4, 2)))
    assert mg.spec.mesh_shape == (4, 2)

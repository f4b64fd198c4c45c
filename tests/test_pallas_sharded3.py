"""3D per-shard fused Pallas strip kernels (interpreter mode), tested
WITHOUT shard_map: a global (nz, ny, nx) grid is split into pz z-slabs,
z strips are assembled exactly as the SPMD layer's ppermute exchange
delivers them (zero fill past the global boundary), every slab runs the
strip kernel independently, and the reassembled result must match the
unsharded XLA composite ops.

3D analog of tests/test_pallas_sharded.py for z-sharded ((N, 1)) device
meshes — the natural ICI ring for 3D domains.  Reference behavior under
test: the fused fine-level kernels ARE the hot path
(/root/reference/gpu.lua:286-346), composed with domain decomposition.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mgpoisson.kernels import pallas as pk, xla


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("MGPOISSON_PALLAS_INTERPRET", "1")


def _data(shape, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=shape), jnp.float32)
    f = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return u, f


def _zstrips(G, i0, pz, nzl, depth):
    """(top, bot) z-slab strips for slab i0 of G, zero past the grid."""
    Gp = jnp.pad(G, ((depth, depth), (0, 0), (0, 0)))
    z0 = depth + i0 * nzl
    return Gp[z0 - depth:z0], Gp[z0 + nzl:z0 + nzl + depth]


def _zflags(i0, pz):
    return jnp.asarray([i0 == 0, i0 == pz - 1, 1, 1], jnp.int32)


@pytest.mark.parametrize("smoother,nu", [("wjacobi", 3), ("rbgs", 2)])
@pytest.mark.parametrize("bc", ["ghost0", "face"])
def test_rr_sharded3_matches_xla(smoother, nu, bc):
    nz, ny, nx, pz = 64, 64, 128, 2
    nzl = nz // pz
    u, f = _data((nz, ny, nx))
    h = 1.0 / ny
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    plan = (hz, 8, 32, (hz + 3) // 2)

    u_ref, R_ref = xla.smooth_residual_restrict(u, f, h, nu, smoother, bc)

    u_out = np.zeros((nz, ny, nx), np.float32)
    R_out = np.zeros((nz // 2, ny // 2, nx // 2), np.float32)
    for i0 in range(pz):
        ub, fb = u[i0 * nzl:(i0 + 1) * nzl], f[i0 * nzl:(i0 + 1) * nzl]
        us = _zstrips(u, i0, pz, nzl, hz)
        fs = _zstrips(f, i0, pz, nzl, hz)
        ug, Rg = pk.smooth_rr_sharded3(
            ub, fb, us, fs, _zflags(i0, pz), h, nu, smoother, bc,
            plan=plan)
        u_out[i0 * nzl:(i0 + 1) * nzl] = ug
        R_out[i0 * nzl // 2:(i0 + 1) * nzl // 2] = Rg

    np.testing.assert_allclose(u_out, np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    scale = float(jnp.max(jnp.abs(R_ref)))
    np.testing.assert_allclose(R_out / scale, np.asarray(R_ref) / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
@pytest.mark.parametrize("smoother,nu,bc", [("wjacobi", 3, "ghost0"),
                                            ("wjacobi", 3, "face"),
                                            ("rbgs", 2, "ghost0")])
def test_pc_sharded3_matches_xla(kind, smoother, nu, bc):
    nz, ny, nx, pz = 64, 64, 128, 2
    nzl = nz // pz
    u, f = _data((nz, ny, nx), seed=2)
    rng = np.random.default_rng(3)
    V = jnp.asarray(rng.normal(size=(nz // 2, ny // 2, nx // 2)),
                    jnp.float32)
    h = 1.0 / ny
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    chz = (hz + 3) // 2
    plan = (hz, 8, 32, chz)

    ref = xla.prolong_correct_smooth(u, f, V, h, nu, smoother, bc, kind)
    r_ref = xla.residual(ref, f, h, bc)

    got = np.zeros((nz, ny, nx), np.float32)
    r2 = 0.0
    for i0 in range(pz):
        ub, fb = u[i0 * nzl:(i0 + 1) * nzl], f[i0 * nzl:(i0 + 1) * nzl]
        Vb = V[i0 * nzl // 2:(i0 + 1) * nzl // 2]
        us = _zstrips(u, i0, pz, nzl, hz)
        fs = _zstrips(f, i0, pz, nzl, hz)
        vs = _zstrips(V, i0, pz, nzl // 2, chz)
        ug, racc = pk.pc_smooth_sharded3(
            ub, fb, Vb, us, fs, vs, _zflags(i0, pz), h, nu, smoother,
            bc, kind, plan=plan, rnorm=True)
        got[i0 * nzl:(i0 + 1) * nzl] = ug
        r2 += float(jnp.sum(racc))

    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
    # the free residual-norm slab agrees with a separate pass
    np.testing.assert_allclose(
        np.sqrt(r2), float(jnp.sqrt(jnp.sum(r_ref * r_ref))), rtol=1e-4)


def _yzshard(G, i0, pz, j0, py, hz, hy=8):
    """(front, back) z-EXTENDED y-edge strips for shard (i0, j0) of G,
    exactly as the SPMD layer's sequential z-then-y ppermute exchange
    delivers them: the y-neighbor's 8-deep y edge over the shard's
    extended z window, zeros past any global boundary."""
    nzl, nyl = G.shape[0] // pz, G.shape[1] // py
    Gp = jnp.pad(G, ((hz, hz), (hy, hy), (0, 0)))
    z0 = i0 * nzl           # padded-coord start of the extended window
    yf = j0 * nyl           # padded y of the front strip [y0-hy, y0)
    yb = hy + (j0 + 1) * nyl
    return (Gp[z0:z0 + nzl + 2 * hz, yf:yf + hy],
            Gp[z0:z0 + nzl + 2 * hz, yb:yb + hy])


def _yzflags(i0, pz, j0, py):
    return jnp.asarray([i0 == 0, i0 == pz - 1, j0 == 0, j0 == py - 1],
                       jnp.int32)


@pytest.mark.parametrize("smoother,nu,bc", [("wjacobi", 3, "ghost0"),
                                            ("rbgs", 2, "face")])
def test_rr_sharded3_ysplit_matches_xla(smoother, nu, bc):
    """(2, 2) z+y-sharded mesh: all four shards run the strip kernel
    with z-slab AND z-extended y-edge strips; reassembly matches the
    unsharded composite.  by=32 < nyl=64 also exercises interior-y
    blocks next to strip-fed edge blocks."""
    nz, ny, nx, pz, py = 32, 128, 256, 2, 2
    nzl, nyl = nz // pz, ny // py
    u, f = _data((nz, ny, nx), seed=5)
    h = 1.0 / ny
    hz = (2 if smoother == "rbgs" else 1) * nu + 1
    plan = (hz, 8, 32, (hz + 3) // 2)

    u_ref, R_ref = xla.smooth_residual_restrict(u, f, h, nu, smoother, bc)

    u_out = np.zeros((nz, ny, nx), np.float32)
    R_out = np.zeros((nz // 2, ny // 2, nx // 2), np.float32)
    for i0 in range(pz):
        for j0 in range(py):
            zs, ys = slice(i0 * nzl, (i0 + 1) * nzl), \
                slice(j0 * nyl, (j0 + 1) * nyl)
            ub, fb = u[zs, ys], f[zs, ys]
            ustr = (_zstrips(u[:, ys], i0, pz, nzl, hz)
                    + _yzshard(u, i0, pz, j0, py, hz))
            fstr = (_zstrips(f[:, ys], i0, pz, nzl, hz)
                    + _yzshard(f, i0, pz, j0, py, hz))
            ug, Rg = pk.smooth_rr_sharded3(
                ub, fb, ustr, fstr, _yzflags(i0, pz, j0, py), h, nu,
                smoother, bc, plan=plan)
            u_out[zs, ys] = ug
            R_out[i0 * nzl // 2:(i0 + 1) * nzl // 2,
                  j0 * nyl // 2:(j0 + 1) * nyl // 2] = Rg

    np.testing.assert_allclose(u_out, np.asarray(u_ref),
                               rtol=2e-5, atol=2e-5)
    scale = float(jnp.max(jnp.abs(R_ref)))
    np.testing.assert_allclose(R_out / scale, np.asarray(R_ref) / scale,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["inject", "bilinear"])
def test_pc_sharded3_ysplit_matches_xla(kind):
    """(2, 2)-sharded prolong+correct+smooth with coarse y strips; the
    bilinear blend must read seamlessly across device-interior y edges
    and zero only at the global ones."""
    smoother, nu, bc = "wjacobi", 2, "ghost0"
    nz, ny, nx, pz, py = 32, 128, 256, 2, 2
    nzl, nyl = nz // pz, ny // py
    u, f = _data((nz, ny, nx), seed=7)
    rng = np.random.default_rng(8)
    V = jnp.asarray(rng.normal(size=(nz // 2, ny // 2, nx // 2)),
                    jnp.float32)
    h = 1.0 / ny
    hz = nu + 1
    chz = (hz + 3) // 2
    plan = (hz, 8, 32, chz)

    ref = xla.prolong_correct_smooth(u, f, V, h, nu, smoother, bc, kind)
    r_ref = xla.residual(ref, f, h, bc)

    got = np.zeros((nz, ny, nx), np.float32)
    r2 = 0.0
    for i0 in range(pz):
        for j0 in range(py):
            zs, ys = slice(i0 * nzl, (i0 + 1) * nzl), \
                slice(j0 * nyl, (j0 + 1) * nyl)
            csz = slice(i0 * nzl // 2, (i0 + 1) * nzl // 2)
            csy = slice(j0 * nyl // 2, (j0 + 1) * nyl // 2)
            ustr = (_zstrips(u[:, ys], i0, pz, nzl, hz)
                    + _yzshard(u, i0, pz, j0, py, hz))
            fstr = (_zstrips(f[:, ys], i0, pz, nzl, hz)
                    + _yzshard(f, i0, pz, j0, py, hz))
            vstr = (_zstrips(V[:, csy], i0, pz, nzl // 2, chz)
                    + _yzshard(V, i0, pz, j0, py, chz))
            ug, racc = pk.pc_smooth_sharded3(
                u[zs, ys], f[zs, ys], V[csz, csy], ustr, fstr, vstr,
                _yzflags(i0, pz, j0, py), h, nu, smoother, bc, kind,
                plan=plan, rnorm=True)
            got[zs, ys] = ug
            r2 += float(jnp.sum(racc))

    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.sqrt(r2), float(jnp.sqrt(jnp.sum(r_ref * r_ref))), rtol=1e-4)


def test_rr_sharded3_ysplit_bf16():
    """bf16 y+z-sharded strips: same reassembly, bf16 tolerances (the
    per-sweep rounding differences vs the XLA op order compound over
    nu, so a few e-2 relative is same-precision reorder noise)."""
    smoother, nu, bc = "wjacobi", 2, "ghost0"
    nz, ny, nx, pz, py = 32, 128, 256, 2, 2
    nzl, nyl = nz // pz, ny // py
    u32, f32 = _data((nz, ny, nx), seed=11)
    u, f = u32.astype(jnp.bfloat16), f32.astype(jnp.bfloat16)
    h = 1.0 / ny
    hz = nu + 1
    plan = pk.sharded_plan3((nzl, nyl, nx), nu, smoother, jnp.bfloat16,
                            y_nbrs=True)
    assert plan is not None and plan[0] >= hz  # dtype gate admits bf16
    plan = (hz, 8, 32, (hz + 3) // 2)

    u_ref, R_ref = xla.smooth_residual_restrict(u, f, h, nu, smoother, bc)

    u_out = np.zeros((nz, ny, nx), np.float32)
    for i0 in range(pz):
        for j0 in range(py):
            zs, ys = slice(i0 * nzl, (i0 + 1) * nzl), \
                slice(j0 * nyl, (j0 + 1) * nyl)
            ustr = (_zstrips(u[:, ys], i0, pz, nzl, hz)
                    + _yzshard(u, i0, pz, j0, py, hz))
            fstr = (_zstrips(f[:, ys], i0, pz, nzl, hz)
                    + _yzshard(f, i0, pz, j0, py, hz))
            ug, _ = pk.smooth_rr_sharded3(
                u[zs, ys], f[zs, ys], ustr, fstr,
                _yzflags(i0, pz, j0, py), h, nu, smoother, bc,
                plan=plan)
            u_out[zs, ys] = np.asarray(ug, np.float32)

    np.testing.assert_allclose(u_out,
                               np.asarray(u_ref, dtype=np.float32),
                               rtol=4e-2, atol=4e-2)


def test_sharded_plan3_geometry():
    # BASELINE-config-4-like local slab: 256^3 over 4 z-devices
    plan = pk.sharded_plan3((64, 256, 256), 3, "wjacobi", jnp.float32)
    assert plan is not None
    hz, bz, by, chz = plan
    assert hz == 4 and chz == 3 and 64 % bz == 0 and 256 % by == 0
    assert hz <= bz and chz <= bz // 2
    # lane-misaligned nx / odd local nz / f64 -> no plan (XLA fallback)
    assert pk.sharded_plan3((64, 256, 192), 3, "wjacobi",
                            jnp.float32) is None
    assert pk.sharded_plan3((64, 128, 128), 3, "wjacobi",
                            jnp.float32) is None
    assert pk.sharded_plan3((6, 256, 256), 3, "wjacobi",
                            jnp.float32) is None
    assert pk.sharded_plan3((64, 256, 256), 3, "wjacobi",
                            jnp.float64) is None


# ------------------------------------------------- shard_map integration

def _step_pair(spec1, specN):
    from mgpoisson import MultigridPoisson
    mg1 = MultigridPoisson(spec1)
    mgN = MultigridPoisson(specN)
    f = mg1.rhs()
    psi = mg1.init_state(f)
    psi1, err1 = mg1.step(psi, f)
    psiN, errN = mgN.step(psi, f)
    return psi1, err1, psiN, errN


def test_spmd_pallas3d_step_matches_single_device():
    """(2,1) z-sharded 3D mesh + stop='residual': the fused 3D strip
    kernels run on the fine level (plan exists for the (128, 256, 256)
    local slab — sharded_plan3 needs nx % 256 for lane-aligned R/V
    slices), coarser levels fall back to XLA / the replicated handoff,
    and the fused rnorm slab feeds the stopping metric.  nu=1+1 keeps
    the interpreter runtime in check; the kernel code path is nu-
    independent."""
    from mgpoisson import Spec

    spec1 = Spec(size=256, ndim=3, dtype="float32", backend="xla",
                 scheme="tuned", stop="residual", pre_smooth=1,
                 post_smooth=1)
    specP = spec1.with_(mesh_shape=(2, 1), partition="spmd",
                        backend="pallas")
    plan = pk.sharded_plan3((128, 256, 256), 1,
                            spec1.smoother_resolved, jnp.float32)
    assert plan is not None
    # the compiled-geometry gate: a 128-lane (but not 256) local slab
    # has NO plan (its halved outputs would break Mosaic lane tiling)
    assert pk.sharded_plan3((64, 128, 128), 3,
                            spec1.smoother_resolved, jnp.float32) is None

    psi1, err1, psiP, errP = _step_pair(spec1, specP)
    scale = float(jnp.max(jnp.abs(psi1)))
    np.testing.assert_allclose(np.asarray(psiP) / scale,
                               np.asarray(psi1) / scale,
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(errP), float(err1), rtol=1e-3)


def test_spmd_pallas3d_zy_mesh_step_matches_single_device():
    """(2, 2) z+y-sharded 3D mesh: the fine level runs the strip
    kernels with both z-slab and y-edge strips (the plan exists for
    the (128, 128, 256) local block); small local blocks fall back to
    the XLA shard path / replicated handoff."""
    from mgpoisson import Spec

    spec1 = Spec(size=256, ndim=3, dtype="float32", backend="xla",
                 scheme="tuned", stop="residual", pre_smooth=1,
                 post_smooth=1)
    specP = spec1.with_(mesh_shape=(2, 2), partition="spmd",
                        backend="pallas")
    plan = pk.sharded_plan3((128, 128, 256), 1,
                            spec1.smoother_resolved, jnp.float32,
                            y_nbrs=True)
    assert plan is not None

    psi1, err1, psiP, errP = _step_pair(spec1, specP)
    scale = float(jnp.max(jnp.abs(psi1)))
    np.testing.assert_allclose(np.asarray(psiP) / scale,
                               np.asarray(psi1) / scale,
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(errP), float(err1), rtol=1e-3)


def test_spmd_pallas3d_fmg_init_finite_and_close():
    """FMG initialization under the (2,2) 3D pallas partition: the
    sharded fmg_local routes sharded levels through the same strip-
    kernel cycle(); its init must match the single-device FMG init."""
    from mgpoisson import Spec, MultigridPoisson

    spec1 = Spec(size=256, ndim=3, dtype="float32", backend="xla",
                 scheme="tuned", cycle="fmg", pre_smooth=1,
                 post_smooth=1, maxiter=2)
    specP = spec1.with_(mesh_shape=(2, 2), partition="spmd",
                        backend="pallas")
    mg1 = MultigridPoisson(spec1)
    mgP = MultigridPoisson(specP)
    f = mg1.rhs()
    u0_1 = mg1.init_state(f)
    u0_P = mgP.init_state(f)
    scale = float(jnp.max(jnp.abs(u0_1)))
    np.testing.assert_allclose(np.asarray(u0_P) / scale,
                               np.asarray(u0_1) / scale,
                               rtol=3e-5, atol=3e-5)


def test_spmd_pallas3d_small_y_split_mesh_falls_back():
    """A 3D (2,2) mesh at a size whose local nx fails the lane gate
    has no strip-kernel plan (the XLA shard path serves it) — and
    still matches single-device."""
    from mgpoisson import Spec
    from mgpoisson.shard.spmd import _pallas_enabled

    spec1 = Spec(size=64, ndim=3, dtype="float32", backend="xla",
                 scheme="tuned")
    specP = spec1.with_(mesh_shape=(2, 2), partition="spmd",
                        backend="pallas")
    assert _pallas_enabled(specP)   # enabled, fenced per level instead

    psi1, err1, psiP, errP = _step_pair(spec1, specP)
    scale = float(jnp.max(jnp.abs(psi1)))
    np.testing.assert_allclose(np.asarray(psiP) / scale,
                               np.asarray(psi1) / scale,
                               rtol=3e-5, atol=3e-5)

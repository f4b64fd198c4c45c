"""Per-stage differential tests of the full V-cycle against the oracle —
the JAX analog of diffing the reference's debug dumps stage-by-stage
(`cpu-raw.lua:126-140`, `gpu.lua:269-284`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgpoisson import oracle
from mgpoisson.core.spec import Spec
from mgpoisson.cycle.vcycle import fmg, v_cycle, w_cycle


def _spec(size, scheme, **kw):
    return Spec(size=size, dtype="float64", backend="xla", scheme=scheme, **kw)


@pytest.mark.parametrize("size", [8, 16, 64])
@pytest.mark.parametrize("scheme", ["reference", "tuned"])
def test_vcycle_stage_trace_matches_oracle(size, scheme):
    spec = _spec(size, scheme)
    f = oracle.point_charge_rhs(size)
    u0 = -f

    otrace = []
    oracle.v_cycle(u0.copy(), f, 1.0 / size,
                   pre_smooth=spec.nu_pre, post_smooth=spec.nu_post,
                   smoother=spec.smoother_resolved, scheme=scheme,
                   trace=otrace)

    jtrace = []
    v_cycle(jnp.asarray(u0), jnp.asarray(f), 1.0 / size, spec, trace=jtrace)

    assert [(n, s) for n, s, _ in otrace] == [(n, s) for n, s, _ in jtrace]
    for (name, lsize, oarr), (_, _, jarr) in zip(otrace, jtrace):
        np.testing.assert_allclose(
            np.asarray(jarr), oarr, rtol=1e-10, atol=1e-8,
            err_msg=f"stage {name} at level size {lsize}")


@pytest.mark.parametrize("scheme", ["reference", "tuned"])
def test_wcycle_converges_faster_than_v(scheme):
    size = 32
    spec_v = _spec(size, scheme)
    spec_w = spec_v.with_(cycle="w")
    f = jnp.asarray(oracle.point_charge_rhs(size))
    h = 1.0 / size

    uv = uw = -f
    for _ in range(3):
        uv = v_cycle(uv, f, h, spec_v)
        uw = w_cycle(uw, f, h, spec_w)
    from mgpoisson.kernels import xla
    assert float(xla.residual_norm(uw, f, h)) <= float(
        xla.residual_norm(uv, f, h)) * 1.001


def test_fmg_single_pass_accuracy():
    size = 64
    spec = _spec(size, "tuned")
    f = jnp.asarray(oracle.point_charge_rhs(size))
    h = 1.0 / size
    u = fmg(f, h, spec, n_vcycles=2)
    from mgpoisson.kernels import xla
    r0 = float(xla.residual_norm(-f, f, h))
    assert float(xla.residual_norm(u, f, h)) / r0 < 1e-2


def test_vcycle_jits_and_is_deterministic():
    import jax
    size = 32
    spec = _spec(size, "tuned")
    f = jnp.asarray(oracle.point_charge_rhs(size))
    fn = jax.jit(lambda u, f: v_cycle(u, f, 1.0 / size, spec))
    a = fn(-f, f)
    b = fn(-f, f)
    # determinism: same input -> identical bits (SURVEY.md section 5,
    # race detection: red-black GS removes the GS race by construction)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_coarse_size_option():
    # stopping the hierarchy early (coarse_size=4) still converges
    size = 32
    spec = _spec(size, "tuned", coarse_size=4, pre_smooth=3, post_smooth=3)
    f = jnp.asarray(oracle.point_charge_rhs(size))
    h = 1.0 / size
    u = -f
    from mgpoisson.kernels import xla
    r0 = float(xla.residual_norm(u, f, h))
    for _ in range(12):
        u = v_cycle(u, f, h, spec)
    assert float(xla.residual_norm(u, f, h)) / r0 < 1e-6

#!/usr/bin/env python
"""Time the fused half-level kernels at one VMEM-budget setting.

Usage: MGPOISSON_VMEM_BUDGET_MB=48 python tools/tune_kernels.py [size]

Prints one JSON line with the plan geometry and kernel times, so a
shell loop over budgets finds the stripe-size sweet spot on the real
chip.  The budget is read at mgpoisson.kernels.pallas import, hence one
process per setting.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from mgpoisson import MultigridPoisson, Spec
    from mgpoisson.bench.timing import chain_time
    from mgpoisson.cycle.vcycle import v_cycle
    from mgpoisson.kernels import pallas as pk

    spec = Spec(size=size, dtype="float32", scheme="tuned",
                backend="auto", stop="residual")
    nu, sm = spec.nu_pre, spec.smoother_resolved
    mg = MultigridPoisson(spec)
    f = mg.rhs()
    psi = mg.init_state(f)
    h = spec.fine_h

    kt = functools.partial(chain_time, k1=20, k2=220, tries=5)
    out = {"budget_mb": pk._VMEM_BUDGET // (1024 * 1024), "size": size,
           "smooth_plan": pk._smooth_plan(size, nu, sm, 4),
           "fused_plan": pk._fused_plan_or_whole(
               jax.ShapeDtypeStruct((size, size), jnp.float32), nu, sm)}

    try:
        t_s = kt(lambda u, ff: pk.smooth(u, ff, h, nu, sm, "ghost0"),
                 psi, consts=(f,))
        out["smooth_nu_ms"] = round(t_s * 1e3, 4)

        z = jnp.zeros((), psi.dtype)

        def _rr_chain(u, ff, zz):
            u2, R = pk.smooth_residual_restrict(u, ff, h, nu, sm, "ghost0")
            return u2.at[0, 0].add(zz * R[0, 0])

        out["rr_ms"] = round(kt(_rr_chain, psi, consts=(f, z)) * 1e3, 4)

        V = jnp.zeros((size // 2,) * 2, psi.dtype)
        out["pc_ms"] = round(kt(
            lambda u, ff, VV: pk.prolong_correct_smooth(
                u, ff, VV, h, nu, sm, "ghost0", spec.prolong_kind),
            psi, consts=(f, V)) * 1e3, 4)

        out["vcycle_ms"] = round(kt(
            lambda u, ff: v_cycle(u, ff, h, spec), psi,
            consts=(f,)) * 1e3, 4)
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

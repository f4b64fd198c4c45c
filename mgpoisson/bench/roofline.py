"""Per-kernel bandwidth roofline report.

The reference only ever wall-clocks whole runs and left OpenCL event
timing as a TODO (`test/test-gpu-obj.lua:268`).  Here every hot op is
timed individually (overhead-cancelled chained timing) and reported as
achieved GB/s against the chip's HBM peak — the BASELINE.md metric
(smoother >= 80% of roofline).

Usage: python -m mgpoisson.bench.roofline [--size 4096] [--dtype float32]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from mgpoisson.bench.timing import chain_time

HBM_PEAK_GBPS = {"tpu": 819.0}     # v5e; extend per platform as needed


def report(size: int = 4096, dtype: str = "float32", nu: int = 2):
    from mgpoisson import Spec
    from mgpoisson.cycle.vcycle import v_cycle
    from mgpoisson.kernels import get_ops

    spec = Spec(size=size, dtype=dtype, scheme="tuned", backend="auto",
                pre_smooth=nu, post_smooth=nu)
    ops = get_ops(spec, size)
    h = spec.fine_h
    itemsize = jnp.dtype(dtype).itemsize
    cells = size * size
    peak = HBM_PEAK_GBPS.get(jax.default_backend())

    f = jnp.zeros((size, size), jnp.dtype(dtype)) \
        .at[size // 2, size // 2].set(-1e6)
    u = -f
    V = jnp.zeros((size // 2, size // 2), jnp.dtype(dtype))

    # (label, fn, minimal HBM bytes per application).  Every fn's
    # operands are data-dependent on the chained carry — a constant
    # operand would be loop-invariant-hoisted out of the timing scan.
    entries = [
        (f"smooth rbgs x{nu} (fused)",
         lambda c: ops.smooth(c, f, h, nu, "rbgs", "ghost0"),
         3 * cells * itemsize),
        (f"smooth jacobi x{nu} (fused)",
         lambda c: ops.smooth(c, f, h, nu, "jacobi", "ghost0"),
         3 * cells * itemsize),
        # the coarse-grid round trip exactly as the V-cycle runs it:
        # R = restrict(residual(u)), u += P(R)
        ("residual_restrict + prolong_correct (bilinear)",
         lambda c: ops.prolong_correct(
             c, ops.residual_restrict(c, f, h, "ghost0"), "bilinear"),
         (3 * cells + 2 * (cells // 4)) * itemsize),
        ("residual_restrict + prolong_correct (inject)",
         lambda c: ops.prolong_correct(
             c, ops.residual_restrict(c, f, h, "ghost0"), "inject"),
         (3 * cells + 2 * (cells // 4)) * itemsize),
        ("full V-cycle (tuned)",
         lambda c: v_cycle(c, f, h, spec),
         None),
    ]

    rows = []
    print(f"platform={jax.default_backend()} size={size} dtype={dtype} "
          f"peak={peak} GB/s")
    print(f"{'op':32s} {'ms':>9s} {'GB/s':>9s} {'% peak':>8s}")
    for label, fn, nbytes in entries:
        t = chain_time(fn, u)
        gbps = nbytes / t / 1e9 if nbytes else None
        pct = 100 * gbps / peak if (gbps and peak) else None
        rows.append({"op": label, "seconds": t, "gbps": gbps,
                     "pct_peak": pct})
        print(f"{label:32s} {t * 1e3:9.3f} "
              f"{gbps if gbps else float('nan'):9.1f} "
              f"{pct if pct else float('nan'):8.1f}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=4096)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--nu", type=int, default=2)
    args = p.parse_args(argv)
    report(args.size, args.dtype, args.nu)


if __name__ == "__main__":
    main()

"""On-device compiled-kernel parity sweep.

The interpreter-mode differential tests (tests/test_pallas*.py) validate
kernel SEMANTICS on CPU; this module validates the COMPILED Mosaic
kernels on the hardware they actually run on — a miscompile in one
clipping branch could pass interpret tests and silently degrade
convergence.  It is the reference's cross-implementation diffing
(`/root/reference/cpu-raw.lua:120`, debug-dump trace comparison) applied
where the compiled kernels execute: every Pallas path (striped / whole /
wide / 3D / sharded-strip, smoother + both composites, both bcs, all
smoothers, f32 + bf16) against the XLA formulations, on device.

Run via bench.py (kernel_parity_max_err in the artifact extras) or
directly: python -m mgpoisson.bench.parity [--full].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _mkdata(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=shape), dtype)
    f = jnp.asarray(rng.normal(size=shape), dtype)
    return u, f


def _err(got, ref):
    """Normalized max |diff|, computed ON DEVICE — only the scalar
    crosses the host boundary.  (Fetching full 2048^2 grids through
    the remote-relay transport costs seconds per case; 145 cases at
    ~5.7 s each made the sweep the bench's longest section.)  f32
    accumulation is exact where it matters: the difference of two
    nearly-equal f32 values is exactly representable."""
    got = jnp.asarray(got, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30)
    return float(jnp.max(jnp.abs(got - ref)) / scale)


def run_parity(full: bool = False, sizes=(512, 2048)) -> dict:
    """Returns {"max_err": float, "worst": str, "cases": {name: err}}.

    Tolerances: f32 paths should agree with the XLA ops to ~1e-6
    (same-precision arithmetic, different op order); bf16 cases are
    compared against the XLA ops run in bf16 too, so they measure
    kernel parity, not precision loss.
    """
    from mgpoisson.kernels import pallas as pk, xla

    cases = {}
    failures = {}

    def add(name, got, ref):
        """got/ref may be values or thunks; a compile/run failure is
        recorded per case (Mosaic bugs must not kill the sweep — the
        artifact should enumerate every broken path, not just the
        first)."""
        try:
            if callable(got):
                got = got()
            if callable(ref):
                ref = ref()
            if isinstance(got, tuple):
                for i, (g, r) in enumerate(zip(got, ref)):
                    cases[f"{name}[{i}]"] = _err(g, r)
            else:
                cases[name] = _err(got, ref)
        except Exception as e:  # pragma: no cover - device-dependent
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"

    smoothers = [("wjacobi", 3), ("rbgs", 2)] + \
        ([("jacobi", 7)] if full else [])
    bcs = ("ghost0", "face") if full else ("ghost0",)
    dtypes = [jnp.float32, jnp.bfloat16]

    for n in sizes:
        h = 1.0 / n
        for dtype in dtypes:
            dt = {"float32": "f32", "bfloat16": "bf16"}[jnp.dtype(dtype).name]
            for sm, nu in smoothers:
                if not pk._supported(jax.ShapeDtypeStruct((n, n), dtype),
                                     nu):
                    continue
                u, f = _mkdata((n, n), dtype)
                V = _mkdata((n // 2, n // 2), dtype, seed=3)[0]
                for bc in bcs:
                    tag = f"{n}_{dt}_{sm}_{bc}"
                    add(f"smooth_{tag}",
                        lambda u=u, f=f, nu=nu, sm=sm, bc=bc:
                            pk.smooth(u, f, h, nu, sm, bc),
                        lambda u=u, f=f, nu=nu, sm=sm, bc=bc:
                            xla.smooth(u, f, h, nu, sm, bc))
                    add(f"rr_{tag}",
                        lambda u=u, f=f, nu=nu, sm=sm, bc=bc:
                            pk.smooth_residual_restrict(u, f, h, nu, sm,
                                                        bc),
                        lambda u=u, f=f, nu=nu, sm=sm, bc=bc:
                            xla.smooth_residual_restrict(u, f, h, nu, sm,
                                                         bc))
                    kind = "bilinear" if bc == "face" else "inject"
                    add(f"pc_{tag}",
                        lambda u=u, f=f, V=V, nu=nu, sm=sm, bc=bc,
                        kind=kind:
                            pk.prolong_correct_smooth(
                                u, f, V, h, nu, sm, bc, kind),
                        lambda u=u, f=f, V=V, nu=nu, sm=sm, bc=bc,
                        kind=kind:
                            xla.prolong_correct_smooth(
                                u, f, V, h, nu, sm, bc, kind))

                # rnorm-fused up-leg (free residual stopping)
                def _pcr_ref(u=u, f=f, V=V, nu=nu, sm=sm):
                    r_u2 = xla.prolong_correct_smooth(
                        u, f, V, h, nu, sm, "ghost0", "inject")
                    r_r2 = jnp.sum(
                        xla.residual(r_u2, f, h, "ghost0") ** 2)
                    return r_u2, jnp.asarray([r_r2])

                add(f"pcr_{n}_{dt}_{sm}",
                    lambda u=u, f=f, V=V, nu=nu, sm=sm: (
                        lambda gu_gr2: (gu_gr2[0],
                                        jnp.asarray([gu_gr2[1]])))(
                        pk.prolong_correct_smooth_rnorm(
                            u, f, V, h, nu, sm, "ghost0", "inject")),
                    _pcr_ref)

            # per-shard strip kernels, compiled, (1,1)-mesh layout:
            # zero strips + all-edges flags must equal the unsharded ops
            sm, nu = ("wjacobi", 3)
            u, f = _mkdata((n, n), dtype, seed=5)
            plan = pk.sharded_plan((n, n), nu, sm, dtype)
            if plan is not None:
                h8 = plan[0]
                zrow = jnp.zeros((h8, n), dtype)
                zcol = jnp.zeros((n + 2 * h8, 128), dtype)
                strips = (zrow, zrow, zcol, zcol)
                flags = jnp.ones((4,), jnp.int32)
                add(f"shard_rr_{n}_{dt}",
                    lambda u=u, f=f, strips=strips, flags=flags, nu=nu,
                    sm=sm, plan=plan:
                        pk.smooth_rr_sharded(u, f, strips, strips,
                                             flags, h, nu, sm, "ghost0",
                                             plan=plan),
                    lambda u=u, f=f, nu=nu, sm=sm:
                        xla.smooth_residual_restrict(u, f, h, nu, sm,
                                                     "ghost0"))
            # single-device-column layout: no column strips/window
            planc = pk.sharded_plan((n, n), nu, sm, dtype,
                                    col_nbrs=False)
            if planc is not None:
                h8 = planc[0]
                zrow = jnp.zeros((h8, n), dtype)
                stripsc = (zrow, zrow, None, None)
                zvrow = jnp.zeros((8, n // 2), dtype)
                vstripsc = (zvrow, zvrow, None, None)
                flags = jnp.ones((4,), jnp.int32)
                V = _mkdata((n // 2, n // 2), dtype, seed=6)[0]
                add(f"shard_rr_nocol_{n}_{dt}",
                    lambda u=u, f=f, stripsc=stripsc, flags=flags,
                    nu=nu, sm=sm, planc=planc:
                        pk.smooth_rr_sharded(u, f, stripsc, stripsc,
                                             flags, h, nu, sm, "ghost0",
                                             plan=planc),
                    lambda u=u, f=f, nu=nu, sm=sm:
                        xla.smooth_residual_restrict(u, f, h, nu, sm,
                                                     "ghost0"))
                add(f"shard_pc_nocol_{n}_{dt}",
                    lambda u=u, f=f, V=V, stripsc=stripsc,
                    vstripsc=vstripsc, flags=flags, nu=nu, sm=sm,
                    planc=planc:
                        pk.pc_smooth_sharded(u, f, V, stripsc, stripsc,
                                             vstripsc, flags, h, nu, sm,
                                             "ghost0", "bilinear",
                                             plan=planc),
                    lambda u=u, f=f, V=V, nu=nu, sm=sm:
                        xla.prolong_correct_smooth(u, f, V, h, nu, sm,
                                                   "ghost0", "bilinear"))

    # packed-persistent kernels (the scheme='fast' fine level,
    # cycle/packed.py): every packed path vs the XLA ops on the
    # unpacked layout, at the default stripe plan AND a forced
    # thin-stripe bm=32 multi-stripe geometry (the large-n shape at a
    # testable size), f32 + bf16.  These kernels auto-engage for every
    # scheme='fast' f32 solve on TPU, so the compiled sweep must cover
    # them (VERDICT r4 item 2).
    for n in sizes:
        h = 1.0 / n
        for dtype in dtypes:
            dt = {"float32": "f32",
                  "bfloat16": "bf16"}[jnp.dtype(dtype).name]
            itemsize = jnp.dtype(dtype).itemsize
            for nu in ((1, 2) if full else (1,)):
                plan = pk.packed_plan(n, nu, itemsize)
                if plan is None:
                    continue
                geoms = [plan]
                halo0 = plan[0]
                if plan[1] != 32:
                    geoms.append((halo0, 32))   # forced multi-stripe
                u, f = _mkdata((n, n), dtype, seed=11)
                up, fp = pk.pack_grid(u), pk.pack_grid(f)
                V = _mkdata((n // 2, n // 2), dtype, seed=12)[0]

                def _rr_ref(u=u, f=f, nu=nu, h=h):
                    us = xla.smooth(u, f, h, nu, "rbgs", "ghost0")
                    return us, xla.residual_restrict(us, f, h, "ghost0")

                for halo, bm in geoms:
                    tag = f"{n}_{dt}_nu{nu}_bm{bm}"
                    add(f"packed_rr_{tag}",
                        lambda up=up, fp=fp, nu=nu, h=h, halo=halo,
                        bm=bm: (lambda o: (pk.unpack_grid(o[0]), o[1]))(
                            pk._packed_rr_fused(up, fp, h=h, nu=nu,
                                                interpret=False,
                                                halo=halo, bm=bm)),
                        _rr_ref)
                    for kind in ("inject", "bilinear"):
                        add(f"packed_pc_{kind}_{tag}",
                            lambda up=up, fp=fp, V=V, nu=nu, h=h,
                            halo=halo, bm=bm, kind=kind:
                                pk.unpack_grid(pk._packed_pc_fused(
                                    up, fp, V, h=h, nu=nu, kind=kind,
                                    interpret=False, halo=halo, bm=bm)),
                            lambda u=u, f=f, V=V, nu=nu, h=h, kind=kind:
                                xla.smooth(
                                    xla.prolong_correct(u, V, kind),
                                    f, h, nu, "rbgs", "ghost0"))

                    def _pkr_ref(u=u, f=f, V=V, nu=nu, h=h):
                        u2 = xla.smooth(
                            xla.prolong_correct(u, V, "inject"),
                            f, h, nu, "rbgs", "ghost0")
                        return u2, jnp.asarray(
                            [xla.residual_sq_sum(u2, f, h)])

                    add(f"packed_pcr_{tag}",
                        lambda up=up, fp=fp, V=V, nu=nu, h=h, halo=halo,
                        bm=bm: (lambda o: (
                            pk.unpack_grid(o[0]),
                            jnp.asarray([jnp.sum(o[1])])))(
                            pk._packed_pc_fused(up, fp, V, h=h, nu=nu,
                                                kind="inject",
                                                interpret=False,
                                                halo=halo, bm=bm,
                                                rnorm=True)),
                        _pkr_ref)

    # from-zero down-leg (every coarse V-cycle entry, n >= 4096 in
    # production): the striped _rr_fused_zero vs XLA on an explicit
    # zeros array, f32 + bf16
    for n in sizes:
        h = 1.0 / n
        for dtype in dtypes:
            dt = {"float32": "f32",
                  "bfloat16": "bf16"}[jnp.dtype(dtype).name]
            plan = pk._fused_plan(n, 3, "wjacobi",
                                  jnp.dtype(dtype).itemsize)
            if not (n // plan[1] >= 2 and plan[1] > 2 * plan[0]
                    and plan[1] % 16 == 0):
                continue
            _, f = _mkdata((n, n), dtype, seed=13)

            def _z_ref(f=f, h=h):
                u = xla.smooth(jnp.zeros_like(f), f, h, 3, "wjacobi",
                               "ghost0")
                return u, xla.residual_restrict(u, f, h, "ghost0")

            add(f"rr_zero_{n}_{dt}",
                lambda f=f, h=h, plan=plan: pk._rr_fused_zero(
                    f, h=h, nu=3, smoother="wjacobi", bc="ghost0",
                    interpret=False, halo=plan[0], bm=plan[1]),
                _z_ref)

    # two-axis packed + write-through packed variants (coverage
    # fallbacks: wide engages at n >= 32768, write-through only under
    # MGPOISSON_PACKED_WT) at forced testable geometries
    n = 2048
    h = 1.0 / n
    u, f = _mkdata((n, n), jnp.float32, seed=14)
    up, fp = pk.pack_grid(u), pk.pack_grid(f)
    V = _mkdata((n // 2, n // 2), jnp.float32, seed=15)[0]

    def _pk_rr_ref(u=u, f=f, h=h):
        us = xla.smooth(u, f, h, 1, "rbgs", "ghost0")
        return us, xla.residual_restrict(us, f, h, "ghost0")

    add("packed_rr_wide_2048_f32",
        lambda: (lambda o: (pk.unpack_grid(o[0]), o[1]))(
            pk._packed_rr_fused_wide(up, fp, h=h, nu=1,
                                     interpret=False, hr=8, bm=128,
                                     bcp=256)),
        _pk_rr_ref)
    add("packed_pc_wide_2048_f32",
        lambda: pk.unpack_grid(pk._packed_pc_fused_wide(
            up, fp, V, h=h, nu=1, kind="inject", interpret=False,
            hr=8, bm=128, bcp=256)),
        lambda: xla.smooth(xla.prolong_correct(u, V, "inject"), f, h,
                           1, "rbgs", "ghost0"))
    add("packed_rr_wt_2048_f32",
        lambda: (lambda o: (pk.unpack_grid(o[0]), o[1]))(
            pk._packed_rr_fused(up, fp, h=h, nu=1, interpret=False,
                                halo=8, bm=256, write_through=True)),
        _pk_rr_ref)
    add("packed_pc_wt_2048_f32",
        lambda: pk.unpack_grid(pk._packed_pc_fused(
            up, fp, V, h=h, nu=1, kind="inject", interpret=False,
            halo=8, bm=256, write_through=True)),
        lambda: xla.smooth(xla.prolong_correct(u, V, "inject"), f, h,
                           1, "rbgs", "ghost0"))

    # wide (two-axis-blocked) kernels with forced geometry — the
    # n >= 8192 code path exercised at a testable size
    n = 1024
    h = 1.0 / n
    for dtype in dtypes:
        dt = {"float32": "f32", "bfloat16": "bf16"}[jnp.dtype(dtype).name]
        u, f = _mkdata((n, n), dtype, seed=7)
        V = _mkdata((n // 2, n // 2), dtype, seed=8)[0]
        add(f"wide_smooth_{dt}",
            lambda u=u, f=f:
                pk._smooth_fused_wide(u, f, h=h, nu=3,
                                      smoother="wjacobi", bc="ghost0",
                                      interpret=False, hr=8, bm=256,
                                      bcw=256),
            lambda u=u, f=f: xla.smooth(u, f, h, 3, "wjacobi", "ghost0"))
        add(f"wide_rr_{dt}",
            lambda u=u, f=f:
                pk._rr_fused_wide(u, f, h=h, nu=3, smoother="wjacobi",
                                  bc="ghost0", interpret=False, hr=8,
                                  bm=256, bcw=256),
            lambda u=u, f=f:
                xla.smooth_residual_restrict(u, f, h, 3, "wjacobi",
                                             "ghost0"))
        add(f"wide_pc_{dt}",
            lambda u=u, f=f, V=V:
                pk._pc_fused_wide(u, f, V, h=h, nu=3, smoother="wjacobi",
                                  bc="face", kind="bilinear",
                                  interpret=False, hr=8, bm=256, bcw=256),
            lambda u=u, f=f, V=V:
                xla.prolong_correct_smooth(u, f, V, h, 3, "wjacobi",
                                           "face", "bilinear"))

    # 3D fused kernels (the _supported3 gate needs >= 32 MB grids)
    n3 = 256
    h3 = 1.0 / n3
    u3, f3 = _mkdata((n3, n3, n3), jnp.float32, seed=9)
    if pk._supported3(u3):
        add("smooth3d_f32",
            lambda: pk.smooth(u3, f3, h3, 3, "wjacobi", "ghost0"),
            lambda: xla.smooth(u3, f3, h3, 3, "wjacobi", "ghost0"))
        add("rr3d_f32",
            lambda: pk.smooth_residual_restrict(u3, f3, h3, 3, "wjacobi",
                                                "ghost0"),
            lambda: xla.smooth_residual_restrict(u3, f3, h3, 3,
                                                 "wjacobi", "ghost0"))
        V3 = _mkdata((n3 // 2,) * 3, jnp.float32, seed=10)[0]
        add("pc3d_f32",
            lambda: pk.prolong_correct_smooth(u3, f3, V3, h3, 3,
                                              "wjacobi", "ghost0",
                                              "inject"),
            lambda: xla.prolong_correct_smooth(u3, f3, V3, h3, 3,
                                               "wjacobi", "ghost0",
                                               "inject"))
        # 3D per-shard z-strip kernels, compiled, (1,1)-mesh layout
        plan3 = pk.sharded_plan3((n3, n3, n3), 3, "wjacobi", jnp.float32)
        if plan3 is not None:
            hz3, chz3 = plan3[0], plan3[3]
            zslab = jnp.zeros((hz3, n3, n3), jnp.float32)
            strips3 = (zslab, zslab)
            vslab = jnp.zeros((chz3, n3 // 2, n3 // 2), jnp.float32)
            vstrips3 = (vslab, vslab)
            fl3 = jnp.ones((4,), jnp.int32)
            # y-sharded variant: z-extended y-edge strips (zero fill =
            # the (1,1) layout where every edge is global)
            ystr = jnp.zeros((n3 + 2 * hz3, 8, n3), jnp.float32)
            strips3y = (zslab, zslab, ystr, ystr)
            vystr = jnp.zeros((n3 // 2 + 2 * chz3, 8, n3 // 2),
                              jnp.float32)
            vstrips3y = (vslab, vslab, vystr, vystr)
            add("shard_rr3d_ysplit_f32",
                lambda: pk.smooth_rr_sharded3(
                    u3, f3, strips3y, strips3y, fl3, h3, 3, "wjacobi",
                    "ghost0", plan=plan3),
                lambda: xla.smooth_residual_restrict(
                    u3, f3, h3, 3, "wjacobi", "ghost0"))
            add("shard_pc3d_ysplit_f32",
                lambda: pk.pc_smooth_sharded3(
                    u3, f3, V3, strips3y, strips3y, vstrips3y, fl3, h3,
                    3, "wjacobi", "ghost0", "bilinear", plan=plan3),
                lambda: xla.prolong_correct_smooth(
                    u3, f3, V3, h3, 3, "wjacobi", "ghost0", "bilinear"))
            add("shard_rr3d_f32",
                lambda: pk.smooth_rr_sharded3(
                    u3, f3, strips3, strips3, fl3, h3, 3, "wjacobi",
                    "ghost0", plan=plan3),
                lambda: xla.smooth_residual_restrict(
                    u3, f3, h3, 3, "wjacobi", "ghost0"))

            def _pc3s_ref():
                r_u = xla.prolong_correct_smooth(
                    u3, f3, V3, h3, 3, "wjacobi", "ghost0", "bilinear")
                r_r2 = jnp.sum(xla.residual(r_u, f3, h3, "ghost0") ** 2)
                return r_u, jnp.asarray([r_r2])

            add("shard_pc3d_f32",
                lambda: (lambda gu_gr: (gu_gr[0],
                                        jnp.asarray([jnp.sum(gu_gr[1])])))(
                    pk.pc_smooth_sharded3(
                        u3, f3, V3, strips3, strips3, vstrips3, fl3, h3,
                        3, "wjacobi", "ghost0", "bilinear", plan=plan3,
                        rnorm=True)),
                _pc3s_ref)

    worst = max(cases, key=cases.get) if cases else None
    # split the gate by dtype: f32 cases must match the XLA ops to
    # ~1e-5 (same precision, different op order); bf16 cases compound
    # per-sweep rounding differences over nu applications, so a few
    # percent is their expected same-precision reorder noise
    f32 = {k: v for k, v in cases.items() if "bf16" not in k}
    bf16 = {k: v for k, v in cases.items() if "bf16" in k}
    return {"max_err": max(cases.values()) if cases else None,
            "max_err_f32": max(f32.values()) if f32 else None,
            "worst_f32": max(f32, key=f32.get) if f32 else None,
            "max_err_bf16": max(bf16.values()) if bf16 else None,
            "worst": worst, "n_cases": len(cases), "cases": cases,
            "failures": failures, "n_failures": len(failures)}


if __name__ == "__main__":
    import json
    import os
    import sys

    # standalone runs reuse bench.py's persistent compile cache (the
    # remote Mosaic relay makes cold compiles ~30-60 s each)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    full = "--full" in sys.argv
    out = run_parity(full=full)
    top = dict(sorted(out["cases"].items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({"max_err": out["max_err"],
                      "max_err_f32": out["max_err_f32"],
                      "worst_f32": out["worst_f32"],
                      "max_err_bf16": out["max_err_bf16"],
                      "worst": out["worst"],
                      "n_cases": out["n_cases"], "top10": top,
                      "failures": out["failures"]}, indent=2))
    sys.exit(1 if out["failures"] else 0)

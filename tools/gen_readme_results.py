#!/usr/bin/env python
"""Regenerate the README results table from the newest BENCH_r*.json.

The driver records each round's bench.py output in BENCH_r{N}.json; the
README's results block is generated from that artifact (between the
BENCH:BEGIN / BENCH:END markers) so documented numbers can never drift
from the measured ones.

Usage: python tools/gen_readme_results.py [path/to/BENCH_rNN.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def newest_artifact() -> str:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json artifact found")
    return paths[-1]


def merge_extras(bench: dict) -> dict:
    """bench.py r5+ prints a compact tracked line and writes the full
    measurement set to BENCH_extras.json alongside; merge the two so
    the table can use everything (the extras file is written by the
    SAME run — elapsed/size fields cross-check)."""
    out = bench.get("parsed", bench)
    xp = os.path.join(REPO, "BENCH_extras.json")
    if os.path.exists(xp) and isinstance(out, dict):
        with open(xp) as fh:
            extras = json.load(fh)
        ex = dict(extras)
        ex.update(out.get("extra", {}))
        out = dict(out)
        out["extra"] = ex
    return out


def fmt_ms(v) -> str:
    return "—" if v is None else f"{v:.2f} ms"


def render(bench: dict, src_name: str) -> str:
    # the driver artifact wraps the bench JSON under "parsed"
    out = bench.get("parsed", bench)
    ex = out["extra"]
    gbps = out["value"]
    target = ex["roofline_target_gbps"]
    pct_peak = 100.0 * gbps / (target / 0.8)
    cfg5 = ex.get("config5_16384") or {}
    rows = [
        ("V-cycles to 1e-10 relative residual",
         f"**{ex['vcycles_to_1e-10_relres']}** (damped-Jacobi default) / "
         f"{ex['vcycles_to_1e-10_rbgs']} (rbgs) / "
         f"**{ex['fmg_vcycles_to_1e-10']}** after an FMG init pass "
         f"(`cycle=\"fmg\"`)",
         "< 10"),
        ("Wall time to 1e-10 relative residual",
         f"{ex['solve_wall_s']:.3f} s ({ex['fmg_solve_wall_s']:.3f} s "
         "with FMG)", "—"),
        ("V-cycle wall time (tuned scheme)",
         f"**{ex['vcycle_time_ms']:.2f} ms** (3D {ex['size3d']}³: "
         f"{ex['vcycle3d_time_ms']:.1f} ms"
         + (f", 512³: {ex['vcycle3d_512_time_ms']:.1f} ms"
            if ex.get("vcycle3d_512_time_ms") is not None else "")
         + ", fused half-level kernels)",
         "—"),
        ("Smoother HBM round trip (physical, single sweep)",
         f"**{gbps:.0f} GB/s = {pct_peak:.0f} % of peak** "
         "(stripe-overlap halos reused from VMEM)",
         f"≥ {target:.0f} GB/s (80 % roofline)"),
        (f"Smoother at production ν={ex['nu']}"
         + (" (VPU-bound)" if ex["smoother_nu_phys_gbps"] < target else ""),
         f"{ex['smoother_nu_phys_gbps']:.0f} GB/s physical / "
         f"{ex['smoother_nu_effective_gbps']:.0f} GB/s per-sweep effective",
         "—"),
        ("Fused half-levels (smooth+residual+restrict / "
         "prolong+correct+smooth)",
         f"{ex['rr_fused_time_ms']:.2f} + {ex['pc_fused_time_ms']:.2f} ms "
         "(one HBM round trip each)", "—"),
    ]
    if ex.get("residual_stop_overhead_pct") is not None:
        rows.append((
            "stop=\"residual\" metric overhead per cycle",
            f"{ex['residual_stop_overhead_pct']:.1f} % "
            "(‖r‖² fused into the up-leg kernel's drain)",
            "one stencil pass — see docs/KERNELS.md"))
    if ex.get("adaptive_stop_overhead_pct") is not None:
        rows.append((
            "… with `stop_check=\"adaptive\"` (amortized)",
            f"**{ex['adaptive_stop_overhead_pct']:.1f} %** — exact ‖r‖ "
            f"on {ex.get('adaptive_metric_evals', '—')} of "
            f"{ex.get('adaptive_cycles', '—')} cycles (a learned "
            "contraction model skips the metric far from tol; stopping "
            "uses measured values only)", "< 3 %"))
    if ex.get("bf16_smoother_phys_gbps") is not None:
        rows.append((
            "bfloat16 smoother sweep",
            f"{ex['bf16_smoother_phys_gbps']:.0f} GB/s physical = "
            f"{ex['bf16_speedup_vs_f32']:.2f}× the f32 sweep "
            "(half the bytes per cell; ±10 % run-to-run — r3 measured "
            "838, r4 745 GB/s)", "—"))
    if ex.get("bf16_solve_floor_relres") is not None:
        floor = ex["bf16_solve_floor_relres"]
        floor_txt = (f"relative residual ≈ {floor:.0e}"
                     if _finite(floor) else
                     "diverges (non-finite iterate)")
        rows.append((
            "bfloat16 end-to-end solve floor",
            f"{floor_txt} after {ex.get('bf16_solve_cycles', '—')} "
            "cycles — pure-bf16 residuals are all cancellation; this "
            "is why `sweep_dtype` exists (precision notes)", "—"))
    if ex.get("mixed_bf16_cycles_to_tol") is not None:
        rows.append((
            "mixed precision (bf16 sweeps + f32 refinement)",
            f"f32-target convergence in "
            f"{ex['mixed_bf16_cycles_to_tol']} cycles at "
            f"{ex.get('mixed_bf16_step_time_ms', float('nan')):.2f} "
            "ms/step (final relres "
            f"{ex.get('mixed_bf16_final_relres', float('nan')):.0e}"
            "; Spec.sweep_dtype)", "—"))
    if ex.get("fast_scheme_cycles_to_1e-10") is not None:
        packed_note = ""
        if ex.get("fast_packed_vcycle_ms") is not None:
            packed_note = (
                f" — packed-persistent fine level: "
                f"{ex['fast_packed_vcycle_ms']:.2f} ms/cycle "
                f"({ex.get('fast_packed_vcycle_rnorm_ms', float('nan')):.2f}"
                " with fused ‖r‖)")
        rows.append((
            "scheme=\"fast\" (rbgs 1+1) solve to 1e-10",
            f"{ex['fast_scheme_cycles_to_1e-10']} cycles, "
            f"**{ex.get('fast_scheme_solve_compute_ms', float('nan')):.1f}"
            " ms** total compute (priced at the executed cycle)"
            + packed_note, "—"))
    if ex.get("spmd_vs_unsharded_vcycle") is not None:
        rows.append((
            "shard_map step on a (1,1) mesh vs unsharded V-cycle",
            f"{ex['spmd_vs_unsharded_vcycle']:.2f}× "
            "(per-shard fused Pallas strip kernels)", "≤ ~1.1×"))
    if ex.get("batched4_1024_cycle_ms") is not None:
        rows.append((
            "batched serving (4 RHS per program, 1024²)",
            f"{ex['batched4_1024_cycle_ms']:.2f} ms per batched cycle = "
            f"{ex['batched4_1024_cycle_ms'] / 4:.2f} ms/element "
            "(`solve_batched`, until-converged loop on device)", "—"))
    if ex.get("kernel_parity_max_err") is not None:
        rows.append((
            "Compiled-kernel parity vs XLA ops (on device)",
            f"max |diff| {ex['kernel_parity_max_err']:.1e} over "
            f"{ex.get('kernel_parity_n_cases', '—')} f32+bf16 cases "
            f"(bf16 reorder noise "
            f"{ex.get('kernel_parity_max_err_bf16', 0):.0e})",
            "f32 ≤ 1e-5"))
    if cfg5.get("vcycle_time_ms") is not None:
        rows.append((
            "16384² (config-5 grid) on ONE chip",
            f"{cfg5['cycles']} V-cycles, "
            f"{cfg5['vcycle_time_ms']:.1f} ms/cycle, "
            f"**{cfg5['solve_wall_s']:.2f} s** warm solve "
            "(two-axis-blocked kernels)", "—"))
    if cfg5.get("fast_cycles") is not None:
        pk5 = ""
        if cfg5.get("fast_packed_vcycle_ms") is not None:
            pk5 = (f" at {cfg5['fast_packed_vcycle_ms']:.1f} ms/packed "
                   "cycle")
        rows.append((
            "16384² with scheme=\"fast\"",
            f"{cfg5['fast_cycles']} cycle(s){pk5} = "
            f"**{cfg5.get('fast_solve_compute_ms', float('nan')):.0f} "
            "ms** total compute", "—"))
    lines = [
        f"## Results (TPU v5e, 1 chip, {ex['size']}² f32)",
        "",
        "| Metric | Value | Target (BASELINE.md) |",
        "|---|---|---|",
    ]
    for name, val, tgt in rows:
        lines.append(f"| {name} | {val} | {tgt} |")
    lines += ["", f"<sub>Generated from `{src_name}` by "
                  "`tools/gen_readme_results.py`.</sub>"]
    return "\n".join(lines)


def _finite(x):
    try:
        import math
        return math.isfinite(float(x))
    except (TypeError, ValueError):
        return False


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else newest_artifact()
    with open(path) as fh:
        bench = json.load(fh)
    bench = merge_extras(bench)
    block = render(bench, os.path.basename(path))
    readme = os.path.join(REPO, "README.md")
    with open(readme) as fh:
        text = fh.read()
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END),
                         re.DOTALL)
    if not pattern.search(text):
        raise SystemExit(f"README.md is missing the {BEGIN}/{END} markers")
    text = pattern.sub(f"{BEGIN}\n{block}\n{END}", text)
    with open(readme, "w") as fh:
        fh.write(text)
    print(f"README results regenerated from {os.path.basename(path)}")


if __name__ == "__main__":
    main()

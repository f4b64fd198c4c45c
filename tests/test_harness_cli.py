"""Smoke tests for the benchmark / roofline / profile harness CLIs
(the reference's test/test.lua role; its committed version was
bitrotted — SURVEY.md section 4.4 — so ours runs in CI)."""

import os

import pytest


def test_wall_time_harness(tmp_path):
    from mgpoisson.bench.harness import run_harness
    out = run_harness(sizes=[16, 32], variants=["oracle", "xla"], tries=1,
                      cycles=2, out_dir=str(tmp_path))
    assert (tmp_path / "times.tsv").exists()
    rows = out["rows"]
    assert {v for _, v, _ in rows} == {"oracle", "xla"}
    assert all(t > 0 or v != "oracle" for _, v, t in rows)
    # oracle timings are host-measured and strictly positive
    assert all(t > 0 for _, v, t in rows if v == "oracle")


def test_roofline_report_runs():
    from mgpoisson.bench import roofline
    rows = roofline.report(size=256, dtype="float64", nu=1)
    assert any("V-cycle" in r["op"] for r in rows)
    assert all(r["seconds"] != 0 for r in rows)


def test_profile_trace(tmp_path):
    import jax.numpy as jnp
    from mgpoisson import MultigridPoisson, Spec
    from mgpoisson.bench.profile import trace

    mg = MultigridPoisson(Spec(size=16, dtype="float64", backend="xla",
                               maxiter=2))
    with trace(str(tmp_path)):
        res = mg.solve()
    # a plugins/profile/<ts>/ directory with a trace file appears
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, f"no trace artifacts under {tmp_path}"


def test_bench_json_smoke(tmp_path):
    """bench.py (the driver artifact) runs end-to-end and emits ONE
    compact JSON line (the driver parses the tail of stdout, so the
    line must fit its ~2000-char capture) plus a full extras file, at
    toy sizes on CPU."""
    import json
    import os
    import subprocess
    import sys

    extras = tmp_path / "extras.json"
    env = dict(os.environ, MGPOISSON_BENCH_SIZE="64",
               MGPOISSON_BENCH_SIZE3="16", JAX_PLATFORMS="cpu",
               MGPOISSON_BENCH_EXTRAS=str(extras))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=root, timeout=1800)
    assert out.returncode == 0, out.stderr[-2000:]
    # stdout is exactly one JSON line, short enough for the driver's
    # tail capture; progress goes to stderr
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    assert len(lines[0]) <= 1800, len(lines[0])
    d = json.loads(lines[0])
    # at toy sizes the delta-timed value can be noise-negative; the
    # contract is the fields, not the sign
    assert d["unit"] == "GB/s" and isinstance(d["value"], (int, float))
    extra = d["extra"]
    for key in ("vcycle_time_ms", "vcycles_to_1e-10_relres",
                "vcycles_to_1e-10_rbgs", "solve_wall_s",
                "sections_done"):
        assert key in extra, key
    assert extra["vcycles_to_1e-10_relres"] > 0
    # the full measurement set lands in the extras file
    full = json.loads(extras.read_text())
    for key in ("smoother_nu_phys_gbps", "rr_fused_time_ms",
                "vcycle_rnorm_time_ms", "fmg_vcycles_to_1e-10"):
        assert key in full, key


def test_bench_deadline_partial(tmp_path):
    """A too-small deadline still yields a parseable one-line artifact
    that says which sections were skipped (the rc=124 hardening)."""
    import json
    import os
    import subprocess
    import sys

    extras = tmp_path / "extras.json"
    env = dict(os.environ, MGPOISSON_BENCH_SIZE="64",
               MGPOISSON_BENCH_SIZE3="16", JAX_PLATFORMS="cpu",
               MGPOISSON_BENCH_EXTRAS=str(extras),
               MGPOISSON_BENCH_DEADLINE="40")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=root, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert "extra" in d
    # with a 40s budget at least one section must have been skipped
    # or the watchdog fired (note says so); either way it parsed
    skipped = d["extra"].get("sections_skipped", [])
    assert skipped or "note" in d

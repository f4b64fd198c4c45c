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

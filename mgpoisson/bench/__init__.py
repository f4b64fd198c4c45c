"""Benchmark + convergence harnesses — the reference's L4 layer
(`test/test.lua`, `test/converge-multigrid-vs-krylov.lua`), rebuilt:

- mgpoisson.bench.harness   — wall-time per variant per size, best-of-N,
  TSV + optional plot (python -m mgpoisson.bench.harness)
- mgpoisson.bench.converge  — multigrid-vs-Krylov convergence study,
  per-size TSV + plots (python -m mgpoisson.bench.converge)
"""

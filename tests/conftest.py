"""Test configuration.

Multi-device without a cluster (SURVEY.md section 4): tests run on CPU
with 8 virtual XLA devices so sharding / halo-exchange logic runs in CI
with no TPU, and with x64 enabled so the JAX paths can be diffed against
the float64 NumPy oracle at tight tolerances.

Must run before any jax import, hence module-level env mutation here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon site hook pins JAX_PLATFORMS=axon before conftest runs; the
# config update below takes precedence as long as no backend has been
# initialized yet
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# `pytest -m quick`: the fast core subset (oracle/XLA-path numerics,
# solver semantics, config validation) for tight iteration.  The
# interpret-mode Pallas differentials, multi-process tests, and
# subprocess harness smokes dominate the full suite's wall time and
# stay opt-in via a plain `pytest tests/`.
# Chosen from the full run's measured per-file durations (r5:
# mixed_precision 343 s, transforms/utils ~30-50 s — excluded; the
# set below totals ~3 min)
QUICK_FILES = {
    "test_oracle.py", "test_kernels.py", "test_cycle.py",
    "test_solver.py", "test_krylov.py", "test_native.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in QUICK_FILES:
            item.add_marker(pytest.mark.quick)

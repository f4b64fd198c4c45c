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

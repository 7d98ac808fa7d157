"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's fake-backend strategy (SURVEY.md §4: distributed logic
tested on CPU with env simulation) — multi-chip sharding is validated on a
virtual 8-device CPU mesh because real multi-chip hardware is not available in
the test environment.
"""
import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

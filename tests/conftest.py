"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's fake-backend strategy (SURVEY.md §4: distributed
logic tested on CPU with env simulation) — multi-chip sharding is validated
on a virtual 8-device CPU mesh; tests never touch real TPU hardware.

The ambient environment may have registered a TPU PJRT plugin at interpreter
boot (sitecustomize) with JAX_PLATFORMS=axon baked in; jax is then already
imported, so we override the live jax config instead of the environment.
XLA_FLAGS still takes effect as long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite compiles dozens of tiny programs;
# warm reruns skip nearly all of that.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu", jax.devices()

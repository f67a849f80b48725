"""Test config: force a virtual 8-device CPU mesh.

The image's sitecustomize registers the remote `axon` TPU backend and forces
jax_platforms="axon,cpu" — tests must NOT run against the tunneled TPU chip
(slow remote round-trips, single chip).  XLA_FLAGS must be set before the CPU
backend initialises; the platform selection must be re-forced *after* jax
import because the axon plugin overrides the env var.

This is the standard way to exercise multi-chip sharding logic without TPU
hardware (SURVEY.md §4): sharding tests see 8 fake CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
# Persistent compilation cache keeps repeat suite runs fast on this 1-core
# box.  MUST be jax.config.update, not env vars: sitecustomize imports jax
# at interpreter startup, so JAX_* env vars set here are read too late and
# silently ignored (round-4 finding).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/gem_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

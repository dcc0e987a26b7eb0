"""Test configuration: force all test compute onto the host CPU (8 virtual
devices) in float64, so numerical oracles are tight and multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md section 4 test strategy).

Note: this machine preloads jax via sitecustomize (axon TPU tunnel), so env
vars set here are too late for jax's config — but XLA backends initialize
lazily, so setting XLA_FLAGS + the programmatic default-device config before
any backend is touched still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent XLA compilation cache: most of the suite's wall time is
# repeated CPU jit compiles of near-identical solver programs; caching
# them across tests AND across runs measured a 3.6x on a representative
# compile (4.0 s -> 1.1 s second-process load).  The CPU AOT loader
# prints benign machine-feature warnings (prefer-no-scatter/gather
# pseudo-features) on load — same-host loads are safe.
os.makedirs("/tmp/jax_test_compile_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]

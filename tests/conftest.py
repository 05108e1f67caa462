import os

# Tests run on a virtual 8-device CPU mesh with native f64 so parity oracles
# are exact; the real-TPU path is exercised by bench.py / __graft_entry__.py.
# NOTE: this environment's sitecustomize force-registers the axon TPU plugin
# and overrides the JAX_PLATFORMS env var, so the platform must be forced via
# jax.config *after* import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent XLA:CPU compile cache: the suite is compile-dominated on this
# 1-core host (interpret-mode Pallas = big XLA graphs), and repeat runs hit
# the same shapes — caching cuts the wall clock by multiples. Safe across
# xdist workers (the cache is a content-addressed directory).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ZELLL_TEST_CACHE", "/root/.jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Test environment: force an 8-virtual-device CPU platform before JAX loads,
so sharding/halo tests run without TPU hardware (SURVEY.md §4 implication e).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment pre-sets JAX_PLATFORMS (e.g. to a TPU plugin) in a
# way that survives os.environ edits, so force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the dense engine's scan graphs are slow to
# compile on the single-core CPU; cache across test runs.  Overridable so
# CONCURRENT pytest processes don't share one cache dir — a reader racing a
# writer on the same entry has produced a torn-read segfault in the cache
# deserializer (observed 2026-08-18; two suites, one box).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("WCSPH_TEST_CACHE", "/tmp/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

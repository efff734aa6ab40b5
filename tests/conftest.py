"""Test environment: force an 8-virtual-device CPU platform before JAX loads,
so sharding/halo tests run without TPU hardware (SURVEY.md §4 implication e).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The observed full-suite segfault lived in the zstandard C extension while
# (de)serializing the heaviest engine-step executable late in a long
# single-process run (scripts/run_suite.sh header).  jax's compilation cache
# falls back to pure-Python zlib when zstandard is unavailable, and zlib
# raises on torn data instead of crashing — so block zstandard BEFORE jax
# imports and keep the zlib-compressed entries in their own cache dir
# (entries are compression-format-incompatible with the zstd dir bench.py
# uses on the TPU box).
sys.modules["zstandard"] = None

import jax  # noqa: E402

# The hosting environment pre-sets JAX_PLATFORMS (e.g. to a TPU plugin) in a
# way that survives os.environ edits, so force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the dense engine's scan graphs are slow to
# compile on the single-core CPU; cache across test runs.  Overridable so
# CONCURRENT pytest processes can be given distinct dirs if a shared-dir
# race ever resurfaces (pre-zlib history: a reader racing a writer on the
# same entry produced a torn-read segfault in the zstandard deserializer,
# observed 2026-08-18).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("WCSPH_TEST_CACHE",
                                 "/tmp/jax_comp_cache_zlib"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

"""Tracing / profiling hooks (absent in the reference — SURVEY.md §5).

- ``trace(...)``: context manager around jax.profiler for TensorBoard-
  compatible device traces of the jitted step.
- ``benchmark_step(sim, ...)``: wall-clock step statistics with a hard device
  sync per sample (the experimental TPU platform's block_until_ready can
  return early; pulling one element to host is the reliable fence).
- Per-step physics telemetry (solver iterations, density error, overflow)
  lives on-device in state.diag — see Simulation.telemetry().
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wcsph_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(x) -> None:
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def benchmark_step(sim, steps: int = 20, warmup: int = 3) -> Dict[str, float]:
    """Time individual jitted steps; returns mean/min/p50 in milliseconds."""
    for _ in range(warmup):
        sim.step()
    _sync(sim.state.pos)
    samples = []
    for _ in range(steps):
        t0 = time.perf_counter()
        sim.step()
        _sync(sim.state.pos)
        samples.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(samples)
    return {
        "mean_ms": float(arr.mean()),
        "min_ms": float(arr.min()),
        "p50_ms": float(np.median(arr)),
        "particle_steps_per_sec": sim.state.n_liquid / (arr.mean() / 1e3),
    }

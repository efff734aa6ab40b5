"""Multi-chip scaling via jax.sharding (SPMD data decomposition).

The reference is strictly single-device (SURVEY.md §2 parallelism table); its
only "communication" is host<->device transfers.  Here the particle arrays are
sharded over a 1-D device mesh on the particle axis and the step function is
jitted with sharding annotations: XLA inserts the collectives (all-gathers for
the neighbor-table build and gather sources, psums for the solver-loop error
reductions) over ICI.

**Measured verdict (scripts/gspmd_hlo.py, 8-way CPU mesh, 43k particles):**
XLA partitions this step by all-gathering the particle axis early (3
all-gathers, 1 all-reduce, 3 collective-permutes per step) and then runs the
ENTIRE packed-grid pipeline replicated — the compiled per-device module
contains 7,975 ops at the full (C, NC) packed size and ZERO at the 1/8
sharded size.  The sort/scatter grid build gives GSPMD no parallelizable
axis to propagate through, so this path is CORRECTNESS-ONLY: it produces
exact results on a mesh but no compute speedup.  Use it for API symmetry
and as a differential oracle.  The blessed scaling path is the explicit
x-slab domain decomposition with ppermute halo exchange in
parallel/halo.py, whose per-device work is 1/ndev of the sweep cost by
construction (exact-match tested vs single device in tests/test_parallel.py
and exercised for all four solvers by __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..state import FluidState

AXIS = "particles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"requested {n} devices, found {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def state_sharding(mesh: Mesh, state: FluidState):
    """Per-particle arrays sharded on the particle axis (the LAST dim in the
    planar layout — vectors are (3, n)); scalars replicated."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[-1] > 8:
            parts = (None,) * (leaf.ndim - 1) + (AXIS,)
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def shard_state(state: FluidState, mesh: Mesh) -> FluidState:
    shardings = state_sharding(mesh, state)
    return jax.tree.map(jax.device_put, state, shardings)


def make_sharded_step(step_fn, cfg: SimConfig, mesh: Mesh, example: FluidState):
    """Jit a solver step with explicit in/out shardings over the mesh."""
    sh = state_sharding(mesh, example)
    return jax.jit(
        partial(step_fn, cfg=cfg),
        in_shardings=(sh,),
        out_shardings=sh,
    )

"""Multi-chip scaling via jax.sharding (SPMD data decomposition).

The reference is strictly single-device (SURVEY.md §2 parallelism table); its
only "communication" is host<->device transfers.  Here the particle arrays are
sharded over a 1-D device mesh on the particle axis and the step function is
jitted with sharding annotations: XLA inserts the collectives (all-gathers for
the neighbor-table build and gather sources, psums for the solver-loop error
reductions) over ICI.

This v1 scheme is data-parallel-over-particles with compiler-inserted
collectives; the per-pair sweeps — the dominant cost — shard perfectly.  An
explicit slab-decomposition with ppermute halo exchange is the planned
optimization once the Pallas sweep kernels land.
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

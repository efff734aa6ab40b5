"""wcsph_tpu: TPU-native weakly-compressible SPH framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of lyd405121/wcsph (a Taichi GPU SPH
simulator) designed for TPU: sort-based neighbor search instead of atomic
hash-grid appends, lax.while_loop pressure solvers instead of host-driven
convergence loops, fixed static shapes with masking, and jax.sharding domain
decomposition for multi-chip scaling.
"""

from .config import SimConfig
from .scene import Scene, SceneBuilder, dam_break, pad_to_multiple
from .state import FluidState, StepDiagnostics, init_state

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "Scene",
    "SceneBuilder",
    "dam_break",
    "pad_to_multiple",
    "FluidState",
    "StepDiagnostics",
    "init_state",
    "Simulation",
    "default_config",
]


def __getattr__(name):
    # lazy: simulation pulls in all solvers
    if name in ("Simulation", "default_config"):
        from . import simulation

        return getattr(simulation, name)
    raise AttributeError(name)

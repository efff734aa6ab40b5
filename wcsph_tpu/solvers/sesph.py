"""SESPH: state-equation (Tait EOS) SPH solver.

Re-design of reference sesph.py:130-236 as one pure, jittable step function:
  density summation -> Tait EOS pressure -> symmetric pressure force +
  explicit viscosity -> semi-implicit Euler.
No inner convergence loops; fixed dt (sesph.py:135 uses dt = 0.001).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import ops
from ..config import SimConfig
from ..neighbors import build_neighbors
from ..state import FluidState, StepDiagnostics


def default_config(**overrides) -> SimConfig:
    """Reference sesph defaults (sesph.py:24-62): VS0 = 2*VL0, nu = 0.1."""
    base = dict(
        solid_volume_scale=2.0,
        explicit_viscosity=0.1,
        explicit_viscosity_b=0.0,
        adaptive_dt=False,
        dt_init=1e-3,
    )
    base.update(overrides)
    return SimConfig(**base)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    nbr = build_neighbors(state.pos, nl, cfg)
    pairs = ops.precompute_pairs(state.pos, nbr, nl, cfg)

    rho = ops.density(pairs, cfg)                       # sesph.py:138-154
    rho, pressure = ops.tait_pressure(rho, cfg)         # sesph.py:158-166

    gravity = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1)
    d_vel = (gravity
             + ops.explicit_viscosity_accel(pairs, state.vel, rho, cfg, nl)
             + ops.pressure_accel_symmetric(pairs, rho, pressure, cfg, nl))

    dt = state.dt
    vel = state.vel + d_vel * dt                        # sesph.py:191-196
    pos = state.pos.at[:, :nl].add(vel * dt)

    diag = StepDiagnostics(
        density_error=jnp.mean(rho) / cfg.rest_density - 1.0,
        neighbor_overflow=nbr.overflow,
        vel_max=jnp.sqrt(jnp.max(ops.dot3(vel, vel))),
    )
    return state.replace(
        pos=pos, vel=vel, pressure=pressure,
        time=state.time + dt, diag=diag,
    )

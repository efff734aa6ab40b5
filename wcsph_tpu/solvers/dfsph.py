"""DFSPH: divergence-free SPH (flagship solver).

Re-design of reference dfsph.py as one pure, jittable step:

  neighbor rebuild -> density -> DFSPH factor alpha -> divergence solver
  (warm-started) -> non-pressure forces (surface tension + implicit-viscosity
  PCG + micropolar vorticity) -> adaptive CFL dt -> velocity update ->
  constant-density solver (warm-started) -> position update
  (frame sequence dfsph.py:600-617)

The reference's host-driven convergence loops with per-iteration
``.to_numpy()`` reads (dfsph.py:131-164) become ``lax.while_loop``s with
on-device jnp.sum error reductions; warm-start fields (kappa, kappa_v,
vel_guess) live in the state pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import ops, viscosity
from ..config import SimConfig
from ..neighbors import build_neighbors
from ..state import FluidState, StepDiagnostics


def default_config(**overrides) -> SimConfig:
    """Reference dfsph defaults (dfsph.py:27-41, ParticleData.py:18-88)."""
    base = dict(
        solid_volume_scale=1.0,
        viscosity=10.0,
        viscosity_b=10.0,
        adaptive_dt=True,
        dt_init=1e-3,
        dt_min=1e-4,
        dt_max=5e-3,
    )
    base.update(overrides)
    return SimConfig(**base)


class _SolveResult(NamedTuple):
    vel: jnp.ndarray
    kappa: jnp.ndarray
    iters: jnp.ndarray
    err: jnp.ndarray


def divergence_solve(pairs: ops.Pairs, vel: jnp.ndarray, kappa_v: jnp.ndarray,
                     alpha: jnp.ndarray, dt: jnp.ndarray, cfg: SimConfig,
                     n_liquid: int) -> _SolveResult:
    """Divergence-free velocity solver (dfsph.py:131-146, 415-485)."""
    rho0 = cfg.rest_density

    if cfg.divergence_warm_start:
        # warmstart_divergence_vel (dfsph.py:415-439)
        k_ws = 0.5 * jnp.maximum(kappa_v / dt, -0.5 * rho0 * rho0)
        drho_ws = ops.drho_divergence(pairs, vel, cfg, n_liquid)
        vel_ws = ops.kappa_velocity_update(pairs, vel, k_ws, k_ws, dt, cfg, n_liquid)
        vel = jnp.where(drho_ws[None, :] > 0.0, vel_ws, vel)

    # begin_divergence_iter (dfsph.py:441-447)
    alpha_dt = alpha / dt
    drho = ops.drho_divergence(pairs, vel, cfg, n_liquid)
    kappa_v = jnp.zeros_like(kappa_v)
    threshold = cfg.dfsph_div_tol * float(n_liquid) / dt

    def body(carry):
        vel, kappa_v, drho, err, it = carry
        k = drho * alpha_dt
        kappa_v = kappa_v + k
        vel = ops.kappa_velocity_update(pairs, vel, k, k, dt, cfg, n_liquid)
        drho = ops.drho_divergence(pairs, vel, cfg, n_liquid)
        err = jnp.sum(drho)
        return vel, kappa_v, drho, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return (it == 0) | ((err > threshold) & (it < cfg.dfsph_div_max_iters))

    vel, kappa_v, drho, err, iters = jax.lax.while_loop(
        cond, body, (vel, kappa_v, drho, jnp.float32(0.0), jnp.int32(0)))
    # end_divergence_iter (dfsph.py:479-485): kappa_v stored scaled by dt
    return _SolveResult(vel=vel, kappa=kappa_v * dt, iters=iters, err=err)


def pressure_solve(pairs: ops.Pairs, vel: jnp.ndarray, kappa: jnp.ndarray,
                   alpha: jnp.ndarray, rho: jnp.ndarray, dt: jnp.ndarray,
                   cfg: SimConfig, n_liquid: int) -> _SolveResult:
    """Constant-density solver (dfsph.py:150-164, 487-552)."""
    rho0 = cfg.rest_density

    if cfg.pressure_warm_start:
        # Intended SPlisHSPlasH warm start.  The reference's version is inert:
        # it gates on adv_rho > rho_L0 with adv_rho already normalized to ~1
        # (dfsph.py:491) and zeroes kappa before use (dfsph.py:515).
        k_ws = jnp.maximum(kappa / (dt * dt), -0.5 * rho0 * rho0)
        adv_ws = ops.advected_density(pairs, vel, rho, dt, cfg, n_liquid)
        vel_ws = ops.kappa_velocity_update(pairs, vel, k_ws, k_ws, dt, cfg, n_liquid)
        vel = jnp.where(adv_ws[None, :] > 1.0, vel_ws, vel)

    # begin_pressure_iter (dfsph.py:510-516)
    alpha_dt2 = alpha / (dt * dt)
    adv = ops.advected_density(pairs, vel, rho, dt, cfg, n_liquid)
    kappa = jnp.zeros_like(kappa)

    def body(carry):
        vel, kappa, adv, err, it = carry
        k = (adv - 1.0) * alpha_dt2
        kappa = kappa + k
        vel = ops.kappa_velocity_update(pairs, vel, k, k, dt, cfg, n_liquid)
        adv = ops.advected_density(pairs, vel, rho, dt, cfg, n_liquid)
        err = jnp.sum(adv - 1.0) / float(n_liquid)
        return vel, kappa, adv, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.dfsph_tol) | (it < cfg.dfsph_min_iters)) \
            & (it < cfg.dfsph_max_iters)

    vel, kappa, adv, err, iters = jax.lax.while_loop(
        cond, body, (vel, kappa, adv, jnp.float32(0.0), jnp.int32(0)))
    # end_pressure_iter (dfsph.py:549-552): kappa stored scaled by dt^2
    return _SolveResult(vel=vel, kappa=kappa * dt * dt, iters=iters, err=err)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt
    nbr = build_neighbors(state.pos, nl, cfg)
    pairs = ops.precompute_pairs(state.pos, nbr, nl, cfg)

    rho = ops.density(pairs, cfg)                       # dfsph.py:248-262
    alpha = ops.dfsph_alpha(pairs, cfg)                 # dfsph.py:346-372

    div = divergence_solve(pairs, state.vel, state.kappa_v, alpha, dt, cfg, nl)
    vel = div.vel

    # --- non-pressure forces (dfsph.py:84-103) ---
    d_vel = jnp.broadcast_to(
        jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1), vel.shape)
    if cfg.tension_coff != 0.0 or cfg.tension_coff_b != 0.0:
        normal = ops.surface_normals(pairs, rho, cfg, nl)
        d_vel = d_vel + ops.tension_accel(pairs, rho, normal, state.pos, cfg, nl)
    visc = viscosity.solve(pairs, vel, state.vel_guess, rho, dt, cfg, nl)
    d_vel = d_vel + (visc.vel_new - vel) / dt           # end_viscosity
    omega = state.omega
    if cfg.enable_vorticity:
        dv_vort, omega = ops.vorticity_accel(pairs, vel, omega, rho, dt, cfg, nl)
        d_vel = d_vel + dv_vort

    # --- adaptive dt (dfsph.py:107-129): CFL from old dt, iteration feedback
    # from this frame's viscosity iters and LAST frame's pressure iters ---
    vmax_sq = ops.cfl_vel_max(vel, d_vel, dt)
    if cfg.adaptive_dt:
        feedback = jnp.maximum(visc.iters, state.last_pressure_iters)
        new_dt = ops.cfl_dt(dt, vmax_sq, feedback, cfg)
    else:
        new_dt = dt

    vel = vel + d_vel * new_dt                          # update_vel

    pr = pressure_solve(pairs, vel, state.kappa, alpha, rho, new_dt, cfg, nl)
    vel = pr.vel

    pos = state.pos.at[:, :nl].add(vel * new_dt)           # update_pos

    diag = StepDiagnostics(
        divergence_iters=div.iters,
        pressure_iters=pr.iters,
        viscosity_iters=visc.iters,
        density_error=pr.err,
        neighbor_overflow=nbr.overflow,
        vel_max=jnp.sqrt(vmax_sq),
    )
    return state.replace(
        pos=pos,
        vel=vel,
        omega=omega,
        vel_guess=visc.delta_v,
        kappa=pr.kappa,
        kappa_v=div.kappa,
        dt=new_dt,
        time=state.time + new_dt,
        last_visc_iters=visc.iters,
        last_pressure_iters=pr.iters,
        diag=diag,
    )

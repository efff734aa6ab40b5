"""DFSPH: divergence-free SPH (flagship solver).

Re-design of reference dfsph.py as one pure, jittable step on the cell-dense
packed layout (grid.py / dense_ops.py — no gathers in the hot path):

  sort+pack -> density + DFSPH factor alpha (fused window pass) ->
  divergence solver (warm-started) -> non-pressure forces (surface tension +
  implicit-viscosity PCG + micropolar vorticity) -> adaptive CFL dt ->
  velocity update -> constant-density solver (warm-started) -> unpack +
  position update        (reference frame sequence dfsph.py:600-617)

The reference's host-driven convergence loops with per-iteration
``.to_numpy()`` reads (dfsph.py:131-164) become ``lax.while_loop``s with
on-device error reductions; warm-start fields (kappa, kappa_v, vel_guess)
live in the state pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dense_ops, viscosity
from ..config import SimConfig
from ..grid import DenseGrid, build_grid, pack_liquid, unpack_liquid
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
    vel: jnp.ndarray      # packed (3, C, NC)
    kappa: jnp.ndarray    # packed (C, NC)
    iters: jnp.ndarray
    err: jnp.ndarray


def divergence_solve(grid: DenseGrid, cfg: SimConfig, velp, kvp, alphap, cntp,
                     dt) -> _SolveResult:
    """Divergence-free velocity solver (dfsph.py:131-146, 415-485)."""
    rho0 = cfg.rest_density

    if cfg.divergence_warm_start:
        # warmstart_divergence_vel (dfsph.py:415-439)
        k_ws = 0.5 * jnp.maximum(kvp / dt, -0.5 * rho0 * rho0)
        drho_ws = dense_ops.drho_divergence(grid, cfg, velp, cntp)
        vel_ws = dense_ops.kappa_velocity_update(grid, cfg, velp, k_ws, dt)
        velp = jnp.where((drho_ws > 0.0)[None], vel_ws, velp)

    # begin_divergence_iter (dfsph.py:441-447)
    alpha_dt = alphap / dt
    drho = dense_ops.drho_divergence(grid, cfg, velp, cntp)
    kvp = jnp.zeros_like(kvp)
    n_liq = jnp.sum(grid.liquid).astype(jnp.float32)
    threshold = cfg.dfsph_div_tol * n_liq / dt

    def body(carry):
        velp, kvp, drho, err, it = carry
        k = drho * alpha_dt
        kvp = kvp + k
        velp = dense_ops.kappa_velocity_update(grid, cfg, velp, k, dt)
        drho = dense_ops.drho_divergence(grid, cfg, velp, cntp)
        err = dense_ops.liquid_sum(grid, drho)
        return velp, kvp, drho, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return (it == 0) | ((err > threshold) & (it < cfg.dfsph_div_max_iters))

    velp, kvp, drho, err, iters = jax.lax.while_loop(
        cond, body, (velp, kvp, drho, jnp.float32(0.0), jnp.int32(0)))
    # end_divergence_iter (dfsph.py:479-485): kappa_v stored scaled by dt
    return _SolveResult(vel=velp, kappa=kvp * dt, iters=iters, err=err)


def pressure_solve(grid: DenseGrid, cfg: SimConfig, velp, kp, alphap, rhop,
                   dt) -> _SolveResult:
    """Constant-density solver (dfsph.py:150-164, 487-552)."""
    rho0 = cfg.rest_density

    if cfg.pressure_warm_start:
        # Intended SPlisHSPlasH warm start.  The reference's version is inert:
        # it gates on adv_rho > rho_L0 with adv_rho already normalized to ~1
        # (dfsph.py:491) and zeroes kappa before use (dfsph.py:515).
        k_ws = jnp.maximum(kp / (dt * dt), -0.5 * rho0 * rho0)
        adv_ws = dense_ops.advected_density(grid, cfg, velp, rhop, dt)
        vel_ws = dense_ops.kappa_velocity_update(grid, cfg, velp, k_ws, dt)
        velp = jnp.where((adv_ws > 1.0)[None], vel_ws, velp)

    # begin_pressure_iter (dfsph.py:510-516)
    alpha_dt2 = alphap / (dt * dt)
    adv = dense_ops.advected_density(grid, cfg, velp, rhop, dt)
    kp = jnp.zeros_like(kp)
    n_liq = jnp.sum(grid.liquid).astype(jnp.float32)

    def body(carry):
        velp, kp, adv, err, it = carry
        k = (adv - 1.0) * alpha_dt2
        kp = kp + k
        velp = dense_ops.kappa_velocity_update(grid, cfg, velp, k, dt)
        adv = dense_ops.advected_density(grid, cfg, velp, rhop, dt)
        err = dense_ops.liquid_sum(grid, adv - 1.0) / n_liq
        return velp, kp, adv, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.dfsph_tol) | (it < cfg.dfsph_min_iters)) \
            & (it < cfg.dfsph_max_iters)

    velp, kp, adv, err, iters = jax.lax.while_loop(
        cond, body, (velp, kp, adv, jnp.float32(0.0), jnp.int32(0)))
    # end_pressure_iter (dfsph.py:549-552): kappa stored scaled by dt^2
    return _SolveResult(vel=velp, kappa=kp * dt * dt, iters=iters, err=err)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt
    grid = build_grid(state.pos, nl, cfg)

    stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
    rhop, alphap, cntp = stats.rho, stats.alpha, stats.count

    velp = pack_liquid(grid, state.vel)
    kvp = pack_liquid(grid, state.kappa_v)
    div = divergence_solve(grid, cfg, velp, kvp, alphap, cntp, dt)
    velp = div.vel

    # --- non-pressure forces (dfsph.py:84-103) ---
    gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1, 1)
    d_vel = jnp.broadcast_to(gvec, velp.shape)
    if cfg.tension_coff != 0.0 or cfg.tension_coff_b != 0.0:
        normalp = dense_ops.surface_normals(grid, cfg, rhop)
        d_vel = d_vel + dense_ops.tension_accel(grid, cfg, rhop, normalp)
    vgp = pack_liquid(grid, state.vel_guess)
    visc = viscosity.solve_dense(grid, cfg, velp, vgp, rhop, dt)
    d_vel = d_vel + (visc.vel_new - velp) / dt          # end_viscosity
    if cfg.enable_vorticity:
        omegap = pack_liquid(grid, state.omega)
        dv_vort, omegap = dense_ops.vorticity(grid, cfg, velp, omegap,
                                              rhop, dt)
        d_vel = d_vel + dv_vort
        omega = unpack_liquid(grid, omegap, state.omega)
    else:
        omega = state.omega

    # --- adaptive dt (dfsph.py:107-129): CFL from old dt, iteration feedback
    # from this frame's viscosity iters and LAST frame's pressure iters ---
    vnew = velp + d_vel * dt
    vmax_sq = jnp.maximum(
        dense_ops.liquid_max(grid, jnp.sum(vnew * vnew, axis=0)), 0.1)
    if cfg.adaptive_dt:
        feedback = jnp.maximum(visc.iters, state.last_pressure_iters)
        time_step = jnp.clip(
            cfg.cfl_factor * 0.4 * 2.0 * cfg.particle_radius / jnp.sqrt(vmax_sq),
            cfg.dt_min, cfg.dt_max)
        new_dt = jnp.where(feedback > 10, dt * 0.9,
                           jnp.where(feedback < 5, dt * 1.1, dt))
        new_dt = jnp.minimum(new_dt, time_step)
    else:
        new_dt = dt

    velp = velp + d_vel * new_dt                        # update_vel

    kp = pack_liquid(grid, state.kappa)
    pr = pressure_solve(grid, cfg, velp, kp, alphap, rhop, new_dt)
    velp = pr.vel

    # --- unpack + position update (dropped/overflow particles keep state) ---
    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * new_dt)        # update_pos

    diag = StepDiagnostics(
        divergence_iters=div.iters,
        pressure_iters=pr.iters,
        viscosity_iters=visc.iters,
        density_error=pr.err,
        neighbor_overflow=grid.overflow,
        vel_max=jnp.sqrt(vmax_sq),
    )
    return state.replace(
        pos=pos,
        vel=vel,
        omega=omega,
        vel_guess=unpack_liquid(grid, visc.delta_v, state.vel_guess),
        kappa=unpack_liquid(grid, pr.kappa, state.kappa),
        kappa_v=unpack_liquid(grid, div.kappa, state.kappa_v),
        dt=new_dt,
        time=state.time + new_dt,
        last_visc_iters=visc.iters,
        last_pressure_iters=pr.iters,
        diag=diag,
    )

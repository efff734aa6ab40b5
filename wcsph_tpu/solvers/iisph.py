"""IISPH: implicit incompressible SPH (relaxed Jacobi pressure solve).

Re-design of reference iisph.py: density -> implicit viscosity (PCG, shared
module viscosity.py) -> advection coefficients (d_ii, a_ii, advected density,
pressure warm start 0.5 p) -> relaxed-Jacobi pressure loop -> pressure force
+ integrate.

Documented divergence from the reference: its Jacobi loop never copies the
new pressure into pressure_pre (iisph.py:318-370), so every iteration
recomputes the same value; we implement the intended relaxed Jacobi
(p_pre <- p each iteration, omega = 0.5).  Also d_ii / a_ii use the liquid
volume for ALL neighbors in the reference (iisph.py:288, 313; VS0 == VL0
there); we use the per-type neighbor volume.

All math is in the planar TPU layout (see ops.py): velocities (3, NL), pair
arrays (K, NL), gradW = gs * r.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import ops, viscosity
from ..config import SimConfig
from ..neighbors import build_neighbors
from ..state import FluidState, StepDiagnostics


def default_config(**overrides) -> SimConfig:
    """Reference iisph defaults (iisph.py:24-92): nu = 2.0, nu_b = 3.0."""
    base = dict(
        solid_volume_scale=1.0,
        viscosity=2.0,
        viscosity_b=3.0,
        adaptive_dt=False,
        dt_init=1e-3,
    )
    base.update(overrides)
    return SimConfig(**base)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt
    rho0 = cfg.rest_density
    v0 = cfg.liquid_volume
    nbr = build_neighbors(state.pos, nl, cfg)
    pairs = ops.precompute_pairs(state.pos, nbr, nl, cfg)

    rho = ops.density(pairs, cfg)                       # iisph.py:254-268

    # --- implicit viscosity (iisph.py:114-126) ---
    visc = viscosity.solve(pairs, state.vel, state.vel_guess, rho, dt, cfg, nl)
    gravity = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1)
    d_vel = gravity + (visc.vel_new - state.vel) / dt   # combine_nonpressure

    # --- advection coefficients (iisph.py:276-316) ---
    vel = state.vel + d_vel * dt
    vj = ops.pair_volume(pairs, cfg)
    inv_den = rho0 / rho                                 # normalized 1/density_i
    # d_ii = -(rho0/rho_i)^2 sum_j V_j gradW   (planar (3, NL))
    d_ii = -jnp.sum((vj * pairs.gs)[None] * pairs.rij, axis=1) \
        * (inv_den * inv_den)[None, :]

    vel_j = ops.gather_liquid(vel, pairs, nl)
    dv_dot_r = ops.dot3(vel[:, None, :] - vel_j, pairs.rij)
    adv_rho = rho / rho0 + dt * jnp.sum(vj * pairs.gs * dv_dot_r, axis=0)

    # a_ii = sum_j V_j (d_ii - d_ji) . gradW, d_ji = V0/(rho_i/rho0)^2 gradW:
    #   d_ii . gradW = gs * d_ii . r ;  d_ji . gradW = V0/den_i^2 gs^2 |r|^2
    den_i2 = (rho / rho0) ** 2
    dii_dot = pairs.gs * ops.dot3(d_ii[:, None, :], pairs.rij)
    dji_dot = (v0 / den_i2)[None, :] * pairs.gs * pairs.gs * pairs.dist2
    a_ii = jnp.sum(vj * (dii_dot - dji_dot), axis=0)

    p_init = 0.5 * state.pressure                       # warm start iisph.py:292

    # --- relaxed Jacobi loop (iisph.py:130-139, 318-370) ---
    rho_j = ops.gather_liquid(rho, pairs, nl)
    den_j2 = jnp.where(pairs.liquid, (rho_j / rho0) ** 2, 1.0)
    d_ii_j = jnp.where(pairs.liquid[None], d_ii[:, jnp.minimum(pairs.idx, nl - 1)], 0.0)

    def body(carry):
        _, p_pre, err, it = carry
        p_j = ops.gather_liquid(p_pre, pairs, nl)
        # dij_pj_i = sum_liq -V0/(rho_j/rho0)^2 p_j gradW  (iisph.py:318-334)
        coeff = jnp.where(pairs.liquid, -v0 / den_j2 * p_j * pairs.gs, 0.0)
        dij_pj = jnp.sum(coeff[None] * pairs.rij, axis=1)          # (3, NL)

        # s_i (iisph.py:336-370)
        dij_pj_j = jnp.where(pairs.liquid[None],
                             dij_pj[:, jnp.minimum(pairs.idx, nl - 1)], 0.0)
        dij_dot_i = pairs.gs * ops.dot3(dij_pj[:, None, :], pairs.rij)
        dii_j_dot = pairs.gs * p_j * ops.dot3(d_ii_j, pairs.rij)
        dij_j_dot = pairs.gs * ops.dot3(dij_pj_j, pairs.rij)
        dji_pi_dot = (v0 / den_i2 * p_pre)[None, :] * pairs.gs * pairs.gs \
            * pairs.dist2
        term_liq = v0 * (dij_dot_i - dii_j_dot - dij_j_dot + dji_pi_dot)
        term_sol = cfg.solid_volume * dij_dot_i
        s = jnp.sum(jnp.where(pairs.liquid, term_liq,
                              jnp.where(pairs.solid, term_sol, 0.0)), axis=0)

        b = 1.0 - adv_rho
        h2 = dt * dt
        denom = a_ii * h2
        p_new = jnp.maximum(
            (1.0 - cfg.iisph_omega) * p_pre
            + cfg.iisph_omega / jnp.where(jnp.abs(denom) > cfg.eps, denom, 1.0)
            * (b - h2 * s), 0.0)
        p_new = jnp.where(jnp.abs(denom) > cfg.eps, p_new, 0.0)
        resid = jnp.where(p_new != 0.0, (a_ii * p_new + s) * h2 - b, 0.0)
        err = jnp.sum(resid) / float(nl)
        return p_pre, p_new, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.iisph_tol) | (it < cfg.iisph_min_iters)) \
            & (it < cfg.iisph_max_iters)

    _, pressure, err, iters = jax.lax.while_loop(
        cond, body, (p_init, p_init, jnp.float32(0.0), jnp.int32(0)))

    # --- pressure force + integrate (iisph.py:372-396) ---
    dpi = pressure / den_i2
    dp_j = ops.gather_liquid(dpi, pairs, nl)
    coeff = jnp.where(pairs.liquid, v0 * (dpi[None, :] + dp_j),
                      jnp.where(pairs.solid, cfg.solid_volume * dpi[None, :], 0.0))
    d_vel_p = -jnp.sum((coeff * pairs.gs)[None] * pairs.rij, axis=1)
    vel = vel + d_vel_p * dt
    pos = state.pos.at[:, :nl].add(vel * dt)

    diag = StepDiagnostics(
        pressure_iters=iters,
        viscosity_iters=visc.iters,
        density_error=err,
        neighbor_overflow=nbr.overflow,
        vel_max=jnp.sqrt(jnp.max(ops.dot3(vel, vel))),
    )
    return state.replace(pos=pos, vel=vel, pressure=pressure,
                         vel_guess=visc.delta_v,
                         time=state.time + dt, diag=diag)

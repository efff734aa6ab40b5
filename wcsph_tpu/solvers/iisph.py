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
    nbr = build_neighbors(state.pos, nl, cfg)
    pairs = ops.precompute_pairs(state.pos, nbr, nl, cfg)

    rho = ops.density(pairs, cfg)                       # iisph.py:254-268

    # --- implicit viscosity (iisph.py:114-126) ---
    visc = viscosity.solve(pairs, state.vel, state.vel_guess, rho, dt, cfg, nl)
    gravity = jnp.asarray(cfg.gravity, jnp.float32)
    d_vel = gravity + (visc.vel_new - state.vel) / dt   # combine_nonpressure

    # --- advection coefficients (iisph.py:276-316) ---
    vel = state.vel + d_vel * dt
    vj = ops.pair_volume(pairs, cfg)
    inv_den = rho0 / rho                                 # per-i normalized 1/density
    d_ii = -jnp.sum(vj[..., None] * pairs.grad_w, axis=1) * (inv_den * inv_den)[:, None]

    vel_j = ops.gather_liquid(vel, pairs, nl)
    dv_dot = jnp.sum((vel[:, None, :] - vel_j) * pairs.grad_w, axis=-1)
    adv_rho = rho / rho0 + dt * jnp.sum(vj * dv_dot, axis=1)

    # a_ii = sum_j V_j (d_ii - d_ji) . gradW with d_ji = V_i/(rho_i/rho0)^2 gradW
    density_i = (rho / rho0)[:, None, None]
    d_ji = cfg.liquid_volume / (density_i * density_i) * pairs.grad_w
    a_ii = jnp.sum(vj * jnp.sum((d_ii[:, None, :] - d_ji) * pairs.grad_w, axis=-1),
                   axis=1)

    p_init = 0.5 * state.pressure                       # warm start iisph.py:292

    # --- relaxed Jacobi loop (iisph.py:130-139, 318-370) ---
    d_ii_j = ops.gather_liquid(d_ii, pairs, nl)
    a_den = (rho / rho0) ** 2

    def body(carry):
        p_pre, p, err, it = carry
        p_pre = p
        # dij_pj_i = sum_liq -V0/(rho_j/rho0)^2 p_j gradW  (iisph.py:318-334)
        rho_j = ops.gather_liquid(rho, pairs, nl)
        den_j = jnp.where(pairs.liquid, (rho_j / rho0) ** 2, 1.0)
        p_j = ops.gather_liquid(p_pre, pairs, nl)
        contrib = jnp.where(pairs.liquid[..., None],
                            (-cfg.liquid_volume / den_j * p_j)[..., None]
                            * pairs.grad_w, 0.0)
        dij_pj = jnp.sum(contrib, axis=1)

        # sum_i (iisph.py:336-370)
        dij_pj_j = ops.gather_liquid(dij_pj, pairs, nl)
        d_ji_pi = (cfg.liquid_volume / a_den[:, None, None]) \
            * pairs.grad_w * p_pre[:, None, None]
        inner_liq = dij_pj[:, None, :] - d_ii_j * p_j[..., None] \
            - (dij_pj_j - d_ji_pi)
        term_liq = cfg.liquid_volume * jnp.sum(inner_liq * pairs.grad_w, axis=-1)
        term_sol = cfg.solid_volume * jnp.sum(dij_pj[:, None, :] * pairs.grad_w,
                                              axis=-1)
        s = jnp.sum(jnp.where(pairs.liquid, term_liq,
                              jnp.where(pairs.solid, term_sol, 0.0)), axis=1)

        b = 1.0 - adv_rho
        h2 = dt * dt
        denom = a_ii * h2
        p_new = jnp.maximum(
            (1.0 - cfg.iisph_omega) * p_pre + cfg.iisph_omega / denom * (b - h2 * s),
            0.0)
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
    dpi = pressure / a_den
    dp_j = ops.gather_liquid(dpi, pairs, nl)
    coeff = jnp.where(pairs.liquid, cfg.liquid_volume * (dpi[:, None] + dp_j),
                      jnp.where(pairs.solid, cfg.solid_volume * dpi[:, None], 0.0))
    d_vel_p = -jnp.sum(coeff[..., None] * pairs.grad_w, axis=1)
    vel = vel + d_vel_p * dt
    pos = state.pos.at[:nl].add(vel * dt)

    diag = StepDiagnostics(
        pressure_iters=iters,
        viscosity_iters=visc.iters,
        density_error=err,
        neighbor_overflow=nbr.overflow,
        vel_max=jnp.sqrt(jnp.max(jnp.sum(vel * vel, axis=-1))),
    )
    return state.replace(pos=pos, vel=vel, pressure=pressure,
                         vel_guess=visc.delta_v,
                         time=state.time + dt, diag=diag)

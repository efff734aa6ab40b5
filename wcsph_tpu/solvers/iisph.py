"""IISPH: implicit incompressible SPH (relaxed Jacobi pressure solve).

Re-design of reference iisph.py on the cell-dense packed layout: density ->
implicit viscosity (PCG, shared module viscosity.py) -> advection
coefficients (d_ii, a_ii, advected density, pressure warm start 0.5 p) ->
relaxed-Jacobi pressure loop -> pressure force + integrate.

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

from .. import dense_ops, viscosity
from ..config import SimConfig
from ..grid import build_grid, pack_liquid, unpack_liquid
from ..parallel.comm import NoComm
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
    grid = build_grid(state.pos, nl, cfg)

    stats = dense_ops.density_stats(grid, cfg, with_alpha=False)
    rhop = stats.rho                                    # iisph.py:254-268

    # --- implicit viscosity (iisph.py:114-126) ---
    velp = pack_liquid(grid, state.vel)
    vgp = pack_liquid(grid, state.vel_guess)
    visc = viscosity.solve_dense(NoComm(grid, cfg), velp, vgp, rhop, dt)
    gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1, 1)
    d_vel = gvec + (visc.vel_new - velp) / dt           # combine_nonpressure

    # --- advection coefficients (iisph.py:276-316) ---
    velp = velp + d_vel * dt
    inv_den2 = (rho0 / rhop) ** 2                        # (C, NC)
    den_i2 = (rhop / rho0) ** 2

    loop = dense_ops.WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)

    def adv_fn(carry, w, lp):
        d_ii_acc, adv_acc, dji_acc = carry
        gs = dense_ops._masked_gs(w, cfg)
        vj = dense_ops._vol_j(w, cfg)
        d_ii_acc = lp.accum_r(w, -vj * gs, d_ii_acc)
        dv_dot = lp.delta_dot_r(w, velp, vel_pad)
        adv_acc = adv_acc + jnp.sum(vj * gs * dv_dot, axis=1)
        # a_ii part 2: sum_j V_j (d_ji . gradW) with d_ji = V0/den_i^2 gradW
        dji_acc = dji_acc + jnp.sum(vj * gs * gs * w.dist2, axis=1)
        return d_ii_acc, adv_acc, dji_acc

    d_ii_acc, adv_acc, dji_acc = loop.scan(
        adv_fn, (dense_ops._zeros(grid, 3), dense_ops._zeros(grid),
                 dense_ops._zeros(grid)))
    d_ii = d_ii_acc * inv_den2[None]
    adv_rho = rhop / rho0 + dt * adv_acc

    # a_ii part 1: sum_j V_j d_ii . gradW
    def aii_fn(acc, w, lp):
        gs = dense_ops._masked_gs(w, cfg)
        vj = dense_ops._vol_j(w, cfg)
        dii_dot = lp.delta_dot_r(w, d_ii, None)
        return acc + jnp.sum(vj * gs * dii_dot, axis=1)

    aii_dii = loop.scan(aii_fn, dense_ops._zeros(grid))
    a_ii = aii_dii - (v0 / den_i2) * dji_acc

    pp = pack_liquid(grid, state.pressure)
    p_init = 0.5 * pp                                   # warm start iisph.py:292
    n_liq = jnp.sum(grid.liquid).astype(jnp.float32)
    d_ii_pad = loop.pad(d_ii, 0.0)

    # --- relaxed Jacobi loop (iisph.py:130-139, 318-370) ---
    def body(carry):
        _, p_pre, err, it = carry
        p_pad = loop.pad(p_pre, 0.0)

        # dij_pj_i = sum_liq -V0/(rho_j/rho0)^2 p_j gradW  (iisph.py:318-334)
        rho_pad = loop.pad(rhop, 1.0)

        def dij_fn(acc, w, lp):
            gs = dense_ops._masked_gs(w, cfg)
            rho_j = lp.shift(rho_pad, w.lin)[None]
            p_j = jnp.where(w.liq_j, lp.shift(p_pad, w.lin)[None], 0.0)
            den_j2 = jnp.where(w.liq_j, (rho_j / rho0) ** 2, 1.0)
            return lp.accum_r(w, jnp.where(w.liq_j, -v0 / den_j2 * p_j * gs, 0.0),
                              acc)

        dij_pj = loop.scan(dij_fn, dense_ops._zeros(grid, 3))
        dij_pad = loop.pad(dij_pj, 0.0)

        # s_i (iisph.py:336-370)
        def s_fn(acc, w, lp):
            gs = dense_ops._masked_gs(w, cfg)
            p_j = jnp.where(w.liq_j, lp.shift(p_pad, w.lin)[None], 0.0)
            dij_dot_i = gs * lp.delta_dot_r(w, dij_pj, None)
            dii_j_dot = jnp.zeros_like(gs)
            dij_j_dot = jnp.zeros_like(gs)
            for c in range(3):
                rc = lp.rij(w, c)
                dii_j_dot = dii_j_dot + lp.shift(d_ii_pad[c], w.lin)[None] * rc
                dij_j_dot = dij_j_dot + lp.shift(dij_pad[c], w.lin)[None] * rc
            dii_j_dot = gs * p_j * dii_j_dot
            dij_j_dot = gs * dij_j_dot
            dji_pi_dot = (v0 / den_i2 * p_pre)[:, None, :] * gs * gs * w.dist2
            term_liq = v0 * (dij_dot_i - dii_j_dot - dij_j_dot + dji_pi_dot)
            term_sol = cfg.solid_volume * dij_dot_i
            return acc + jnp.sum(
                jnp.where(w.liq_j, term_liq,
                          jnp.where(w.sol_j, term_sol, 0.0)), axis=1)

        s = loop.scan(s_fn, dense_ops._zeros(grid))

        b = 1.0 - adv_rho
        h2 = dt * dt
        denom = a_ii * h2
        ok = jnp.abs(denom) > cfg.eps
        p_new = jnp.maximum(
            (1.0 - cfg.iisph_omega) * p_pre
            + cfg.iisph_omega / jnp.where(ok, denom, 1.0) * (b - h2 * s), 0.0)
        p_new = jnp.where(ok, p_new, 0.0)
        resid = jnp.where(p_new != 0.0, (a_ii * p_new + s) * h2 - b, 0.0)
        err = dense_ops.liquid_sum(grid, resid) / n_liq
        return p_pre, p_new, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.iisph_tol) | (it < cfg.iisph_min_iters)) \
            & (it < cfg.iisph_max_iters)

    _, pp, err, iters = jax.lax.while_loop(
        cond, body, (p_init, p_init, jnp.float32(0.0), jnp.int32(0)))

    # --- pressure force + integrate (iisph.py:372-396) ---
    dpi = pp / den_i2
    dpi_pad = loop.pad(dpi, 0.0)

    def force_fn(acc, w, lp):
        gs = dense_ops._masked_gs(w, cfg)
        dp_j = jnp.where(w.liq_j, lp.shift(dpi_pad, w.lin)[None], 0.0)
        coeff = jnp.where(w.liq_j, v0 * (dpi[:, None, :] + dp_j),
                          jnp.where(w.sol_j,
                                    cfg.solid_volume * dpi[:, None, :], 0.0))
        return lp.accum_r(w, -coeff * gs, acc)

    d_vel_p = loop.scan(force_fn, dense_ops._zeros(grid, 3))
    velp = velp + d_vel_p * dt
    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * dt)

    diag = StepDiagnostics(
        pressure_iters=iters,
        viscosity_iters=visc.iters,
        density_error=err,
        neighbor_overflow=grid.overflow,
        vel_max=jnp.sqrt(jnp.maximum(
            dense_ops.liquid_max(grid, jnp.sum(velp * velp, axis=0)), 0.0)),
    )
    return state.replace(pos=pos, vel=vel,
                         pressure=unpack_liquid(grid, pp, state.pressure),
                         vel_guess=unpack_liquid(grid, visc.delta_v, state.vel_guess),
                         time=state.time + dt, diag=diag)

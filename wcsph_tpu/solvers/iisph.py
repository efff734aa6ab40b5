"""IISPH: implicit incompressible SPH (relaxed Jacobi pressure solve).

Re-design of reference iisph.py on the cell-dense packed layout: density ->
implicit viscosity (PCG, shared module viscosity.py) -> advection
coefficients (d_ii, a_ii, advected density, pressure warm start 0.5 p) ->
relaxed-Jacobi pressure loop -> pressure force + integrate.

All sweeps run through the communicator abstraction (parallel/comm.py): the
same ``step_middle`` runs single-device (NoComm) or under the x-slab domain
decomposition with one ppermute halo exchange per lifted quantity and psum'd
error reductions (SlabComm; parallel/halo.py iisph_step_sharded).

Documented divergence from the reference: its Jacobi loop never copies the
new pressure into pressure_pre (iisph.py:318-370), so every iteration
recomputes the same value; we implement the intended relaxed Jacobi
(p_pre <- p each iteration, omega = 0.5).  Also d_ii / a_ii use the liquid
volume for ALL neighbors in the reference (iisph.py:288, 313; VS0 == VL0
there); we use the per-type neighbor volume.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dense_ops, viscosity
from ..config import SimConfig
from ..grid import build_grid, pack_liquid_many, unpack_liquid_many
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


class MidResult(NamedTuple):
    vel: jnp.ndarray          # packed, owned layout
    pressure: jnp.ndarray
    delta_v: jnp.ndarray      # viscosity warm start
    iters: jnp.ndarray
    visc_iters: jnp.ndarray
    err: jnp.ndarray
    err_pre: jnp.ndarray      # advected-density violation before the solve


def _step_middle_engine(comm, cfg: SimConfig, velp, vgp, pp, dt) -> MidResult:
    """IISPH solve on the Mosaic sweep engine (all sweeps half-window except
    the structurally one-sided s_i pass); same math as the XLA path below."""
    rho0 = cfg.rest_density
    v0 = cfg.liquid_volume
    eng = comm.engine
    liq = comm._liq

    rhop, _, _ = eng.density_alpha(with_alpha=False)    # iisph.py:254-268

    # --- implicit viscosity (engine PCG via solve_dense) ---
    visc = viscosity.solve_dense(comm, velp, vgp, rhop, dt)
    gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(
        (3,) + (1,) * (velp.ndim - 1))
    d_vel = gvec + (visc.vel_new - velp) / dt
    velp = velp + jnp.where(liq[None], d_vel * dt, 0.0)

    # --- advection coefficients (iisph.py:276-316) ---
    # NOTE raw rho (no clamp), bit-matching the XLA twin below: rho is
    # bounded away from 0 by the self term rho0 * V0 * W(0).
    dii_raw, adv_acc, dji_acc = eng.iisph_adv(velp)
    d_ii = dii_raw * ((rho0 / rhop) ** 2)[None]
    adv_rho = rhop / rho0 + dt * adv_acc
    den_i2 = (rhop / rho0) ** 2
    a_ii = eng.iisph_aii(d_ii) - (v0 / den_i2) * dji_acc

    p_init = 0.5 * pp                                   # warm start
    n_liq = comm.n_liquid()
    err_pre = comm.lsum(jnp.maximum(adv_rho - 1.0, 0.0)) / n_liq

    from ..pallas.engine import use_fused_iters

    fused = use_fused_iters(comm, "fused_jacobi_iter")

    def _jacobi_tail(p_pre, s):
        """Shared relaxed-Jacobi update + residual (iisph.py:336-370)."""
        b = 1.0 - adv_rho
        h2 = dt * dt
        denom = a_ii * h2
        ok = jnp.abs(denom) > cfg.eps
        p_new = jnp.maximum(
            (1.0 - cfg.iisph_omega) * p_pre
            + cfg.iisph_omega / jnp.where(ok, denom, 1.0) * (b - h2 * s), 0.0)
        p_new = jnp.where(ok, p_new, 0.0)
        resid = jnp.where(p_new != 0.0, (a_ii * p_new + s) * h2 - b, 0.0)
        return p_new, comm.lsum(resid) / n_liq

    if fused:
        # One Mosaic program per iteration (engine.fused_jacobi_iter: zero
        # + dij + s + Jacobi-update phases; fac/p_liq/g formed in VMEM and
        # the residual reduced in-kernel); the sweep output buffers cycle
        # through the carry as the next iteration's donated storage.
        deninv = v0 / den_i2
        b_rhs = 1.0 - adv_rho

        def body(carry):
            pp, err, it, dij_b, s_b = carry
            dij_b, s_b, pp, scal = eng.fused_jacobi_iter(
                d_ii, deninv, a_ii, b_rhs, pp, dt, dij_b, s_b)
            return pp, scal[0] / n_liq, it + 1, dij_b, s_b

        def cond(carry):
            _, err, it = carry[:3]
            return ((err > cfg.iisph_tol) | (it < cfg.iisph_min_iters)) \
                & (it < cfg.iisph_max_iters)

        pp, err, iters, _, _ = jax.lax.while_loop(
            cond, body, (p_init, jnp.float32(0.0), jnp.int32(0),
                         jnp.zeros_like(d_ii), jnp.zeros_like(p_init)))
    else:
        def body(carry):
            _, p_pre, err, it = carry
            fac = jnp.where(liq, -v0 * p_pre / den_i2, 0.0)
            dij = eng.iisph_dij(fac)
            p_liq = jnp.where(liq, p_pre, 0.0)
            g = v0 * p_pre / den_i2
            s = eng.iisph_s(d_ii, dij, p_liq, g)
            p_new, err = _jacobi_tail(p_pre, s)
            return p_pre, p_new, err, it + 1

        def cond(carry):
            *_, err, it = carry
            return ((err > cfg.iisph_tol) | (it < cfg.iisph_min_iters)) \
                & (it < cfg.iisph_max_iters)

        _, pp, err, iters = jax.lax.while_loop(
            cond, body, (p_init, p_init, jnp.float32(0.0), jnp.int32(0)))

    # --- pressure force + integrate (iisph.py:372-396) ---
    d_vel_p = eng.iisph_force(pp / den_i2)
    velp = velp + jnp.where(liq[None], d_vel_p * dt, 0.0)
    return MidResult(vel=velp, pressure=pp, delta_v=visc.delta_v,
                     iters=iters, visc_iters=visc.iters, err=err,
                     err_pre=err_pre)


def step_middle(comm, cfg: SimConfig, velp, vgp, pp, dt) -> MidResult:
    """Whole IISPH solve in packed space; array args in OWNED layout."""
    if comm.engine is not None:
        return _step_middle_engine(comm, cfg, velp, vgp, pp, dt)
    rho0 = cfg.rest_density
    v0 = cfg.liquid_volume

    stats = dense_ops.density_stats(comm.grid, comm.cfg, with_alpha=False)
    rhop = comm.lower(stats.rho)                        # iisph.py:254-268

    # --- implicit viscosity (iisph.py:114-126) ---
    visc = viscosity.solve_dense(comm, velp, vgp, rhop, dt)
    gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1, 1)
    d_vel = gvec + (visc.vel_new - velp) / dt           # combine_nonpressure

    # --- advection coefficients (iisph.py:276-316) ---
    # liquid-masked: boundary slots keep velocity 0 exactly (the reference
    # integrates i < liquid_count only; unmasked gravity here would leak
    # g*dt into the (v_i - v_j) advection pair terms of wall neighbors)
    velp = velp + jnp.where(comm._liq[None], d_vel * dt, 0.0)
    den_i2 = (rhop / rho0) ** 2                         # owned (C, NC_own)

    loop = dense_ops.WindowLoop(comm.grid, comm.cfg)
    velp_l = comm.lift(velp)
    vel_pad = loop.pad(velp_l, 0.0)
    v_home = loop.vol_home()

    def adv_fn(carry, w, lp, mg):
        """Half-window (Newton) form: F = gs*r, gs*dv.r and gs^2*d2 are
        shared per +-offset pair; the home side weights by V_j, the mirror
        side by V_i (signs flip with r for the vector term)."""
        d_ii_acc, adv_acc, dji_acc = carry
        gs = dense_ops._masked_gs(w, cfg)
        vj = dense_ops._vol_j(w, cfg)
        parts = []
        for c in range(3):
            f = gs * lp.rij(w, c)
            parts.append(-jnp.sum(vj * f, axis=1)
                         + lp.shift_out(mg * jnp.sum(v_home * f, axis=0),
                                        w.lin))
        d_ii_acc = d_ii_acc + jnp.stack(parts)
        f2 = gs * lp.delta_dot_r(w, velp_l, vel_pad)
        adv_acc = adv_acc + jnp.sum(vj * f2, axis=1) \
            + lp.shift_out(mg * jnp.sum(v_home * f2, axis=0), w.lin)
        # a_ii part 2: sum_j V_j (d_ji . gradW) with d_ji = V0/den_i^2 gradW
        f3 = gs * gs * w.dist2
        dji_acc = dji_acc + jnp.sum(vj * f3, axis=1) \
            + lp.shift_out(mg * jnp.sum(v_home * f3, axis=0), w.lin)
        return d_ii_acc, adv_acc, dji_acc

    g_l = comm.grid
    d_ii_raw, adv_acc, dji_acc = loop.scan_sym(
        adv_fn, (dense_ops._zeros(g_l, 3), dense_ops._zeros(g_l),
                 dense_ops._zeros(g_l)))
    rhop_l = comm.lift(rhop, 1.0)
    # d_ii is read as a NEIGHBOR quantity below; its halo columns from the
    # local scan are incomplete (edge windows), so re-sync them through a
    # lower+lift round trip (identity single-device, ppermute under slabs).
    d_ii_l = comm.lift(comm.lower(d_ii_raw * ((rho0 / rhop_l) ** 2)[None]))
    adv_rho = rhop / rho0 + dt * comm.lower(adv_acc)
    dji_acc = comm.lower(dji_acc)

    # a_ii part 1: sum_j V_j d_ii . gradW
    def aii_fn(acc, w, lp):
        gs = dense_ops._masked_gs(w, cfg)
        vj = dense_ops._vol_j(w, cfg)
        dii_dot = lp.delta_dot_r(w, d_ii_l, None)
        return acc + jnp.sum(vj * gs * dii_dot, axis=1)

    aii_dii = comm.lower(loop.scan(aii_fn, dense_ops._zeros(g_l)))
    a_ii = aii_dii - (v0 / den_i2) * dji_acc

    p_init = 0.5 * pp                                   # warm start iisph.py:292
    n_liq = comm.n_liquid()
    err_pre = comm.lsum(jnp.maximum(adv_rho - 1.0, 0.0)) / n_liq
    d_ii_pad = loop.pad(d_ii_l, 0.0)
    rho_pad = loop.pad(rhop_l, 1.0)
    den_i2_l = (rhop_l / rho0) ** 2
    liq_home = g_l.liquid[:, None, :]
    sol_home = (g_l.valid & ~g_l.liquid)[:, None, :]

    # --- relaxed Jacobi loop (iisph.py:130-139, 318-370) ---
    def body(carry):
        _, p_pre, err, it = carry
        p_pre_l = comm.lift(p_pre)
        p_pad = loop.pad(p_pre_l, 0.0)

        # dij_pj_i = sum_liq -V0/(rho_j/rho0)^2 p_j gradW  (iisph.py:318-334)
        # half-window: the pair geometry gs*r is shared, the source factor
        # -V0 p/den^2 evaluates with j's values on the home side and i's on
        # the mirror side
        p_h = p_pre_l[:, None, :]
        fac_home = jnp.where(liq_home,
                             -v0 / den_i2_l[:, None, :] * p_h, 0.0)

        def dij_fn(acc, w, lp, mg):
            gs = dense_ops._masked_gs(w, cfg)
            rho_j = lp.shift(rho_pad, w.lin)[None]
            p_j = jnp.where(w.liq_j, lp.shift(p_pad, w.lin)[None], 0.0)
            den_j2 = jnp.where(w.liq_j, (rho_j / rho0) ** 2, 1.0)
            fac_j = jnp.where(w.liq_j, -v0 / den_j2 * p_j, 0.0) * gs
            fac_h = fac_home * gs
            return acc + jnp.stack([
                jnp.sum(fac_j * lp.rij(w, c), axis=1)
                - lp.shift_out(mg * jnp.sum(fac_h * lp.rij(w, c), axis=0),
                               w.lin)
                for c in range(3)])

        dij_pj = loop.scan_sym(dij_fn, dense_ops._zeros(g_l, 3))
        # dij_pj crosses the slab boundary only through its own window scan;
        # lower+lift re-syncs the halo columns before it is read as a
        # neighbor quantity in the s sweep below.
        dij_pj = comm.lift(comm.lower(dij_pj))
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
            dji_pi_dot = (v0 / den_i2_l * p_pre_l)[:, None, :] * gs * gs * w.dist2
            term_liq = v0 * (dij_dot_i - dii_j_dot - dij_j_dot + dji_pi_dot)
            term_sol = cfg.solid_volume * dij_dot_i
            return acc + jnp.sum(
                jnp.where(w.liq_j, term_liq,
                          jnp.where(w.sol_j, term_sol, 0.0)), axis=1)

        s = comm.lower(loop.scan(s_fn, dense_ops._zeros(g_l)))

        b = 1.0 - adv_rho
        h2 = dt * dt
        denom = a_ii * h2
        ok = jnp.abs(denom) > cfg.eps
        p_new = jnp.maximum(
            (1.0 - cfg.iisph_omega) * p_pre
            + cfg.iisph_omega / jnp.where(ok, denom, 1.0) * (b - h2 * s), 0.0)
        p_new = jnp.where(ok, p_new, 0.0)
        resid = jnp.where(p_new != 0.0, (a_ii * p_new + s) * h2 - b, 0.0)
        err = comm.lsum(resid) / n_liq
        return p_pre, p_new, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.iisph_tol) | (it < cfg.iisph_min_iters)) \
            & (it < cfg.iisph_max_iters)

    _, pp, err, iters = jax.lax.while_loop(
        cond, body, (p_init, p_init, jnp.float32(0.0), jnp.int32(0)))

    # --- pressure force + integrate (iisph.py:372-396) ---
    dpi_l = comm.lift(pp) / den_i2_l
    dpi_pad = loop.pad(dpi_l, 0.0)

    def force_fn(acc, w, lp, mg):
        """Half-window: the force coefficient C(receiver, source) is
        v0 (dpi_r + dpi_s) for a liquid source and Vs dpi_r for a solid
        source; the home side uses C(home, nbr), the mirror side
        C(nbr, home) with the sign flip carried by -r."""
        gs = dense_ops._masked_gs(w, cfg)
        dp_h = dpi_l[:, None, :]
        dp_j = jnp.where(w.liq_j, lp.shift(dpi_pad, w.lin)[None], 0.0)
        sym = v0 * (dp_h + dp_j)
        c_hn = jnp.where(w.liq_j, sym,
                         jnp.where(w.sol_j, cfg.solid_volume * dp_h, 0.0))
        c_nh = jnp.where(liq_home, sym,
                         jnp.where(sol_home, cfg.solid_volume * dp_j, 0.0))
        return acc + jnp.stack([
            -jnp.sum(c_hn * gs * lp.rij(w, c), axis=1)
            + lp.shift_out(mg * jnp.sum(c_nh * gs * lp.rij(w, c), axis=0),
                           w.lin)
            for c in range(3)])

    d_vel_p = comm.lower(loop.scan_sym(force_fn, dense_ops._zeros(g_l, 3)))
    velp = velp + jnp.where(comm._liq[None], d_vel_p * dt, 0.0)
    return MidResult(vel=velp, pressure=pp, delta_v=visc.delta_v,
                     iters=iters, visc_iters=visc.iters, err=err,
                     err_pre=err_pre)


# Resident-mode dynamic fields; [0] must be "vel" (resident.advance moves
# positions by it).  pressure feeds the next step's Jacobi warm start
# (p_pre semantics, iisph.py:318), vel_guess the viscosity warm start.
RESIDENT_FIELDS = ("vel", "vel_guess", "pressure")


def step_resident(rs, cfg: SimConfig):
    """One IISPH step on the resident padded state (resident.py)."""
    from .. import resident

    grid, dyn, side, comm = resident.begin_step(cfg, rs)
    mid = step_middle(comm, cfg, *dyn, rs.dt)
    diag = StepDiagnostics(
        pressure_iters=mid.iters,
        viscosity_iters=mid.visc_iters,
        density_error=mid.err,
        density_error_pre=mid.err_pre,
        neighbor_overflow=grid.overflow + grid.rebin_lost,
        vel_max=jnp.sqrt(jnp.maximum(
            comm.lmax(jnp.sum(mid.vel * mid.vel, axis=0)), 0.0)),
    )
    return resident.advance(rs, grid, side,
                            (mid.vel, mid.delta_v, mid.pressure),
                            rs.dt, diag, visc_iters=mid.visc_iters,
                            pressure_iters=mid.iters)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt
    fields = [state.vel, state.vel_guess, state.pressure]
    prevs = [state.vel, state.pressure, state.vel_guess]

    def _finish(comm, overflow, mid, vel, pressure, vel_guess):
        pos = state.pos.at[:, :nl].add(vel * dt)
        diag = StepDiagnostics(
            pressure_iters=mid.iters,
            viscosity_iters=mid.visc_iters,
            density_error=mid.err,
            density_error_pre=mid.err_pre,
            neighbor_overflow=overflow,
            vel_max=jnp.sqrt(jnp.maximum(
                comm.lmax(jnp.sum(mid.vel * mid.vel, axis=0)), 0.0)),
        )
        return state.replace(pos=pos, vel=vel,
                             pressure=pressure,
                             vel_guess=vel_guess,
                             time=state.time + dt, diag=diag)

    if cfg.use_pallas:
        from .. import resident as res

        def body(grid, comm, packed):
            mid = step_middle(comm, cfg, *packed, dt)
            outs = res.unpack_many_direct(
                grid, [mid.vel, mid.pressure, mid.delta_v], prevs)
            return _finish(comm, grid.overflow, mid, *outs)

        return res.padded_step_spill(cfg, state.pos, nl, fields, body)

    grid = build_grid(state.pos, nl, cfg)
    comm = NoComm(grid, cfg)
    packed = pack_liquid_many(grid, fields)
    mid = step_middle(comm, cfg, *packed, dt)
    outs = unpack_liquid_many(grid, [mid.vel, mid.pressure, mid.delta_v],
                              prevs)
    return _finish(comm, grid.overflow, mid, *outs)

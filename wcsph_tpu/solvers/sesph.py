"""SESPH: state-equation (Tait EOS) SPH solver.

Re-design of reference sesph.py:130-236 as one pure, jittable step on the
cell-dense packed layout:
  density summation -> Tait EOS pressure -> symmetric pressure force +
  explicit viscosity -> semi-implicit Euler.
No inner convergence loops; fixed dt (sesph.py:135 uses dt = 0.001).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dense_ops, ops
from ..config import SimConfig
from ..grid import build_grid, pack_liquid, unpack_liquid
from ..parallel.comm import NoComm
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


def step_middle(comm, cfg: SimConfig, velp, dt):
    """Density -> EOS -> forces -> velocity update, comm-parameterized
    (runs single-device or slab-sharded; see parallel/halo.py)."""
    gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(
        (3,) + (1,) * (velp.ndim - 1))
    if comm.engine is not None:
        rho_raw, _, _ = comm.engine.density_alpha(with_alpha=False)
        rhop, pp = ops.tait_pressure(rho_raw, cfg)
        d_vel = gvec + comm.engine.sesph_force(velp, rhop, pp)
    else:
        stats = dense_ops.density_stats(comm.grid, comm.cfg,
                                        with_alpha=False)
        rhop, pp = ops.tait_pressure(comm.lower(stats.rho), cfg)
        rho_l = comm.lift(rhop, 1.0)
        d_vel = (gvec
                 + comm.lower(dense_ops.explicit_viscosity_accel(
                     comm.grid, comm.cfg, comm.lift(velp), rho_l))
                 + comm.lower(dense_ops.pressure_accel_symmetric(
                     comm.grid, comm.cfg, rho_l, comm.lift(pp))))
    return velp + d_vel * dt, rhop, pp                  # sesph.py:191-196


# Resident-mode dynamic fields; [0] must be "vel" (resident.advance moves
# positions by it).  pressure rides along as an output-only field.
RESIDENT_FIELDS = ("vel", "pressure")


def step_resident(rs, cfg: SimConfig):
    """One SESPH step on the resident padded state (resident.py)."""
    from .. import resident

    grid, dyn, side, comm = resident.begin_step(cfg, rs)
    velp, _ = dyn                       # middle recomputes pressure from EOS
    vel_new, rhop, pp = step_middle(comm, cfg, velp, rs.dt)
    diag = StepDiagnostics(
        density_error=comm.lsum(rhop) / comm.n_liquid()
        / cfg.rest_density - 1.0,
        neighbor_overflow=grid.overflow + grid.rebin_lost,
        vel_max=jnp.sqrt(jnp.maximum(
            comm.lmax(jnp.sum(vel_new * vel_new, axis=0)), 0.0)),
    )
    return resident.advance(rs, grid, side, (vel_new, pp), rs.dt, diag)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt

    def _finish(comm, overflow, velp, rhop, vel, pressure):
        pos = state.pos.at[:, :nl].add(vel * dt)
        diag = StepDiagnostics(
            density_error=comm.lsum(rhop)
            / comm.n_liquid() / cfg.rest_density - 1.0,
            neighbor_overflow=overflow,
            vel_max=jnp.sqrt(jnp.maximum(
                comm.lmax(jnp.sum(velp * velp, axis=0)), 0.0)),
        )
        return state.replace(
            pos=pos, vel=vel, pressure=pressure,
            time=state.time + dt, diag=diag,
        )

    if cfg.use_pallas:
        from .. import resident as res

        def body(grid, comm, packed):
            velp, rhop, pp = step_middle(comm, cfg, packed[0], dt)
            vel, pressure = res.unpack_many_direct(
                grid, [velp, pp], [state.vel, state.pressure])
            return _finish(comm, grid.overflow, velp, rhop, vel, pressure)

        return res.padded_step_spill(cfg, state.pos, nl, [state.vel], body)

    grid = build_grid(state.pos, nl, cfg)
    comm = NoComm(grid, cfg)
    vp = pack_liquid(grid, state.vel)
    velp, rhop, pp = step_middle(comm, cfg, vp, dt)
    vel = unpack_liquid(grid, velp, state.vel)
    pressure = unpack_liquid(grid, pp, state.pressure)
    return _finish(comm, grid.overflow, velp, rhop, vel, pressure)

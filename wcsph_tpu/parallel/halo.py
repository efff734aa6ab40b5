"""Explicit spatial domain decomposition: shard_map + ppermute halo exchange.

The TPU-native analogue of multi-GPU SPH domain decomposition (the reference
is single-device; SURVEY.md §2 parallelism table).  The packed cell grid
(grid.py) is split into contiguous x-slabs over a 1-D device mesh.  Because
every neighbor access in the dense engine is a shift of at most one x-plane
(the 27 window offsets span +-(gy*gz + gz + 1) linear cells = one plane plus
fringe), each device only needs a ONE-PLANE halo from each neighbor:

  1. ppermute the boundary x-plane of every packed array to the adjacent
     devices (bidirectional ring over ICI) — comm.SlabComm.lift;
  2. run the unchanged dense_ops sweeps on the locally extended slab;
  3. drop the halo columns (comm.lower); psum the solver-loop reductions.

Newton-mirror contributions that cross a slab boundary are recomputed by the
neighbor's halo-home rows, so the symmetric window ops stay exact.  The full
DFSPH step middle (divergence solver, viscosity PCG, vorticity, CFL,
pressure solver) runs under this decomposition via the communicator
abstraction (solvers/dfsph.py step_middle) and is verified against the
single-device step on an 8-virtual-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import dense_ops
from ..config import SimConfig
from ..grid import DenseGrid, build_grid, pack_liquid, unpack_liquid
from ..state import FluidState, StepDiagnostics
from .comm import AXIS, SlabComm, exchange_halo


def slab_config(cfg: SimConfig, n_devices: int) -> SimConfig:
    """Pad the domain so the grid x-resolution divides the device count."""
    gx, gy, gz = cfg.grid_res
    pad_planes = (-gx) % n_devices
    if pad_planes == 0:
        return cfg
    new_max = (cfg.domain_max[0] + pad_planes * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res[0] % n_devices == 0, (out.grid_res, n_devices)
    return out


def _ext_cfg(cfg: SimConfig, n: int) -> SimConfig:
    """Config describing the halo-extended local grid (gx/n + 2 planes)."""
    gx, gy, gz = cfg.grid_res
    gx_loc = gx // n + 2
    new_max = (cfg.domain_min[0] + (gx_loc - 0.5) * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res == (gx_loc, gy, gz), (out.grid_res, gx_loc)
    return out


def _make_slab_comm(pid, valid, liquid, xp, cfg: SimConfig, n: int) -> SlabComm:
    """Build the communicator for one slab inside shard_map: halo-extend the
    static grid arrays once, keep the local liquid mask for reductions.
    With cfg.use_pallas, the Mosaic sweep engine runs on the extended slab
    (SlabEngine adapter in parallel/comm.py)."""
    gx, gy, gz = cfg.grid_res
    plane = gy * gz
    slab = DenseGrid(pid=pid, valid=valid, liquid=liquid, xp=xp,
                     slot=jnp.zeros((1,), jnp.int32), overflow=jnp.int32(0))
    egrid = slab._replace(
        pid=exchange_halo(pid, plane, -1),
        valid=exchange_halo(valid, plane, False),
        liquid=exchange_halo(liquid, plane, False),
        xp=exchange_halo(xp, plane, 1e9),
    )
    ecfg = _ext_cfg(cfg, n)
    engine = None
    if cfg.use_pallas:
        from ..pallas.engine import SweepEngine

        engine = SweepEngine(egrid, ecfg)
    return SlabComm(slab, egrid, ecfg, plane, engine=engine)


def density_sharded(grid: DenseGrid, cfg: SimConfig, mesh: Mesh):
    """Packed density over an x-slab decomposition (the minimal demo of the
    halo pattern).  Returns (C, NC) densities sharded on the cell axis."""
    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS)),
             out_specs=P(None, AXIS), check_vma=False)
    def go(pid, valid, liquid, xp):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        return comm.lower(
            dense_ops.density_stats(comm.grid, comm.cfg, False).rho)

    return go(grid.pid, grid.valid, grid.liquid, grid.xp)


def pressure_solve_sharded(grid: DenseGrid, cfg: SimConfig, velp, kp,
                           alphap, rhop, dt, mesh: Mesh):
    """DFSPH constant-density solver under slab decomposition: the generic
    solver (solvers/dfsph.py pressure_solve) driven by a SlabComm — one halo
    exchange per window op, psum'd density error per iteration."""
    from ..solvers import dfsph

    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS),
                       P(None, AXIS), P(None, AXIS), P(None, AXIS)),
             out_specs=(P(None, None, AXIS), P(None, AXIS), P(), P()),
             check_vma=False)
    def go(pid, valid, liquid, xp, vel, k, alpha, rho):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        res = dfsph.pressure_solve(comm, vel, k, alpha, rho, dt)
        return res.vel, res.kappa, res.iters, res.err

    return go(grid.pid, grid.valid, grid.liquid, grid.xp,
              velp, kp, alphap, rhop)


def dfsph_step_sharded(state: FluidState, cfg: SimConfig, mesh: Mesh) -> FluidState:
    """Full DFSPH step with the solve phases under slab decomposition.

    The grid build / pack / unpack run as ordinary (globally sharded) jit
    ops; the window-sweep middle — density+alpha, divergence solver,
    viscosity PCG, vorticity, CFL, pressure solver — runs inside ONE
    shard_map with per-op halo exchanges and psum reductions.
    """
    from ..solvers import dfsph

    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"
    nl = state.n_liquid
    grid = build_grid(state.pos, nl, cfg)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS),
                       P(None, None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(), P()),
             out_specs=(P(None, None, AXIS), P(None, None, AXIS),
                        P(None, None, AXIS), P(None, AXIS), P(None, AXIS),
                        P(), P(), P(), P(), P(), P()),
             check_vma=False)
    def middle(pid, valid, liquid, xp, velp, omegap, vgp, kp, kvp, dt, last_pr):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        m = dfsph.step_middle(comm, cfg, velp, omegap, vgp, kp, kvp, dt,
                              last_pr)
        return (m.vel, m.omega, m.vel_guess, m.kappa, m.kappa_v, m.new_dt,
                m.div_iters, m.pr_iters, m.visc_iters, m.err, m.vmax_sq)

    (velp, omegap, vgp, kpo, kvpo, new_dt, dv_it, pr_it, vs_it, err,
     vmax_sq) = middle(
        grid.pid, grid.valid, grid.liquid, grid.xp,
        pack_liquid(grid, state.vel), pack_liquid(grid, state.omega),
        pack_liquid(grid, state.vel_guess), pack_liquid(grid, state.kappa),
        pack_liquid(grid, state.kappa_v), state.dt,
        state.last_pressure_iters)

    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * new_dt)
    diag = StepDiagnostics(
        divergence_iters=dv_it, pressure_iters=pr_it, viscosity_iters=vs_it,
        density_error=err, neighbor_overflow=grid.overflow,
        vel_max=jnp.sqrt(vmax_sq),
    )
    return state.replace(
        pos=pos, vel=vel,
        omega=unpack_liquid(grid, omegap, state.omega),
        vel_guess=unpack_liquid(grid, vgp, state.vel_guess),
        kappa=unpack_liquid(grid, kpo, state.kappa),
        kappa_v=unpack_liquid(grid, kvpo, state.kappa_v),
        dt=new_dt, time=state.time + new_dt,
        last_visc_iters=vs_it, last_pressure_iters=pr_it, diag=diag,
    )


def iisph_step_sharded(state: FluidState, cfg: SimConfig, mesh: Mesh) -> FluidState:
    """IISPH step with the whole solve middle under slab decomposition
    (density, viscosity PCG, advection coefficients, relaxed-Jacobi loop,
    pressure force), one halo exchange per lifted quantity per sweep."""
    from ..solvers import iisph

    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"
    nl = state.n_liquid
    grid = build_grid(state.pos, nl, cfg)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS),
                       P(None, AXIS), P()),
             out_specs=(P(None, None, AXIS), P(None, AXIS),
                        P(None, None, AXIS), P(), P(), P()),
             check_vma=False)
    def middle(pid, valid, liquid, xp, velp, vgp, pp, dt):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        m = iisph.step_middle(comm, cfg, velp, vgp, pp, dt)
        return m.vel, m.pressure, m.delta_v, m.iters, m.visc_iters, m.err

    velp, pp, dvp, iters, visc_iters, err = middle(
        grid.pid, grid.valid, grid.liquid, grid.xp,
        pack_liquid(grid, state.vel), pack_liquid(grid, state.vel_guess),
        pack_liquid(grid, state.pressure), state.dt)

    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * state.dt)
    diag = StepDiagnostics(
        pressure_iters=iters, viscosity_iters=visc_iters, density_error=err,
        neighbor_overflow=grid.overflow,
        vel_max=jnp.sqrt(jnp.max(jnp.sum(vel ** 2, axis=0))))
    return state.replace(
        pos=pos, vel=vel,
        pressure=unpack_liquid(grid, pp, state.pressure),
        vel_guess=unpack_liquid(grid, dvp, state.vel_guess),
        time=state.time + state.dt, diag=diag)


def pcisph_step_sharded(state: FluidState, cfg: SimConfig, mesh: Mesh) -> FluidState:
    """PCISPH step with the prediction loop under slab decomposition."""
    from ..solvers import pcisph

    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"
    nl = state.n_liquid
    grid = build_grid(state.pos, nl, cfg)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS), P()),
             out_specs=(P(None, None, AXIS), P(None, AXIS), P(), P()),
             check_vma=False)
    def middle(pid, valid, liquid, xp, velp, dt):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        m = pcisph.step_middle(comm, cfg, velp, dt)
        return m.vel, m.pressure, m.iters, m.err

    velp, pp, iters, err = middle(
        grid.pid, grid.valid, grid.liquid, grid.xp,
        pack_liquid(grid, state.vel), state.dt)

    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * state.dt)
    diag = StepDiagnostics(
        pressure_iters=iters, density_error=err,
        neighbor_overflow=grid.overflow,
        vel_max=jnp.sqrt(jnp.max(jnp.sum(vel ** 2, axis=0))))
    return state.replace(
        pos=pos, vel=vel,
        pressure=unpack_liquid(grid, pp, state.pressure),
        time=state.time + state.dt, diag=diag)


def sesph_step_sharded(state: FluidState, cfg: SimConfig, mesh: Mesh) -> FluidState:
    """SESPH step with the sweep middle under slab decomposition."""
    from ..solvers import sesph

    n = mesh.devices.size
    assert cfg.grid_res[0] % n == 0, "use slab_config() to pad the domain"
    nl = state.n_liquid
    grid = build_grid(state.pos, nl, cfg)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS), P()),
             out_specs=(P(None, None, AXIS), P(None, AXIS), P(None, AXIS)),
             check_vma=False)
    def middle(pid, valid, liquid, xp, velp, dt):
        comm = _make_slab_comm(pid, valid, liquid, xp, cfg, n)
        return sesph.step_middle(comm, cfg, velp, dt)

    velp, rhop, pp = middle(grid.pid, grid.valid, grid.liquid, grid.xp,
                            pack_liquid(grid, state.vel), state.dt)
    vel = unpack_liquid(grid, velp, state.vel)
    pos = state.pos.at[:, :nl].add(vel * state.dt)
    diag = StepDiagnostics(neighbor_overflow=grid.overflow,
                           vel_max=jnp.sqrt(jnp.max(jnp.sum(vel**2, axis=0))))
    return state.replace(pos=pos, vel=vel,
                         pressure=unpack_liquid(grid, pp, state.pressure),
                         time=state.time + state.dt, diag=diag)

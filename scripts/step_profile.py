"""Dev perf: phase-by-phase timing of the full DFSPH step at scale (TPU).

Times jitted PREFIXES of solvers/dfsph.step; successive differences give the
cost of each phase including everything XLA can't fuse across phase
boundaries.  Usage: python scripts/step_profile.py [side] [cap] [engine|xla]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu import dense_ops, viscosity
from wcsph_tpu.grid import build_grid, pack_liquid, unpack_liquid
from wcsph_tpu.parallel.comm import NoComm
from wcsph_tpu.solvers import dfsph

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 24
mode = sys.argv[3] if len(sys.argv) > 3 else "engine"

r = 0.025
spacing = 2 * r
sc = dam_break(particle_radius=r, fluid_dims=(side, side, side),
               box_extent=side * spacing * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=(mode == "engine"), cell_capacity=cap)
sim = Simulation(sc, cfg, solver="dfsph")
# settle a few steps so iteration counts are realistic
for _ in range(3):
    sim.step()
np.asarray(sim.state.pos.ravel()[0])
state = sim.state
print(f"n={state.n_total} liquid={state.n_liquid} grid={cfg.grid_res} "
      f"cap={cap} mode={mode}", file=sys.stderr)


def make_prefix(depth: int):
    def fn(state):
        nl = state.n_liquid
        grid = build_grid(state.pos, nl, cfg)
        if depth == 0:
            return grid.xp
        from wcsph_tpu.grid import pack_liquid_many
        packed = pack_liquid_many(grid, [state.vel, state.omega,
                                         state.vel_guess, state.kappa,
                                         state.kappa_v])
        if depth == 1:
            return packed
        eng = None
        if cfg.use_pallas:
            from wcsph_tpu.pallas.engine import PaddedEngine, SweepEngine
            from wcsph_tpu.parallel.comm import PaddedNoComm
            eng = PaddedEngine(SweepEngine(grid, cfg))
            comm = PaddedNoComm(grid, cfg, engine=eng)
            packed = [eng.pad_state(x) for x in packed]
        else:
            comm = NoComm(grid, cfg)
        velp, omegap, vgp, kp, kvp = packed
        if depth == 2:
            if eng is None:
                return packed
            return (eng.xp_pad, eng.vol_pad, eng.liq_pad, eng.sol_pad,
                    eng.act_any, eng.nz_any) + tuple(packed)
        dt = state.dt
        if comm.engine is not None:
            rhop, alphap, cntp = comm.engine.density_alpha()
        else:
            stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
            rhop, alphap, cntp = (comm.lower(stats.rho),
                                  comm.lower(stats.alpha),
                                  comm.lower(stats.count))
        if depth == 3:
            return rhop, alphap, cntp
        div = dfsph.divergence_solve(comm, velp, kvp, alphap, cntp, dt)
        velp2 = div.vel
        if depth == 4:
            return velp2, div.kappa, div.iters
        gvec = jnp.asarray(cfg.gravity, jnp.float32).reshape(
            (3,) + (1,) * (velp2.ndim - 1))
        d_vel = jnp.broadcast_to(gvec, velp2.shape)
        visc = viscosity.solve_dense(comm, velp2, vgp, rhop, dt)
        d_vel = d_vel + (visc.vel_new - velp2) / dt
        if depth == 5:
            return d_vel, visc.iters
        if cfg.enable_vorticity:
            if comm.engine is not None:
                dv_vort, omegap = comm.engine.vorticity(velp2, omegap, rhop,
                                                        cntp, dt)
            else:
                dv_vort, omegap = dense_ops.vorticity_comm(comm, velp2,
                                                           omegap, rhop, dt)
            d_vel = d_vel + dv_vort
        if depth == 6:
            return d_vel, omegap
        vnew = velp2 + d_vel * dt
        vmax_sq = jnp.maximum(comm.lmax(jnp.sum(vnew * vnew, axis=0)), 0.1)
        feedback = jnp.maximum(visc.iters, state.last_pressure_iters)
        time_step = jnp.clip(
            cfg.cfl_factor * 0.4 * 2.0 * cfg.particle_radius
            / jnp.sqrt(vmax_sq), cfg.dt_min, cfg.dt_max)
        new_dt = jnp.where(feedback > 10, dt * 0.9,
                           jnp.where(feedback < 5, dt * 1.1, dt))
        new_dt = jnp.minimum(new_dt, time_step)
        velp3 = velp2 + d_vel * new_dt
        pr = dfsph.pressure_solve(comm, velp3, kp, alphap, rhop, new_dt)
        if depth == 7:
            return pr.vel, pr.kappa, pr.iters
        mids = [pr.vel, omegap, visc.delta_v, pr.kappa, div.kappa]
        prevs = [state.vel, state.omega, state.vel_guess, state.kappa,
                 state.kappa_v]
        if eng is not None:
            outs = eng.unpack_many(mids, prevs)
        else:
            from wcsph_tpu.grid import unpack_liquid_many
            outs = unpack_liquid_many(grid, mids, prevs)
        pos = state.pos.at[:, :nl].add(outs[0] * new_dt)
        return (pos,) + tuple(outs)
    return fn


NAMES = ["build_grid", "+pack x5", "+pad state/masks", "+density_alpha",
         "+divergence_solve", "+viscosity", "+vorticity", "+pressure_solve",
         "+unpack/update (full)"]

prev = 0.0
for depth in range(9):
    f = jax.jit(make_prefix(depth))
    t0 = time.time()
    out = f(state)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])
    compile_s = time.time() - t0
    n = 8
    t0 = time.time()
    for _ in range(n):
        out = f(state)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])
    ms = (time.time() - t0) / n * 1e3
    print(f"{NAMES[depth]:28s} cum {ms:8.2f} ms   delta {ms - prev:8.2f} ms"
          f"   (compile {compile_s:.0f}s)")
    prev = ms

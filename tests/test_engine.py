"""Differential tests: pallas sweep engine (interpret mode) vs dense_ops.

The engine (wcsph_tpu/pallas/engine.py) is the TPU hot path at scale; these
tests pin every op to its XLA twin on small scenes, including capacities
above one rank block and scenes with overflowing cells.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dam_break, dense_ops
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid
from wcsph_tpu.pallas.engine import SweepEngine
from wcsph_tpu.utils import mat3


def _setup(cap=16, side=6, seed=0, jitter=0.0):
    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(side, side, side),
                   box_extent=side * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi,
                    cell_capacity=cap)
    rng = np.random.RandomState(seed)
    pos = sc.positions.T.copy()
    if jitter:
        pos += rng.randn(*pos.shape).astype(np.float32) * jitter
    grid = build_grid(jnp.asarray(pos), sc.n_liquid, cfg)
    eng = SweepEngine(grid, cfg, interpret=True)
    velp = jnp.where(grid.liquid[None],
                     jnp.asarray(rng.randn(3, *grid.pid.shape), jnp.float32),
                     0.0)
    kp = jnp.where(grid.liquid,
                   jnp.asarray(rng.randn(*grid.pid.shape), jnp.float32), 0.0)
    return cfg, grid, eng, velp, kp


def _close(a, b, where=None, rtol=3e-5):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d = jnp.abs(a - b)
    if where is not None:
        d = jnp.where(where, d, 0.0)
    scale = max(float(jnp.max(jnp.abs(a))), 1.0)
    assert float(jnp.max(d)) <= rtol * scale, (
        float(jnp.max(d)), scale)


@pytest.mark.parametrize("cap,jitter", [(16, 0.0), (24, 0.004)])
def test_density_alpha_matches(cap, jitter):
    cfg, grid, eng, _, _ = _setup(cap=cap, jitter=jitter)
    stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
    rho, alpha, cnt = eng.density_alpha()
    v = grid.valid
    _close(jnp.where(v, stats.rho, 0), jnp.where(v, rho, 0))
    _close(jnp.where(v, stats.alpha, 0), jnp.where(v, alpha, 0))
    assert int(jnp.max(jnp.abs(jnp.where(v, stats.count - cnt, 0)))) == 0


def test_kappa_and_div_match():
    cfg, grid, eng, velp, kp = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    v1 = dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt)
    v2 = eng.kappa_velocity_update(velp, kp, dt)
    _close(jnp.where(liq[None], v1, 0), jnp.where(liq[None], v2, 0))
    d1 = dense_ops._div_accum(grid, cfg, velp)
    d2 = eng.div_accum(velp)
    _close(jnp.where(liq, d1, 0), jnp.where(liq, d2, 0))


def test_viscosity_ops_match():
    cfg, grid, eng, velp, _ = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    rhop = dense_ops.density_stats(grid, cfg, with_alpha=False).rho
    rho_pad = dense_ops.WindowLoop(grid, cfg).pad(rhop, 1.0)
    m1 = dense_ops.visc_matvec(grid, cfg, velp, rhop, rho_pad, dt)
    m2 = eng.visc_matvec(velp, rhop, dt)
    _close(jnp.where(liq[None], m1, 0), jnp.where(liq[None], m2, 0))
    minv1, ax1 = dense_ops.visc_init(grid, cfg, velp, rhop, rho_pad, dt)
    minv2, ax2 = eng.visc_init(velp, rhop, dt)
    for f in mat3.Sym3._fields:
        _close(jnp.where(liq, getattr(minv1, f), 0),
               jnp.where(liq, getattr(minv2, f), 0))
    _close(jnp.where(liq[None], ax1, 0), jnp.where(liq[None], ax2, 0))


def test_vorticity_matches():
    cfg, grid, eng, velp, _ = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    stats = dense_ops.density_stats(grid, cfg, with_alpha=False)
    omp = velp * 0.1
    dv1, om1 = dense_ops.vorticity(grid, cfg, velp, omp, stats.rho, dt)
    dv2, om2 = eng.vorticity(velp, omp, stats.rho, stats.count, dt)
    _close(jnp.where(liq[None], dv1, 0), jnp.where(liq[None], dv2, 0))
    _close(jnp.where(liq[None], om1, 0), jnp.where(liq[None], om2, 0))


def test_engine_step_matches_xla_step():
    """One full DFSPH step with the engine == one step without (tolerance)."""
    from wcsph_tpu.solvers import dfsph
    from wcsph_tpu.state import init_state

    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(6, 6, 6),
                   box_extent=6 * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg_x = dfsph.default_config(particle_radius=r, domain_min=lo,
                                 domain_max=hi, cell_capacity=16)
    cfg_e = cfg_x.replace(use_pallas=True)
    s_x = dfsph.step(init_state(sc, cfg_x), cfg_x)
    s_e = dfsph.step(init_state(sc, cfg_e), cfg_e)
    assert int(s_x.diag.pressure_iters) == int(s_e.diag.pressure_iters)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_e.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_e.vel),
                               atol=1e-4)


def test_sesph_force_matches():
    """Fused explicit-viscosity + Tait-pressure sweep vs the XLA twins."""
    from wcsph_tpu import ops as wops

    cfg, grid, eng, velp, _ = _setup(cap=16, jitter=0.002)
    stats = dense_ops.density_stats(grid, cfg, with_alpha=False)
    rhop, pp = wops.tait_pressure(stats.rho, cfg)
    acc_x = (dense_ops.explicit_viscosity_accel(grid, cfg, velp, rhop)
             + dense_ops.pressure_accel_symmetric(grid, cfg, rhop, pp))
    acc_e = eng.sesph_force(velp, rhop, pp)
    liq = grid.liquid
    _close(jnp.where(liq[None], acc_e, 0), jnp.where(liq[None], acc_x, 0),
           rtol=2e-4)


@pytest.mark.parametrize("solver", ["sesph", "pcisph", "iisph"])
def test_solver_step_engine_matches_xla(solver):
    """Full engine-path steps for the newly engine-ized solvers must
    reproduce the XLA-path trajectories."""
    import dataclasses

    from wcsph_tpu.simulation import Simulation, default_config
    from wcsph_tpu import dam_break as mk

    r = 0.025
    sc = mk(particle_radius=r, fluid_dims=(6, 6, 6), box_extent=0.7)
    lo, hi = sc.domain(pad=4 * r)
    out = {}
    for use_pallas in (False, True):
        cfg = default_config(solver, particle_radius=r, domain_min=lo,
                             domain_max=hi, use_pallas=use_pallas)
        sim = Simulation(sc, cfg, solver=solver)
        sim.run(3)
        out[use_pallas] = sim
    px = np.asarray(out[False].state.pos)
    pe = np.asarray(out[True].state.pos)
    np.testing.assert_allclose(pe, px, rtol=2e-4, atol=1e-6)
    vx = np.asarray(out[False].state.vel)
    ve = np.asarray(out[True].state.vel)
    np.testing.assert_allclose(ve, vx, rtol=2e-3, atol=1e-5)
    if solver in ("pcisph", "iisph"):
        assert int(out[True].state.diag.pressure_iters) == \
            int(out[False].state.diag.pressure_iters)

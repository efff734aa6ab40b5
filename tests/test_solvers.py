"""End-to-end solver tests on a small dam-break: stability (no NaN),
containment, solver invariants (density error below tolerance after solve),
and momentum symmetry of pressure forces (SURVEY.md §4 items c/d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import ops, scene
from wcsph_tpu.config import SimConfig
from wcsph_tpu.neighbors import build_neighbors
from wcsph_tpu.simulation import Simulation, default_config

R = 0.025
FLUID = (5, 5, 5)
BOX = 0.55


def _make(solver, **overrides):
    sc = scene.dam_break(particle_radius=R, fluid_dims=FLUID, box_extent=BOX)
    lo, hi = sc.domain(pad=4 * R)
    cfg = default_config(solver, particle_radius=R, domain_min=lo, domain_max=hi,
                         **overrides)
    return Simulation(sc, cfg, solver=solver)


@pytest.mark.parametrize("solver", ["sesph", "pcisph", "iisph", "dfsph"])
def test_dam_break_stable_and_contained(solver):
    sim = _make(solver)
    sim.run(15)
    sim.check_health()
    pos = sim.liquid_positions()
    assert np.all(np.isfinite(pos))
    # fluid stays inside the box (with a small tolerance for wall softness)
    assert np.all(np.abs(pos) < 0.5 * BOX + 4 * R), pos.min(axis=0)
    assert int(sim.state.diag.neighbor_overflow) == 0


def test_dfsph_density_error_below_tolerance():
    sim = _make("dfsph")
    for _ in range(10):
        sim.step()
    t = sim.telemetry()
    # pressure solve exits when avg density error <= 0.1% (dfsph.py:160)
    assert t["density_error"] <= sim.cfg.dfsph_tol + 1e-6
    assert 2 <= t["pressure_iters"] <= sim.cfg.dfsph_max_iters
    assert 1 <= t["divergence_iters"] <= sim.cfg.dfsph_div_max_iters
    assert t["viscosity_iters"] >= 1
    assert sim.cfg.dt_min <= t["dt"] <= sim.cfg.dt_max


def test_dfsph_fluid_settles():
    # After many steps the dam-break fluid should lose most kinetic energy
    sim = _make("dfsph")
    sim.run(80)
    sim.check_health()
    vel = np.asarray(sim.state.vel)  # planar (3, NL)
    ke = 0.5 * float(np.mean(np.sum(vel**2, axis=0)))
    assert ke < 5.0  # bounded vs free-fall/explosion KE >> 10


def test_pressure_force_momentum_symmetric():
    # isolated liquid blob (no boundary): symmetric pressure forces sum to ~0
    sc_builder = scene.SceneBuilder()
    sc_builder.add_liquid_block((5, 5, 5), 2 * R, (-5 * R, -5 * R, -5 * R))
    sc = sc_builder.build()
    lo, hi = sc.domain(pad=4 * R)
    cfg = SimConfig(particle_radius=R, domain_min=lo, domain_max=hi)
    nl = sc.n_liquid
    pos = jnp.asarray(sc.positions.T)
    nbr = build_neighbors(pos, nl, cfg)
    pairs = ops.precompute_pairs(pos, nbr, nl, cfg)
    rho = ops.density(pairs, cfg)
    rho_c, p = ops.tait_pressure(rho, cfg)
    acc = np.asarray(ops.pressure_accel_symmetric(pairs, rho_c, p, cfg, nl))
    total = np.abs(acc.sum(axis=1))
    scale = np.abs(acc).sum()
    assert np.all(total < 1e-4 * scale + 1e-3)


def test_sesph_density_near_rest_at_rest():
    # a resting fluid block's density should be within a few % of rho0 in the
    # interior (kernel-sum sanity; deficiencies only at the free surface)
    sc_builder = scene.SceneBuilder()
    sc_builder.add_liquid_block((10, 10, 10), 2 * R, (0, 0, 0))
    sc = sc_builder.build()
    lo, hi = sc.domain(pad=4 * R)
    cfg = SimConfig(particle_radius=R, domain_min=lo, domain_max=hi)
    pos = jnp.asarray(sc.positions.T)
    nbr = build_neighbors(pos, sc.n_liquid, cfg)
    pairs = ops.precompute_pairs(pos, nbr, sc.n_liquid, cfg)
    rho = np.asarray(ops.density(pairs, cfg))
    interior = rho[np.asarray(nbr.count) >= 30]
    assert interior.size > 0
    # V0 = 0.8 (2r)^3 (ParticleData.py:20) makes the lattice kernel sum
    # evaluate to ~0.8 rho0 in the interior — the reference clamps rho >= rho0
    # (sesph.py:161) to compensate. Verify the kernel-sum itself.
    np.testing.assert_allclose(interior, 800.0, rtol=0.05)

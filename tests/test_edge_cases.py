"""Edge cases: isolated particles, escapees, liquid-only scenes, tiny grids.

The reference handles these with runtime prints and crashes (SURVEY.md §4);
here they must be silent and finite."""

import jax.numpy as jnp
import numpy as np

from wcsph_tpu import dense_ops, scene
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid
from wcsph_tpu.simulation import Simulation, default_config

R = 0.025


def test_single_particle_free_fall():
    b = scene.SceneBuilder()
    b.add_liquid_point((0.0, 0.0, 0.0))
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-0.3, -0.3, -0.3),
                         domain_max=(0.3, 0.3, 0.3))
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(8)
    pos = sim.liquid_positions()
    assert np.isfinite(pos).all()
    # free fall: y decreased, x/z unchanged
    assert pos[0, 1] < -1e-5
    assert abs(pos[0, 0]) < 1e-6 and abs(pos[0, 2]) < 1e-6


def test_particles_leaving_domain_stay_finite():
    # no boundary at all: the block falls out of the (small) domain box;
    # out-of-domain particles drop out of the grid (reference check_in_box
    # skip, HashGrid.py:58-66) and keep free-falling without NaNs.
    b = scene.SceneBuilder()
    b.add_liquid_block((4, 4, 4), 2 * R, (0, 0, 0))
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-0.2, -0.2, -0.2),
                         domain_max=(0.4, 0.4, 0.4))
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(60)
    pos = sim.liquid_positions()
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() < -0.3   # fell below the domain


def test_liquid_only_scene_all_solvers():
    b = scene.SceneBuilder()
    b.add_liquid_block((4, 4, 4), 2 * R, (0, 0, 0))
    sc = b.build()
    lo, hi = sc.domain(pad=0.3)
    for solver in ("sesph", "pcisph", "iisph", "dfsph"):
        cfg = default_config(solver, particle_radius=R,
                             domain_min=lo, domain_max=hi)
        sim = Simulation(sc, cfg, solver=solver)
        sim.run(5)
        assert np.isfinite(sim.liquid_positions()).all(), solver


def test_solid_only_scene_is_static():
    b = scene.SceneBuilder()
    b.add_liquid_point((0.0, 10.0, 0.0))   # one faraway liquid (state shape)
    b.add_box_shell(0.4, 2 * R)
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-0.3, -0.3, -0.3),
                         domain_max=(0.3, 0.3, 0.3))
    sim = Simulation(sc, cfg, solver="dfsph")
    before = sim.positions()[1:]
    sim.run(5)
    after = sim.positions()[1:]
    np.testing.assert_array_equal(before, after)   # solids never move


def test_coincident_particles_finite():
    # two particles at the same position: gradW(0) = 0, W(0) finite
    b = scene.SceneBuilder()
    b.add_liquid_point((0.0, 0.0, 0.0))
    b.add_liquid_point((0.0, 0.0, 0.0))
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-0.5, -0.5, -0.5),
                         domain_max=(0.5, 0.5, 0.5))
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(5)
    assert np.isfinite(sim.liquid_positions()).all()


def test_overflow_counter_and_survival():
    # 100 coincident particles overflow cell capacity; the step must stay
    # finite and report the overflow (reference prints "exceed grid")
    b = scene.SceneBuilder()
    for _ in range(100):
        b.add_liquid_point((0.0, 0.0, 0.0))
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-0.5, -0.5, -0.5),
                         domain_max=(0.5, 0.5, 0.5))
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.step()
    t = sim.telemetry()
    assert t["neighbor_overflow"] > 0
    assert np.isfinite(sim.liquid_positions()).all()

"""Golden-trajectory regression tests (SURVEY.md §4 item d), all four solvers.

A fixed dam-break scene stepped a fixed number of times must reproduce the
committed golden trajectory within a float32 tolerance band.  Regenerate
with:  python tests/test_golden.py   (writes tests/golden/<solver>_golden.npz)
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
STEPS = 20
SOLVERS = ["dfsph", "sesph", "pcisph", "iisph"]


def _run(solver: str):
    from wcsph_tpu import scene
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = scene.dam_break(particle_radius=r, fluid_dims=(5, 5, 5),
                         box_extent=0.55)
    lo, hi = sc.domain(pad=4 * r)
    cfg = default_config(solver, particle_radius=r, domain_min=lo,
                         domain_max=hi)
    sim = Simulation(sc, cfg, solver=solver)
    sim.run(STEPS)
    return sim


@pytest.mark.parametrize("solver", SOLVERS)
def test_golden_trajectory(solver):
    path = os.path.join(GOLDEN_DIR, f"{solver}_golden.npz")
    assert os.path.exists(path), "run `python tests/test_golden.py` to create"
    ref = np.load(path)
    sim = _run(solver)
    pos = np.asarray(sim.state.pos)
    vel = np.asarray(sim.state.vel)
    # tolerance band, not bitwise: XLA fusion choices may vary across
    # versions; the trajectory itself must not drift
    np.testing.assert_allclose(pos, ref["pos"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(vel, ref["vel"], rtol=2e-3, atol=2e-4)
    assert abs(float(sim.state.dt) - float(ref["dt"])) < 1e-6
    if solver != "sesph":
        assert int(sim.state.diag.pressure_iters) == int(ref["pressure_iters"])


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for solver in SOLVERS:
        sim = _run(solver)
        path = os.path.join(GOLDEN_DIR, f"{solver}_golden.npz")
        np.savez_compressed(
            path,
            pos=np.asarray(sim.state.pos),
            vel=np.asarray(sim.state.vel),
            dt=float(sim.state.dt),
            pressure_iters=int(sim.state.diag.pressure_iters),
        )
        print(f"wrote {path}")

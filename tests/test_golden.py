"""Golden-trajectory regression test (SURVEY.md §4 item d).

A fixed dam-break scene stepped a fixed number of times must reproduce the
committed reference trajectory within a float32 tolerance band.  Regenerate
with:  python tests/test_golden.py  (writes tests/golden/dfsph_golden.npz).
"""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dfsph_golden.npz")
STEPS = 20


def _run():
    from wcsph_tpu import scene
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = scene.dam_break(particle_radius=r, fluid_dims=(5, 5, 5),
                         box_extent=0.55)
    lo, hi = sc.domain(pad=4 * r)
    cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                         domain_max=hi)
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(STEPS)
    return sim


def test_dfsph_golden_trajectory():
    assert os.path.exists(GOLDEN), "run `python tests/test_golden.py` to create"
    ref = np.load(GOLDEN)
    sim = _run()
    pos = np.asarray(sim.state.pos)
    vel = np.asarray(sim.state.vel)
    # tolerance band, not bitwise: XLA fusion choices may vary across
    # versions; the trajectory itself must not drift
    np.testing.assert_allclose(pos, ref["pos"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(vel, ref["vel"], rtol=2e-3, atol=2e-4)
    assert abs(float(sim.state.dt) - float(ref["dt"])) < 1e-6
    assert int(sim.state.diag.pressure_iters) == int(ref["pressure_iters"])


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    sim = _run()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(
        GOLDEN,
        pos=np.asarray(sim.state.pos),
        vel=np.asarray(sim.state.vel),
        dt=float(sim.state.dt),
        pressure_iters=int(sim.state.diag.pressure_iters),
    )
    print(f"wrote {GOLDEN}")

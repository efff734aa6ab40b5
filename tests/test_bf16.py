"""pair_dtype=bfloat16 experiment path stays functional (dense_ops casts
pair products to bf16 with f32 accumulation; see SimConfig.pair_dtype).
Measured verdict on TPU (scripts/bf16_experiment.py): ~1.0x speed, small
accuracy cost — f32 stays the default; this test keeps the option working."""

import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config


def test_bf16_pair_math_runs_and_stays_close():
    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(6, 6, 6), box_extent=0.7)
    lo, hi = sc.domain(pad=4 * r)
    sims = {}
    for dtype in ("float32", "bfloat16"):
        cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                             domain_max=hi, pair_dtype=dtype)
        sim = Simulation(sc, cfg, solver="dfsph")
        sim.run(10)
        sim.check_health()
        sims[dtype] = sim
    p32 = np.asarray(sims["float32"].state.pos)
    pbf = np.asarray(sims["bfloat16"].state.pos)
    # bf16 pair terms carry ~0.4% relative error; after 10 steps the
    # trajectories must still agree to a fraction of a particle radius
    assert np.abs(pbf - p32).max() < 0.2 * r
    tel = sims["bfloat16"].telemetry()
    assert tel["density_error"] < 5e-3

"""bf16 pair-math experiment on the HBM-bound XLA sweep path (TPU).

Runs the same DFSPH dam-break with cfg.pair_dtype float32 vs bfloat16 and
reports step time, solver telemetry, and trajectory deviation.
  python scripts/bf16_experiment.py [side] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

side = int(sys.argv[1]) if len(sys.argv) > 1 else 70
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15

r = 0.025
results = {}
for dtype in ("float32", "bfloat16"):
    sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
                   box_extent=side * 2 * r * 1.35)
    lo, hi = sc.domain(pad=6 * r)
    cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                         domain_max=hi, use_pallas=False,
                         pair_dtype=dtype)
    sim = Simulation(sc, cfg, solver="dfsph")
    for _ in range(3):
        sim.step()
    np.asarray(sim.state.pos.ravel()[0])
    t0 = time.time()
    for _ in range(steps):
        sim.step()
    np.asarray(sim.state.pos.ravel()[0])
    el = (time.time() - t0) / steps
    sim.check_health()
    tel = sim.telemetry()
    results[dtype] = (el, tel, np.asarray(sim.state.pos),
                      np.asarray(sim.state.vel))
    print(f"{dtype:10s} step {el * 1e3:8.1f} ms  "
          f"{sim.state.n_liquid / el:.3e} particle-steps/s  tel={tel}")

p32, pbf = results["float32"][2], results["bfloat16"][2]
v32, vbf = results["float32"][3], results["bfloat16"][3]
dp = np.abs(pbf - p32)
dv = np.abs(vbf - v32)
print(f"pos  deviation after {steps + 3} steps: max {dp.max():.3e}  "
      f"mean {dp.mean():.3e}  (particle radius {r})")
print(f"vel  deviation: max {dv.max():.3e}  mean {dv.mean():.3e}")
print(f"speedup: {results['float32'][0] / results['bfloat16'][0]:.2f}x")

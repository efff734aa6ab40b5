"""Dev perf: per-cell occupancy split by phase (liquid vs solid) over the
1M bench scene's fall+impact — the design gate for the liquid/solid
split-grid (ROADMAP round-4): a static solid grid plus a dynamic
liquid-only grid at C=16 is sound only if the LIQUID-only per-cell
occupancy stays <= 16 through the impact.

  python scripts/occupancy_probe.py [side] [steps] [every]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wcsph_tpu import dam_break
from wcsph_tpu.grid import cell_of_positions
from wcsph_tpu.simulation import Simulation, default_config

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
every = int(sys.argv[3]) if len(sys.argv) > 3 else 5
r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24)
sim = Simulation(sc, cfg, solver="dfsph")
nl = sim.state.n_liquid


@jax.jit
def occ_stats(pos):
    nc = cfg.num_cells
    cell, inbox = cell_of_positions(pos, cfg)
    cell = jnp.where(inbox, cell, nc)
    liq = jnp.zeros((nc + 1,), jnp.int32).at[cell[:nl]].add(1)[:nc]
    sol = jnp.zeros((nc + 1,), jnp.int32).at[cell[nl:]].add(1)[:nc]
    both = liq + sol
    return (jnp.max(liq), jnp.sum(liq > 16), jnp.sum(liq > 24),
            jnp.max(sol), jnp.max(both), jnp.sum(both > 16),
            jnp.sum(both > 24))


print(f"n_liquid={nl} grid={cfg.grid_res}", flush=True)
t0 = time.time()
for i in range(steps):
    sim.step()
    if i % every == 0 or i == steps - 1:
        ml, nl16, nl24, ms, mb, nb16, nb24 = [
            int(x) for x in occ_stats(sim.state.pos)]
        tel = sim.telemetry()
        print(f"step {i:4d} t={tel['time']:.3f} dt={tel['dt']:.1e} "
              f"liq: max {ml:3d} cells>16 {nl16:6d} >24 {nl24:5d} | "
              f"solid max {ms:3d} | both: max {mb:3d} >16 {nb16:6d} "
              f">24 {nb24:5d} | vmax {tel['vel_max']:.2f}", flush=True)
print(f"done in {time.time() - t0:.0f}s", flush=True)

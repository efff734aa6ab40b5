"""Dev perf: separate per-DISPATCH cost from per-THUNK launch gaps on the
remote-TPU platform.  Times the resident step as (a) N separate jitted
dispatches, (b) one lax.scan program of N steps.  If (b) << (a), the wall
overhead is per-dispatch (tunnel RTT / enqueue); if (b) ~= (a), it is
per-thunk inside the program and only op-count reduction helps.
Usage: python scripts/dispatch_probe.py [side] [nscan]
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
from wcsph_tpu.simulation import Simulation, default_config

side = int(sys.argv[1]) if len(sys.argv) > 1 else 47
nscan = int(sys.argv[2]) if len(sys.argv) > 2 else 5
r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24, resident=True)
sim = Simulation(sc, cfg, solver="dfsph")
step_fn = sim._solver.step_resident
nl = sim.state.n_liquid
print(f"n_liquid={nl}", file=sys.stderr)


def sync(rs):
    np.asarray(rs.grid.xp.ravel()[0])


# (a) N separate dispatches
one = jax.jit(lambda rs: step_fn(rs, cfg), donate_argnums=0)
rs = sim._rs
t0 = time.time()
rs = one(rs)
sync(rs)
print(f"single-step compile+1st: {time.time() - t0:.1f}s", file=sys.stderr)
for rep in range(3):
    t0 = time.time()
    for _ in range(nscan):
        rs = one(rs)
    sync(rs)
    dt_a = time.time() - t0
    print(f"(a) {nscan} dispatches: {dt_a:.3f}s "
          f"({dt_a / nscan * 1e3:.1f} ms/step, "
          f"{nl * nscan / dt_a:.3e} psteps/s)")


# (b) one scan program of N steps
@jax.jit
def scan_steps(rs):
    def body(s, _):
        return step_fn(s, cfg), None
    out, _ = jax.lax.scan(body, rs, None, length=nscan)
    return out

t0 = time.time()
rs2 = scan_steps(rs)
sync(rs2)
print(f"scan compile+1st: {time.time() - t0:.1f}s", file=sys.stderr)
rs = rs2
for rep in range(3):
    t0 = time.time()
    rs = scan_steps(rs)
    sync(rs)
    dt_b = time.time() - t0
    print(f"(b) scan({nscan}): {dt_b:.3f}s "
          f"({dt_b / nscan * 1e3:.1f} ms/step, "
          f"{nl * nscan / dt_b:.3e} psteps/s)")

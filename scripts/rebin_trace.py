"""Dev perf: op-level device trace of ONE jitted rebin_incremental at scale.

  python scripts/rebin_trace.py [side]
"""
import collections
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100

from wcsph_tpu import dam_break, resident
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu.pallas.engine import make_plan

r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24, resident=True)
sim = Simulation(sc, cfg, solver="dfsph")
for _ in range(4):
    sim.step()
rs = sim._rs
np.asarray(rs.grid.xp.ravel()[0])
plan = make_plan(cfg, cfg.cell_capacity)
n = rs.grid.slot.shape[0]
budget = max(1024, int(n * cfg.resident_mover_frac))

steps = 4
g = jax.jit(lambda gr, d, s: resident.rebin_incremental(
    plan, cfg, gr, d, s, budget))
out = g(rs.grid, rs.dyn, rs.side)
np.asarray(out[0].pid.ravel()[0])

tracedir = tempfile.mkdtemp(prefix="rebin_trace_")
t0 = time.time()
with jax.profiler.trace(tracedir):
    for _ in range(steps):
        out = g(rs.grid, rs.dyn, rs.side)
    np.asarray(out[0].pid.ravel()[0])
wall = (time.time() - t0) / steps
print(f"wall {wall * 1e3:.1f} ms/call over {steps} calls", file=sys.stderr)

from xprof.convert import raw_to_tool_data as rtd

paths = glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb")
data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
if isinstance(data, bytes):
    data = data.decode()
tab = json.loads(data)[0]
cols = [c["id"] for c in tab["cols"]]
rows = [[c["v"] for c in r["c"]] for r in tab["rows"]]
i = {k: cols.index(k) for k in ("host_or_device", "operation",
                                "occurrences", "total_self_time")}
dev = sorted((r for r in rows if r[i["host_or_device"]] == "Device"),
             key=lambda r: -r[i["total_self_time"]])
print(f"{'ms/call':>9} {'n/call':>7}  op   (device self time)")
total = 0.0
for r in dev[:25]:
    ms = r[i["total_self_time"]] / 1e3 / steps
    total += ms
    print(f"{ms:9.2f} {r[i['occurrences']] / steps:7.1f}  "
          f"{str(r[i['operation']])[:90]}")
rest = sum(r[i["total_self_time"]] for r in dev[25:]) / 1e3 / steps
print(f"{rest:9.2f}          (all other ops)")
print(f"{total + rest:9.2f}          device total  "
      f"(wall {wall * 1e3:.1f})")

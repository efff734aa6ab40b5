"""Dev perf: count executed-op (thunk) instructions in the compiled resident
step.  On the remote-TPU (axon) platform each device op launch carries a
fixed gap (~0.1-0.2 ms measured in traces), so wall - device_total scales
with the number of ops EXECUTED per step — loop bodies count once per
iteration.  Usage:
    python scripts/hlo_count.py [side] [solver]
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config

side = int(sys.argv[1]) if len(sys.argv) > 1 else 47
solver = sys.argv[2] if len(sys.argv) > 2 else "dfsph"
r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config(solver, particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24, resident=True)
sim = Simulation(sc, cfg, solver=solver)
step_fn = sim._solver.step_resident
lowered = jax.jit(lambda rs: step_fn(rs, cfg)).lower(sim._rs)
compiled = lowered.compile()
txt = compiled.as_text()

# Parse optimized HLO: instructions per computation, flag fusions/custom
# calls/scatters/gathers (each ≈ one thunk); elementwise ops inside a fusion
# are free.  Loop-body computations execute once per iteration.
comp = None
counts = collections.Counter()           # (computation, opkind) -> count
comp_insts = collections.Counter()       # computation -> thunk-ish ops
THUNK_OPS = ("fusion", "custom-call", "scatter", "gather", "sort", "copy",
             "while", "conditional", "all-reduce", "dynamic-slice",
             "dynamic-update-slice", "reduce", "transpose", "convert",
             "broadcast", "iota", "bitcast", "concatenate", "slice", "pad",
             "reshape", "dot", "convolution", "rng", "select-and-scatter")
for line in txt.splitlines():
    m = re.match(r"^(%?[\w\.\-]+)\s*(\([^)]*\))?\s*(->|\{)", line)
    if line.startswith(("ENTRY", "%")) and "{" in line and "=" not in line:
        name = line.split()[0 if not line.startswith("ENTRY") else 1]
        comp = name.lstrip("%")
        continue
    ls = line.strip()
    m2 = re.match(r"^(ROOT\s+)?%?[\w\.\-]+\s*=\s*\S+\s+([a-z][\w\-]*)\(", ls)
    if m2 and comp:
        kind = m2.group(2)
        counts[(comp, kind)] += 1
        comp_insts[comp] += 1

entry = [c for c in comp_insts if "main" in c or "entry" in c.lower()]
print(f"computations: {len(comp_insts)}  (side={side} solver={solver})")
top = sorted(comp_insts.items(), key=lambda kv: -kv[1])[:25]
for c, n in top:
    kinds = collections.Counter(
        {k: v for (cc, k), v in counts.items() if cc == c})
    hot = ", ".join(f"{k}:{v}" for k, v in kinds.most_common(6))
    print(f"{n:6d}  {c[:60]:60s} {hot}")

tot = sum(comp_insts.values())
kind_tot = collections.Counter()
for (c, k), v in counts.items():
    kind_tot[k] += v
print(f"\ntotal instructions (all computations): {tot}")
print("by kind:", dict(kind_tot.most_common(20)))

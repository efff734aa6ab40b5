"""Dev perf: compiled-HLO op census of the resident step.  On the
remote-TPU (axon) platform every executed thunk pays a launch/tunnel gap
(trace at 1M: 176 ms of a 426 ms wall), so the census prints (a) instruction
counts per computation (loop bodies execute once per iteration), (b) the
largest non-fusion data-movement ops (transpose/copy/reshape/scatter/gather)
with shapes — the glue-op kill list.
Usage: python scripts/hlo_count.py [side] [solver]
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config

side = int(sys.argv[1]) if len(sys.argv) > 1 else 47
solver = sys.argv[2] if len(sys.argv) > 2 else "dfsph"
resident = not (len(sys.argv) > 3 and sys.argv[3] == "nonresident")
r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config(solver, particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24, resident=resident)
sim = Simulation(sc, cfg, solver=solver)
if resident:
    step_fn = sim._solver.step_resident
    txt = (jax.jit(lambda rs: step_fn(rs, cfg)).lower(sim._rs).compile()
           .as_text())
else:
    step_fn = sim._step_fn
    txt = (jax.jit(lambda s: step_fn(s, cfg)).lower(sim.state).compile()
           .as_text())


def shape_bytes(s):
    m = re.match(r"(f32|s32|u32|pred|bf16|s8|u8|f16|s64)\[([\d,]*)\]", s)
    if not m:
        return 0
    elems = 1
    for d in m.group(2).split(","):
        if d:
            elems *= int(d)
    unit = {"f32": 4, "s32": 4, "u32": 4, "s64": 8, "bf16": 2, "f16": 2,
            "pred": 1, "s8": 1, "u8": 1}[m.group(1)]
    return elems * unit


comp = None
comp_insts = collections.Counter()
big = []
KINDS = ("transpose", "copy", "reshape", "scatter", "gather", "concatenate",
         "pad", "slice", "dynamic-slice", "dynamic-update-slice", "sort",
         "add", "select", "broadcast", "reduce", "iota", "custom-call")
for line in txt.splitlines():
    ls = line.strip()
    if (line.startswith(("ENTRY", "%")) or ls.startswith("%")) \
            and "{" in line and "=" not in line.split("{")[0]:
        comp = line.split()[1 if line.startswith("ENTRY") else 0].lstrip("%")
        continue
    m = re.match(r"^(ROOT\s+)?%?[\w\.\-]+\s*=\s*(\([^=]*\)|\S+)\s+"
                 r"([a-z][\w\-]*)\(", ls)
    if m and comp:
        kind = m.group(3)
        comp_insts[comp] += 1
        if kind in KINDS or kind == "fusion":
            b = shape_bytes(m.group(2).lstrip("("))
            big.append((b, kind, comp, ls[:140]))

print(f"computations: {len(comp_insts)}")
for c, n in sorted(comp_insts.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{n:6d}  {c[:80]}")
print(f"total instructions: {sum(comp_insts.values())}")

print("\nlargest data-movement / fusion ops (output bytes):")
for b, kind, c, l in sorted(big, key=lambda t: -t[0])[:40]:
    print(f"{b/1e6:9.1f} MB  {kind:12s} [{c[:36]:36s}] {l[:95]}")

"""Inspect what the GSPMD data-parallel path (parallel/sharding.py) compiles
to at a realistic size: count the collectives XLA inserts for one DFSPH step
on an 8-device mesh.  (VERDICT.md round-1 weak #4.)

  JAX_PLATFORMS=cpu python scripts/gspmd_hlo.py [side]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.scene import pad_to_multiple
from wcsph_tpu.simulation import default_config, get_solver
from wcsph_tpu.state import init_state
from wcsph_tpu.parallel import sharding

side = int(sys.argv[1]) if len(sys.argv) > 1 else 32

r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
sc = pad_to_multiple(sc, 8)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi)
state = init_state(sc, cfg)
print(f"n={sc.n_total} grid={cfg.grid_res}")

mesh = sharding.make_mesh(8)
state = sharding.shard_state(state, mesh)
step = sharding.make_sharded_step(get_solver("dfsph").step, cfg, mesh, state)

lowered = step.lower(state)
compiled = lowered.compile()
hlo = compiled.as_text()

counts = {}
sizes = {}
for op in ("all-gather", "all-reduce", "collective-permute", "all-to-all",
           "reduce-scatter"):
    # lines like:  %all-gather.5 = f32[3,35937]{...} all-gather(...)
    pat = re.compile(r"= (\w+)\[([\d,]*)\][^=]*\b" + op + r"\(")
    hits = pat.findall(hlo)
    counts[op] = len(hits)
    total = 0
    for dtype, dims in hits:
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        bytes_per = 2 if "16" in dtype else (8 if "64" in dtype else 4)
        total += n * bytes_per
    sizes[op] = total

print("collective counts for ONE dfsph step (8-way GSPMD, side="
      f"{side}, n={sc.n_total}):")
for op, c in counts.items():
    print(f"  {op:20s} {c:4d}   ~{sizes[op] / 1e6:.1f} MB output")

n_state = sum(np.prod(l.shape) * 4 for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "shape"))
print(f"(state itself is ~{n_state / 1e6:.1f} MB)")

# Is the expensive work sharded or replicated?  The per-DEVICE module shows
# the post-SPMD-partitioning shapes: if the packed sweep arrays appear at
# full (C, NC) size, every device runs the whole sweep (replicated compute).
cap = cfg.cell_capacity
nc = cfg.num_cells
full = f"{cap},{nc}"
sharded = f"{cap},{nc // 8}"
n_full = len(re.findall(re.escape(full), hlo))
n_shard = len(re.findall(re.escape(sharded), hlo))
print(f"per-device shapes containing full packed size ({full}): {n_full}")
print(f"per-device shapes containing 1/8 packed size ({sharded}): {n_shard}")
shapes = {}
for m in re.finditer(r"f32\[([\d,]+)\]", hlo):
    dims = [int(d) for d in m.group(1).split(",")]
    sz = int(np.prod(dims)) * 4
    shapes[m.group(1)] = max(shapes.get(m.group(1), 0), sz)
top = sorted(shapes.items(), key=lambda kv: -kv[1])[:8]
print("largest per-device f32 shapes:")
for s, b in top:
    print(f"  [{s}]  {b / 1e6:.1f} MB")

"""Dev perf: collective + op-size census of the slab-OWNED decomposed step
(parallel/slab.py) on an 8-virtual-device CPU mesh.

Prints, per compiled step program:
  * collective-permute / all-reduce / all-gather counts (the ICI traffic a
    real pod slice would carry per step);
  * the largest tensors in the program, verified SLAB-sized (nothing
    global-grid-sized survives outside shard_map — VERDICT r2 item 5);
  * instruction totals vs the single-device step (the replication the GSPMD
    path suffered — scripts/gspmd_hlo.py — must be gone).
Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python scripts/slab_hlo.py [n_devices]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ.setdefault("XLA_FLAGS",
                      f"--xla_force_host_platform_device_count={n_dev}")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

import numpy as np

from wcsph_tpu import scene
from wcsph_tpu.parallel import halo, slab
from wcsph_tpu.simulation import default_config
from wcsph_tpu.solvers import dfsph
from wcsph_tpu.state import init_state

R = 0.025
sc = scene.dam_break(particle_radius=R, fluid_dims=(8, 8, 8), box_extent=0.9)
lo, hi = sc.domain(pad=4 * R)
cfg = default_config("dfsph", particle_radius=R, domain_min=lo, domain_max=hi,
                     adaptive_dt=False, dt_init=2e-3)
cfg = halo.slab_config(cfg, n_dev)
mesh = halo.Mesh(np.asarray(jax.devices()[:n_dev]), (halo.AXIS,))
state = init_state(sc, cfg)
sst = slab.slab_init(state, cfg, mesh)

txt = jax.jit(lambda s: slab.dfsph_step_slab(s, cfg, mesh)) \
    .lower(sst).compile().as_text()
txt1 = jax.jit(lambda s: dfsph.step(s, cfg)).lower(state).compile().as_text()


def census(t):
    counts = {}
    for kind in ("collective-permute", "all-reduce", "all-gather",
                 "reduce-scatter", "all-to-all"):
        counts[kind] = len(re.findall(rf"= \S+ {kind}\(", t))
    total = sum(1 for ln in t.splitlines() if re.match(r"\s+\S+ = ", ln))
    return counts, total


def biggest(t, k=5):
    sizes = []
    for m in re.finditer(r"f32\[([\d,]+)\]", t):
        dims = [int(x) for x in m.group(1).split(",") if x]
        n = 1
        for d in dims:
            n *= d
        sizes.append((n, m.group(0)))
    sizes.sort(reverse=True)
    seen, out = set(), []
    for n, s in sizes:
        if s not in seen:
            out.append((n, s))
            seen.add(s)
        if len(out) >= k:
            break
    return out


cs, tot_s = census(txt)
c1, tot_1 = census(txt1)
print(f"slab step ({n_dev} devices): instructions={tot_s} collectives={cs}")
print(f"single-device step:          instructions={tot_1} collectives={c1}")
print("largest slab-step tensors (must be slab- or seat-sized, "
      f"global grid = {cfg.cell_capacity}x{cfg.num_cells}"
      f" = {cfg.cell_capacity * cfg.num_cells}):")
for n, s in biggest(txt):
    print(f"  {n:>12,}  {s}")
nc_loc = cfg.num_cells // n_dev
# dimension-based check (same as tests/test_slab.py): a GLOBAL packed op has
# num_cells (or cap*num_cells) in one dimension; slab tensors top out at the
# halo-extended local cell count
bad = [ln for ln in txt.splitlines()
       if re.search(rf"f32\[[^\]]*\b{cfg.cell_capacity * cfg.num_cells}\b",
                    ln)
       or re.search(rf"f32\[{cfg.cell_capacity},{cfg.num_cells}\]", ln)]
assert not bad, f"global packed tensor leaked out of shard_map: {bad[:2]}"
print(f"per-slab packed cells = {nc_loc} (+halo planes); "
      "no global packed op in the step")

"""Dev perf: row-gather (major-dim) vs minor-dim stacked gather for pack.
  python scripts/prim_perf3.py [side] [cap]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 24

r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi,
                cell_capacity=cap)
nl = sc.n_liquid
pos = jnp.asarray(sc.positions.T)
grid = jax.jit(build_grid, static_argnums=(1, 2))(pos, nl, cfg)
capn, nc = grid.pid.shape
print(f"n={sc.n_total} liquid={nl} slots={capn * nc}", file=sys.stderr)

rng = np.random.RandomState(0)
stacked = jnp.asarray(rng.randn(11, nl), jnp.float32)
stackedT = jnp.asarray(np.ascontiguousarray(np.asarray(stacked).T))
idx = jnp.maximum(grid.pid, 0).ravel()


def timeit(name, fn, *args, n_it=10):
    f = jax.jit(fn)
    out = f(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])
    t0 = time.time()
    for _ in range(n_it):
        out = f(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0])
    print(f"{name:44s} {(time.time() - t0) / n_it * 1e3:8.2f} ms")


timeit("minor-dim stacked gather (current)",
       lambda s, i: jnp.where(grid.liquid[None],
                              s[:, i].reshape(11, capn, nc), 0.0),
       stacked, idx)
timeit("row gather (NL,11)[idx] + transpose",
       lambda sT, i: jnp.where(grid.liquid[None],
                               sT[i].reshape(capn, nc, 11)
                               .transpose(2, 0, 1), 0.0),
       stackedT, idx)
timeit("row gather no transpose",
       lambda sT, i: sT[i], stackedT, idx)
# unpack direction: 1.1M rows of 11 from (C*NC, 11)
packT = jnp.asarray(rng.randn(capn * nc, 11), jnp.float32)
sl = jnp.maximum(grid.slot, 0)
timeit("unpack row gather (C*NC,11)[slot]",
       lambda p, s: p[s], packT, sl)
timeit("unpack minor-dim (11, C*NC)[:, slot] (current)",
       lambda p, s: p.T[:, s], packT, sl)

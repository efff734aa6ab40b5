"""Dev perf: the non-sweep primitives at scale — sort, build_grid, pack,
unpack — to locate the remaining step time (TPU).
  python scripts/prim_perf.py [side] [cap]
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
from wcsph_tpu.grid import build_grid, pack_liquid, unpack_liquid, cell_of_positions

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
n = sc.n_total
nl = sc.n_liquid
print(f"n={n} liquid={nl} grid={cfg.grid_res} cap={cap}", file=sys.stderr)

pos = jnp.asarray(sc.positions.T)
grid = jax.jit(build_grid, static_argnums=(1, 2))(pos, nl, cfg)

rng = np.random.RandomState(0)
vel = jnp.asarray(rng.randn(3, nl), jnp.float32)
scal = jnp.asarray(rng.randn(nl), jnp.float32)
velp = pack_liquid(grid, vel)
scalp = pack_liquid(grid, scal)


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
    print(f"{name:32s} {(time.time() - t0) / n_it * 1e3:8.2f} ms")
    return out


cell_id, inbox = jax.jit(lambda p: cell_of_positions(p, cfg))(pos)
key = jnp.where(inbox, cell_id, cfg.num_cells)

timeit("argsort (N keys)", lambda k: jnp.argsort(k), key)
timeit("sort_key_val", lambda k: jax.lax.sort_key_val(
    k, jnp.arange(n, dtype=jnp.int32)), key)
timeit("sort key only", lambda k: jnp.sort(k), key)
timeit("cummax N", lambda k: jax.lax.cummax(k), key)
timeit("build_grid (full)", lambda p: build_grid(p, nl, cfg), pos)
timeit("pack vec3", lambda v: pack_liquid(grid, v), vel)
timeit("pack scalar", lambda s: pack_liquid(grid, s), scal)
timeit("pack 5 fields (11 comps)",
       lambda v, s: [pack_liquid(grid, v), pack_liquid(grid, v),
                     pack_liquid(grid, v), pack_liquid(grid, s),
                     pack_liquid(grid, s)], vel, scal)
timeit("unpack vec3", lambda vp: unpack_liquid(grid, vp, vel), velp)
timeit("unpack 5 fields",
       lambda vp, sp: [unpack_liquid(grid, vp, vel),
                       unpack_liquid(grid, vp, vel),
                       unpack_liquid(grid, vp, vel),
                       unpack_liquid(grid, sp, scal),
                       unpack_liquid(grid, sp, scal)], velp, scalp)
timeit("elementwise velp+dt*acc", lambda vp: vp + 1e-3 * vp, velp)

# gather-based pack alternative: packed[c, cell] = field[pid] (C*NC gather)
pid_safe = jnp.maximum(grid.pid, 0)


def pack_gather(v):
    got = v[:, pid_safe.ravel()].reshape(3, *grid.pid.shape)
    return jnp.where(grid.liquid[None], got, 0.0)


timeit("pack vec3 via (C,NC) gather", pack_gather, vel)

"""Dev perf: candidate pack/scatter layouts at 1M (TPU).
  python scripts/prim_perf2.py [side] [cap]
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
from wcsph_tpu.grid import cell_of_positions

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
nc = cfg.num_cells
print(f"n={n} nc={nc} cap={cap}", file=sys.stderr)

pos = jnp.asarray(sc.positions.T)
cell_id, inbox = jax.jit(lambda p: cell_of_positions(p, cfg))(pos)
key = jnp.where(inbox, cell_id, nc)
skey, order = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
iota = jnp.arange(n, dtype=jnp.int32)
change = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
run_start = jax.lax.cummax(jnp.where(change, iota, 0))
rank = iota - run_start
ok = (rank < cap) & (skey < nc)

sl_slotmajor = jnp.where(ok, rank * nc + jnp.minimum(skey, nc - 1), cap * nc)
sl_cellmajor = jnp.where(ok, jnp.minimum(skey, nc - 1) * cap + rank, cap * nc)
x_sorted = pos[0][order]          # scalar sorted field
v_sorted = pos[:, order]          # (3, n) sorted

hist = jnp.zeros((nc,), jnp.int32).at[jnp.minimum(key, nc - 1)].add(
    jnp.where(key < nc, 1, 0))
start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(hist)[:-1].astype(jnp.int32)])


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
    return out


timeit("noop (dispatch overhead)", lambda x: x + 1.0, x_sorted)
timeit("gather sort vec3 pos[:, order]", lambda o: pos[:, o], order)
timeit("gather sort 3x scalar", lambda o: [pos[0][o], pos[1][o], pos[2][o]],
       order)

timeit("scatter slot-major scalar (current)",
       lambda x, s: jnp.full((cap * nc,), 1e9, jnp.float32)
       .at[s].set(x, mode="drop").reshape(cap, nc), x_sorted, sl_slotmajor)
timeit("scatter cell-major scalar",
       lambda x, s: jnp.full((nc * cap,), 1e9, jnp.float32)
       .at[s].set(x, mode="drop").reshape(nc, cap), x_sorted, sl_cellmajor)
timeit("scatter cell-major scalar + T",
       lambda x, s: jnp.full((nc * cap,), 1e9, jnp.float32)
       .at[s].set(x, mode="drop").reshape(nc, cap).T, x_sorted, sl_cellmajor)
timeit("scatter slot-major 3x scalar",
       lambda v, s: [jnp.full((cap * nc,), 1e9, jnp.float32)
                     .at[s].set(v[c], mode="drop").reshape(cap, nc)
                     for c in range(3)], v_sorted, sl_slotmajor)

# coalesced gather: packed[cell, c] = sorted[start[cell] + c]
cidx = jnp.arange(cap, dtype=jnp.int32)[None, :]


def pack_coal(xs):
    idx = start[:, None] + cidx                       # (nc, cap)
    val = xs[jnp.minimum(idx, n - 1)]
    m = cidx < hist[:, None]
    return jnp.where(m, val, 1e9)


timeit("coalesced gather scalar (NC,C)", pack_coal, x_sorted)
timeit("coalesced gather scalar + T", lambda xs: pack_coal(xs).T, x_sorted)
timeit("coalesced gather vec3 + T",
       lambda vs: [pack_coal(vs[c]).T for c in range(3)], v_sorted)

# unpack: monotone gather from (NC*C) flat at cell*C+rank
pk = pack_coal(x_sorted).ravel()
sl_un = jnp.where(ok, sl_cellmajor, 0)
timeit("unpack monotone gather scalar", lambda p, s: p[s], pk, sl_un)
pk3 = jnp.stack([pk, pk, pk])
timeit("unpack vec3 leading-dim (current)",
       lambda p, s: p[:, s], pk3, sl_un)
timeit("unpack vec3 3x scalar",
       lambda p, s: [p[0][s], p[1][s], p[2][s]], pk3, sl_un)

"""Dev perf: isolate each scatter of the rebin apply phase at 1M scale.

Synthetic shapes matching resident.rebin_incremental at side=100:
nflat ~ 9.4M, K (budget) ~ 277k, nc ~ num_cells.
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

nflat = 9_418_752
K = 276_934
nc = 400_000
n = 1_107_738

rng = np.random.RandomState(0)
# ~10% of movers valid (typical measured mover rate), rest dropped
valid = rng.rand(K) < 0.12
perm = rng.permutation(nflat)
s_old = jnp.asarray(np.where(valid, perm[:K], nflat), jnp.int32)
new_slot = jnp.asarray(np.where(valid, perm[K:2 * K], nflat), jnp.int32)
s_pid = jnp.asarray(np.where(valid, rng.permutation(n)[:K], n), jnp.int32)
dc = jnp.asarray(np.where(valid, rng.randint(0, nc, K), nc), jnp.int32)
rr = jnp.asarray(rng.randint(0, 4, K), jnp.int32)
vals3 = jnp.asarray(rng.randn(3 * K), jnp.float32)
pid0 = jnp.asarray(rng.randint(-1, n, nflat), jnp.int32)
liq0 = pid0 >= 0
xp0 = jnp.asarray(rng.randn(3 * nflat), jnp.float32)
top0 = jnp.zeros((nc,), jnp.int32)
slot0 = jnp.asarray(rng.randint(-1, nflat, n), jnp.int32)
uniq_oob = jnp.asarray(np.where(valid, dc, nc + np.arange(K)), jnp.int32)


def bench(name, f, *args):
    g = jax.jit(f)
    out = g(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(8):
        out = g(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:38s} {(time.time() - t0) / 8 * 1e3:8.2f} ms")


def _multi(idx, k):
    return jnp.concatenate([
        jnp.where(idx < nflat, idx + c * nflat, k * nflat) for c in range(k)])


bench("pid 2-chained scatters", lambda p: p.at[s_old].set(-1, mode="drop")
      .at[new_slot].set(s_pid, mode="drop"), pid0)
bench("pid single scatter", lambda p: p.at[new_slot].set(s_pid, mode="drop"),
      pid0)
bench("liquid (bool) 2-chained", lambda l: l.at[s_old].set(False, mode="drop")
      .at[new_slot].set(True, mode="drop"), liq0)
bench("liquid as int8 2-chained", lambda l: l.at[s_old].set(0, mode="drop")
      .at[new_slot].set(1, mode="drop"), liq0.astype(jnp.int8))
bench("xp multi(3) 2-chained", lambda x: x
      .at[_multi(s_old, 3)].set(1e9, mode="drop")
      .at[_multi(new_slot, 3)].set(vals3, mode="drop"), xp0)
bench("xp per-comp 2-chained", lambda x: jnp.stack([
    x[c].at[s_old].set(1e9, mode="drop")
    .at[new_slot].set(vals3[c * K:(c + 1) * K], mode="drop")
    for c in range(3)]), xp0.reshape(3, nflat))
bench("top scatter-ADD dup sentinel", lambda t: t.at[dc].add(rr + 1,
      mode="drop"), top0)
bench("top scatter-ADD unique oob", lambda t: t.at[uniq_oob].add(rr + 1,
      mode="drop"), top0)
bench("top scatter-SET dup sentinel", lambda t: t.at[dc].set(rr + 1,
      mode="drop"), top0)
bench("slot scatter (K into N)", lambda s: s.at[s_pid].set(new_slot,
      mode="drop"), slot0)
bench("K gather from nflat x6 fields", lambda x: jnp.stack(
    [x.reshape(3, nflat)[:, jnp.minimum(s_old, nflat - 1)]] * 2),
    xp0)

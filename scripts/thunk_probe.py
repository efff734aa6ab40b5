"""Dev perf: measure the axon per-thunk launch gap directly.

Builds jitted chains of K non-fusable ops (alternating small sorts — each a
separate thunk) at two sizes, times them, and reports the slope
ms-per-thunk.  The resident 1M step executes O(150) thunks; if the slope is
~0.5-1 ms, op-count reduction is the dominant remaining lever (CLAUDE.md
perf notes), independent of device compute.
Usage: python scripts/thunk_probe.py [K1] [K2] [elems]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

K1 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
K2 = int(sys.argv[2]) if len(sys.argv) > 2 else 200
n = int(sys.argv[3]) if len(sys.argv) > 3 else 8 * 128


def chain(k):
    @jax.jit
    def f(x):
        for i in range(k):
            x = jnp.sort(x)          # sort thunk (not fusable)
            x = x * -1.0             # keeps values changing so sort works
        return x
    return f


x = jnp.asarray(np.random.randn(n).astype(np.float32))
for k in (K1, K2):
    f = chain(k)
    y = f(x)
    np.asarray(y.ravel()[0])
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        y = f(y)
    np.asarray(y.ravel()[0])
    el = (time.time() - t0) / reps
    print(f"K={k}: {el * 1e3:.2f} ms/call  ({el / k * 1e6:.0f} us/op)")
    if k == K1:
        t1 = el
t2 = el
slope = (t2 - t1) / (K2 - K1)
print(f"per-thunk slope: {slope * 1e6:.0f} us")

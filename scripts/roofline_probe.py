"""Measure the two rooflines the sweep formulation lives under on THIS chip:
peak fp32 VPU FMA throughput and HBM stream bandwidth.

The public spec sheet gives MXU flops (197 TFLOP/s bf16 on v5e), but SPH
pair math is elementwise VPU work; no fp32-VPU number is published, so we
measure it: 8 INDEPENDENT chains of dependent FMAs (fills the VPU pipeline
the way unrolled pair math does) over a block XLA keeps fused, so HBM
traffic is one read + one write per (8 x chain) flops -> compute bound.
Bandwidth: a donated elementwise pass over ~1 GB (pure read+write stream).

Usage: python scripts/roofline_probe.py    (runs on the default platform)
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure_vpu(chain=64, lanes=8, mb=16, reps=8):
    n = mb * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    @jax.jit
    def f(x):
        a = jnp.float32(1.0000001)
        ys = [x * (1.0 + 1e-7 * k) for k in range(lanes)]
        for _ in range(chain):
            ys = [y * a + jnp.float32(1e-7) for y in ys]
        out = ys[0]
        for y in ys[1:]:
            out = out + y
        return out

    y = f(x); _sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = f(x)
    _sync(y)
    dt = time.time() - t0
    flops = (2.0 * chain + 2.0) * lanes * n * reps
    return flops / dt


def measure_hbm(gb=1.0, reps=10):
    n = int(gb * 1024 ** 3 / 4)
    x = jnp.zeros((n,), jnp.float32)

    @partial(jax.jit, donate_argnums=0)
    def f(x):
        return x + 1.0

    y = f(x); _sync(y)
    t0 = time.time()
    for _ in range(reps):
        y = f(y)
    _sync(y)
    dt = time.time() - t0
    return 2.0 * 4 * n * reps / dt  # read + write


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}")
    v = measure_vpu()
    print(f"VPU fp32 FMA (8 independent chains): {v / 1e12:.2f} TFLOP/s")
    bw = measure_hbm()
    print(f"HBM stream (read+write, donated): {bw / 1e9:.0f} GB/s")

"""Dev perf: engine sweeps vs XLA twins (and v1 kernels) at scale, on TPU."""
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
from wcsph_tpu import dense_ops
from wcsph_tpu.pallas.engine import SweepEngine

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 16

r = 0.025
spacing = 2 * r
sc = dam_break(particle_radius=r, fluid_dims=(side, side, side),
               box_extent=side * spacing * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi,
                cell_capacity=cap)
print(f"n={sc.n_total} liquid={sc.n_liquid} grid={cfg.grid_res} cap={cap}",
      file=sys.stderr)

pos = jnp.asarray(sc.positions.T)
grid = jax.jit(build_grid, static_argnums=(1, 2))(pos, sc.n_liquid, cfg)
print("overflow:", int(grid.overflow), file=sys.stderr)

rng = np.random.RandomState(0)
shape = grid.pid.shape
liq = grid.liquid
velp = jnp.where(liq[None], jnp.asarray(rng.randn(3, *shape), jnp.float32), 0.0)
kp = jnp.where(liq, jnp.asarray(rng.randn(*shape), jnp.float32), 0.0)
omp = velp * 0.1
dt = jnp.float32(1e-3)


def timeit(name, fn, *args, n=10):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    dt_ms = (time.time() - t0) / n * 1e3
    print(f"{name:24s} {dt_ms:8.2f} ms   (compile {compile_s:.1f}s)")
    return out


which = sys.argv[3] if len(sys.argv) > 3 else "all"

if which in ("all", "engine"):
    def e_density():
        eng = SweepEngine(grid, cfg)
        return eng.density_alpha()

    def e_kappa(velp, kp):
        eng = SweepEngine(grid, cfg)
        return eng.kappa_velocity_update(velp, kp, dt)

    def e_div(velp):
        eng = SweepEngine(grid, cfg)
        return eng.div_accum(velp)

    rho, alpha, cnt = timeit("engine density+alpha", e_density)
    timeit("engine kappa", e_kappa, velp, kp)
    timeit("engine div", e_div, velp)

    def e_visc_mv(velp, rho):
        eng = SweepEngine(grid, cfg)
        return eng.visc_matvec(velp, rho, dt)

    def e_visc_init(velp, rho):
        eng = SweepEngine(grid, cfg)
        return eng.visc_init(velp, rho, dt)

    def e_vort(velp, omp, rho, cnt):
        eng = SweepEngine(grid, cfg)
        return eng.vorticity(velp, omp, rho, cnt, dt)

    timeit("engine visc_mv", e_visc_mv, velp, rho)
    timeit("engine visc_init", e_visc_init, velp, rho)
    timeit("engine vorticity", e_vort, velp, omp, rho, cnt)

if which in ("all", "xla"):
    def x_density():
        return dense_ops.density_stats(grid, cfg, with_alpha=True)

    stats = timeit("xla density+alpha", x_density)

    def x_kappa(velp, kp):
        return dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt)

    def x_div(velp):
        return dense_ops._div_accum(grid, cfg, velp)

    timeit("xla kappa", x_kappa, velp, kp)
    timeit("xla div", x_div, velp)

    def x_visc_mv(velp, rho):
        rho_pad = dense_ops.WindowLoop(grid, cfg).pad(rho, 1.0)
        return dense_ops.visc_matvec(grid, cfg, velp, rho, rho_pad, dt)

    def x_visc_init(velp, rho):
        rho_pad = dense_ops.WindowLoop(grid, cfg).pad(rho, 1.0)
        return dense_ops.visc_init(grid, cfg, velp, rho, rho_pad, dt)

    def x_vort(velp, omp, rho):
        return dense_ops.vorticity(grid, cfg, velp, omp, rho, dt)

    timeit("xla visc_mv", x_visc_mv, velp, stats.rho)
    timeit("xla visc_init", x_visc_init, velp, stats.rho)
    timeit("xla vorticity", x_vort, velp, omp, stats.rho)

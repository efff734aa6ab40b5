"""Dev smoke: SweepEngine vs dense_ops twins on a small scene (CPU interpret)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid, pack_liquid
from wcsph_tpu import dense_ops
from wcsph_tpu.utils import mat3
from wcsph_tpu.pallas.engine import SweepEngine

r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(6, 6, 6), box_extent=6 * 2 * r * 1.5)
lo, hi = sc.domain(pad=6 * r)
cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi, cell_capacity=16)
print("grid_res", cfg.grid_res, "num_cells", cfg.num_cells)
pos = jnp.asarray(sc.positions.T)
nl = sc.n_liquid
grid = build_grid(pos, nl, cfg)
print("n", pos.shape, nl, "overflow", int(grid.overflow))
eng = SweepEngine(grid, cfg, interpret="--tpu" not in sys.argv)
print("plan", eng.plan)

rng = np.random.RandomState(0)
dt = jnp.float32(1e-3)


def diff(name, a, b, where=None, tol=2e-5):
    d = jnp.abs(a - b)
    if where is not None:
        d = jnp.where(where, d, 0.0)
    m = float(jnp.max(d))
    scale = float(jnp.max(jnp.abs(a))) or 1.0
    ok = m <= tol * max(scale, 1.0)
    print(f"{name:14s} maxdiff={m:.3e} scale={scale:.3e} {'OK' if ok else 'FAIL'}")
    return ok


all_ok = True

# density + alpha + count
stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
rho2, alpha2, cnt2 = eng.density_alpha()
all_ok &= diff("rho", jnp.where(grid.valid, stats.rho, 0.0), jnp.where(grid.valid, rho2, 0.0))
all_ok &= diff("alpha", jnp.where(grid.valid, stats.alpha, 0.0), jnp.where(grid.valid, alpha2, 0.0))
all_ok &= diff("count", jnp.where(grid.valid, stats.count, 0).astype(jnp.float32),
               jnp.where(grid.valid, cnt2, 0).astype(jnp.float32))

liq = grid.liquid
velp = jnp.where(liq[None], jnp.asarray(rng.randn(3, *grid.pid.shape), jnp.float32), 0.0)
kp = jnp.where(liq, jnp.asarray(rng.randn(*grid.pid.shape), jnp.float32), 0.0)

# kappa update
v1 = dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt)
v2 = eng.kappa_velocity_update(velp, kp, dt)
all_ok &= diff("kappa_vel", jnp.where(liq[None], v1, 0.0), jnp.where(liq[None], v2, 0.0))

# div accum
d1 = dense_ops._div_accum(grid, cfg, velp)
d2 = eng.div_accum(velp)
all_ok &= diff("div", jnp.where(liq, d1, 0.0), jnp.where(liq, d2, 0.0))

# viscosity matvec + init
rhop = stats.rho
loop = dense_ops.WindowLoop(grid, cfg)
rho_pad = loop.pad(rhop, 1.0)
m1 = dense_ops.visc_matvec(grid, cfg, velp, rhop, rho_pad, dt)
m2 = eng.visc_matvec(velp, rhop, dt)
all_ok &= diff("visc_mv", jnp.where(liq[None], m1, 0.0), jnp.where(liq[None], m2, 0.0))

minv1, ax1 = dense_ops.visc_init(grid, cfg, velp, rhop, rho_pad, dt)
minv2, ax2 = eng.visc_init(velp, rhop, dt)
for f in mat3.Sym3._fields:
    all_ok &= diff(f"minv.{f}", jnp.where(liq, getattr(minv1, f), 0.0),
                   jnp.where(liq, getattr(minv2, f), 0.0))
all_ok &= diff("visc_ax0", jnp.where(liq[None], ax1, 0.0), jnp.where(liq[None], ax2, 0.0))

# vorticity
omp = jnp.where(liq[None], jnp.asarray(rng.randn(3, *grid.pid.shape), jnp.float32), 0.0) * 0.1
dv1, om1 = dense_ops.vorticity(grid, cfg, velp, omp, rhop, dt)
dv2, om2 = eng.vorticity(velp, omp, rhop, stats.count, dt)
all_ok &= diff("vort_dv", jnp.where(liq[None], dv1, 0.0), jnp.where(liq[None], dv2, 0.0))
all_ok &= diff("vort_om", jnp.where(liq[None], om1, 0.0), jnp.where(liq[None], om2, 0.0))

print("ALL OK" if all_ok else "FAILURES")
sys.exit(0 if all_ok else 1)

"""Bisect the resident-slab parity failure: run N steps of the single-device
padded-engine step vs the resident-slab step and report per-step max
deviation, optionally with the fused iteration kernels disabled
(WCSPH_DBG_NOFUSED=1) or the x-kick removed (WCSPH_DBG_NOKICK=1).

Usage: python scripts/debug_rslab.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
sys.modules["zstandard"] = None

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from wcsph_tpu import scene
from wcsph_tpu.parallel import halo, resident_slab as rsl
from wcsph_tpu.simulation import default_config
from wcsph_tpu.solvers import dfsph
from wcsph_tpu.state import init_state

R = 0.025
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
nofused = os.environ.get("WCSPH_DBG_NOFUSED") == "1"
kick = 0.0 if os.environ.get("WCSPH_DBG_NOKICK") == "1" else 2.2

mesh8 = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6), box_extent=0.7)
lo, hi = sc.domain(pad=4 * R)
cfg = default_config("dfsph", particle_radius=R, domain_min=lo,
                     domain_max=hi, use_pallas=True, adaptive_dt=False,
                     dt_init=3e-3, fused_solver_iters=not nofused)
cfg = halo.slab_config(cfg, 8)
state = init_state(sc, cfg)
state = state.replace(dt=jnp.float32(cfg.dt_init),
                      vel=state.vel.at[0].add(kick))

names = rsl.resident_fields("dfsph")
srs = rsl.slab_res_init(state, cfg, mesh8, names)
ref = state
step1 = jax.jit(lambda s: dfsph.step(s, cfg))
stepn = jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, "dfsph"))
nl = state.n_liquid
print(f"nofused={nofused} kick={kick} n_liquid={nl} "
      f"grid={cfg.grid_res}")
for i in range(steps):
    ref = step1(ref)
    srs = stepn(srs)
    got = rsl.gather_state(srs, state, names)
    dp = np.abs(np.asarray(got.pos[:, :nl]) - np.asarray(ref.pos[:, :nl]))
    dv = np.abs(np.asarray(got.vel[:, :nl]) - np.asarray(ref.vel[:, :nl]))
    nbad = int(np.sum(np.any(dp > 5e-4, axis=0)))
    j = int(np.argmax(np.max(dp, axis=0)))
    # which slab is the worst particle in?
    x = np.asarray(ref.pos)[0, j]
    gxl = cfg.grid_res[0] // 8
    cx = int(np.floor((x - cfg.domain_min[0]) / cfg.cell_size))
    print(f"step {i}: max|dpos|={dp.max():.2e} max|dvel|={dv.max():.2e} "
          f"bad={nbad} worst pid={j} x={x:.4f} cell={cx} "
          f"slab={cx // gxl} plane_in_slab={cx % gxl} "
          f"div={int(np.asarray(got.diag.divergence_iters))}/"
          f"{int(np.asarray(ref.diag.divergence_iters))} "
          f"pr={int(np.asarray(got.diag.pressure_iters))}/"
          f"{int(np.asarray(ref.diag.pressure_iters))}")

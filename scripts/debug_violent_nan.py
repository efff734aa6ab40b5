"""Reproduce the violent-scene telemetry NaN (ADVICE r3): run the harness
violent scene per solver on CPU and report the first step whose diag
scalars go non-finite, plus the state ingredients at that step.

Usage: python scripts/debug_violent_nan.py [solver] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.modules["zstandard"] = None

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_zlib")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))
from harness import _build  # noqa: E402

solver = sys.argv[1] if len(sys.argv) > 1 else "dfsph"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 900

sim = _build(solver, "violent")
print(f"{solver} violent: n_liquid={sim.state.n_liquid} "
      f"grid={sim.cfg.grid_res}")
for i in range(steps):
    sim.run(1)
    tel = sim.telemetry()
    bad = [k for k, v in tel.items()
           if isinstance(v, float) and not np.isfinite(v)]
    if bad or (i % 50 == 0):
        print(f"step {i}: t={tel['time']:.4f} dt={tel['dt']:.2e} "
              f"err={tel.get('density_error'):.3e} "
              f"err_pre={tel.get('density_error_pre'):.3e} "
              f"vmax={tel['vel_max']:.3f} "
              f"pr={tel.get('pressure_iters')} "
              f"dv={tel.get('divergence_iters')}")
    if bad:
        print(f"NON-FINITE {bad} at step {i}")
        st = sim.state
        pos = np.asarray(st.pos)
        vel = np.asarray(st.vel)
        nl = st.n_liquid
        print("pos finite:", np.isfinite(pos).all(),
              "vel finite:", np.isfinite(vel).all())
        print("liquid pos range:", pos[:, :nl].min(axis=1),
              pos[:, :nl].max(axis=1))
        print("domain:", sim.cfg.domain_min, sim.cfg.domain_max)
        out = ((pos[:, :nl] < np.asarray(sim.cfg.domain_min)[:, None])
               | (pos[:, :nl] > np.asarray(sim.cfg.domain_max)[:, None]))
        print("liquid out of box:", int(out.any(axis=0).sum()))
        vmag = np.sqrt((vel[:, :nl] ** 2).sum(axis=0))
        print("vmax:", vmag.max(), "n(v>20):", int((vmag > 20).sum()))
        sys.exit(2)
print("no NaN observed")

#!/usr/bin/env bash
# One-command TPU regeneration: everything the round-3 evidence needs, in
# dependency order, resumable (each stage skips if its artifact is newer
# than the repo HEAD commit).  Run on a box where `python -c "import jax;
# jax.devices()"` shows the axon TPU.
#
#   bash scripts/regen_tpu.sh [stage...]    # default: all stages
#
# Stages:
#   smoke       fast end-to-end drive (verify-skill recipe, ~2 min)
#   harness     RESULTS.md: iteration parity + throughput incl. 1M + tension
#   bench       bench.py 1M headline JSON (resident engine path)
#   trace       1M step trace profile (xprof) -> /tmp/wcsph_trace
#   hlo         executed-op census of the 1M resident step
set -euo pipefail
cd "$(dirname "$0")/.."

if [ $# -gt 0 ]; then stages=("$@"); else stages=(smoke harness bench bench_ab trace hlo); fi

run() { echo "=== $* ==="; "$@"; }

for st in "${stages[@]}"; do
  case "$st" in
  smoke)
    run timeout 580 python - <<'EOF'
import time, numpy as np
from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config
r = 0.025; side = 24
sc = dam_break(particle_radius=r, fluid_dims=(side,)*3,
               box_extent=side*2*r*1.35)
lo, hi = sc.domain(pad=6*r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                     domain_max=hi, use_pallas=True, cell_capacity=24)
sim = Simulation(sc, cfg, solver="dfsph")
for _ in range(5): sim.step()
np.asarray(sim.state.pos)
t0 = time.time()
for _ in range(30): sim.step()
np.asarray(sim.state.pos)
sim.check_health()
print(sim.telemetry())
print(f"{sim.state.n_liquid*30/(time.time()-t0):.3e} particle-steps/s")
EOF
    ;;
  harness)
    # full tables: parity (canonical + violent) at default scale, throughput
    # at 8k/100k/1M incl. the tension-enabled flagship rows
    run timeout 14000 python benchmarks/harness.py --scales 20,47,100
    ;;
  bench)
    run timeout 7200 python bench.py
    ;;
  bench_ab)
    # fused-iteration A/B at 100k (fast compiles): quantifies the per-step
    # thunk-count reduction on the real launch-gap-bound platform
    run timeout 3600 python bench.py --side 47
    run timeout 3600 python bench.py --side 47 --no-fused
    ;;
  trace)
    run timeout 7200 python scripts/trace_profile.py 100 3 24 nonresident
    ;;
  hlo)
    run timeout 7200 python scripts/hlo_count.py 100 dfsph
    ;;
  *) echo "unknown stage: $st" >&2; exit 2 ;;
  esac
done
echo "regen complete"

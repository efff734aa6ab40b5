#!/bin/bash
# Round-4 TPU regeneration batch (run after code changes land):
#   1. bench A/B at 100k + 1M for the padded-direct non-resident step
#   2. violent-scene parity rows (retuned dt, ADVICE r3 #2)
#   3. reference published-artifact parity (fixed criterion + capacity)
set -x
cd "$(dirname "$0")/.."
timeout 1200 python bench.py --side 47 --steps 20
timeout 3600 python bench.py --side 100 --steps 20
timeout 5400 python benchmarks/harness.py --suite iters
timeout 5400 python benchmarks/reference_plots.py --steps 400

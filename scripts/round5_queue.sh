#!/bin/bash
# Round-5 session-2 TPU queue: partial throughput regen with the round-5
# harness (first_step_s/build_s fields, C=16+spill config) merged into the
# committed table; tension rows regenerate at 100k first (the fused tension
# kernel's first TPU measurement), 1M tension afterwards if the clock allows.
set -x
cd /root/repo
mkdir -p /tmp/evidence_logs
python benchmarks/harness.py --suite throughput --solvers dfsph \
  --scales 20,47,100 --tension-scales 47 --merge \
  > /tmp/evidence_logs/throughput5.log 2>&1
echo "throughput5 pytest-visible rc=$?" >> /tmp/evidence_logs/status
python benchmarks/harness.py --suite throughput --solvers dfsph \
  --scales "" --tension-scales 100 --merge \
  > /tmp/evidence_logs/tension1m.log 2>&1
echo "tension1m rc=$?" >> /tmp/evidence_logs/status
echo "ROUND5-QUEUE DONE" >> /tmp/evidence_logs/status

#!/bin/bash
# Round-5 TPU evidence queue (VERDICT r4 directives 1+2): regenerate the
# retuned iters parity rows, then the two reference figures round 4 never ran.
# Sequential: one TPU process at a time.
set -x
cd /root/repo
mkdir -p /tmp/evidence_logs
python benchmarks/harness.py --suite iters \
  > /tmp/evidence_logs/iters.log 2>&1
echo "iters rc=$?" >> /tmp/evidence_logs/status
python benchmarks/reference_plots.py --only visc --steps 400 \
  > /tmp/evidence_logs/visc.log 2>&1
echo "visc rc=$?" >> /tmp/evidence_logs/status
python benchmarks/reference_plots.py --only pressure --steps 400 \
  > /tmp/evidence_logs/pressure.log 2>&1
echo "pressure rc=$?" >> /tmp/evidence_logs/status
echo "QUEUE DONE" >> /tmp/evidence_logs/status

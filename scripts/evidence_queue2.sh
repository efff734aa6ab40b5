#!/bin/bash
# Round-5 second TPU queue: fresh bench record (spill default, aot/build
# budget fields) + full throughput regen incl. 1M + tension rows with the
# round-5 config (C=16 spill 24, fused tension).
set -x
cd /root/repo
mkdir -p /tmp/evidence_logs
python bench.py > /tmp/evidence_logs/bench5.log 2>&1
rc=$?
echo "bench5 rc=$rc" >> /tmp/evidence_logs/status
if [ $rc -eq 0 ]; then
  tail -1 /tmp/evidence_logs/bench5.log > benchmarks/bench_latest.json
fi
python benchmarks/harness.py --suite throughput --scales 20,47,100 \
  > /tmp/evidence_logs/throughput5.log 2>&1
echo "throughput5 rc=$?" >> /tmp/evidence_logs/status
echo "QUEUE2 DONE" >> /tmp/evidence_logs/status

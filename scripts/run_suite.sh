#!/usr/bin/env bash
# Full test suite, one pytest process per test file.
#
# Rationale: the jax persistent-compilation-cache serializer (zstandard
# round trip in compilation_cache.put/get_executable_and_time) has
# segfaulted reproducibly on this box when the heaviest engine test's
# step executable is (de)serialized late in a LONG single-process run —
# the same test passes in a fresh process with the same cache.  Per-file
# processes sidestep the accumulated-state crash, isolate any future one
# to a single file, and keep the persistent cache warm across files.
#
#   bash scripts/run_suite.sh [extra pytest args]
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "!!! $f rc=$rc"
    fail=1
  fi
done
exit $fail

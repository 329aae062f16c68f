#!/bin/bash
# Full pre-commit gate: compile, unit+e2e tests, oracle compare, benchmark
# line. Run from the repo root BEFORE the end-of-round snapshot window
# closes (BACKLOG "no unswept gates" rule).
set -e
cd "$(dirname "$0")/.."
echo "== compile + test"
sbt -batch test 2>&1 | grep -E "Tests:|FAILED|\[error\]" | head -5
echo "== verify @ sf0.01 (16 threads — the driver's own sweep may use fewer; the watchdog guards either)"
rm -rf /tmp/preflight_v
SPARK_GRAFT_CPUS=16 \
  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/preflight_v' 2>&1 \
  | grep -E '\[verify\].*(failed|TIMEOUT)' || true
if [ -f /tmp/preflight_v/errors.json ]; then
  echo "!! errors.json is non-empty:"; cat /tmp/preflight_v/errors.json; echo
fi
python3 tools/check.py /tmp/preflight_v /root/testdata/sf0.01 | tail -1
echo "== bench @ sf0.1 (median of 3 — single shots swing ±50% on a shared host)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep metric

#!/bin/bash
# Full validation sweep: oracle parity at all three scale factors +
# bench + specs. Run before any round-end / after operator changes.
# (Parity MUST be swept at all SFs: rounding-boundary rows only appear
# at certain scales — see memory/spark4-duckdb-parity-gotchas.)
set -e
cd "$(dirname "$0")/.."
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/sweep_$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out" > /dev/null 2>&1
  echo -n "$sf: "
  python3 scripts/compare.py "/root/testdata/$sf" "$out" | tail -1
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /dev/null 2>&1
cat /tmp/graft_bench.json
sbt -batch test 2>&1 | grep "Tests:"

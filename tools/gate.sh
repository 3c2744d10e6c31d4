#!/usr/bin/env bash
# Full local quality gate: compile, unit+property tests, oracle diff at two
# scale factors, bench. Mirrors what the driver checks each round.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch test

echo "== oracle gate sf0.001 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/gate_v001"
python3 tools/compare_oracle.py /root/testdata/sf0.001 /tmp/gate_v001

echo "== oracle gate sf0.01 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_v01"
python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/gate_v01

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | grep '{"metric"' \
  | sed 's/^\[info\] //' | tail -1 | tee tools/last_bench.json

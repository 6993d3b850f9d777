#!/usr/bin/env bash
# Full local gate: compile + tests + oracle correctness (sf0.01) + bench
# (sf0.1). Mirrors what the round driver runs. Usage: scripts/gate.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== compile + test ==="
sbt -batch test 2>&1 | grep -E "Tests:|\*\*\*|error\]" | tail -5

echo "=== verify @ sf0.01 ==="
rm -rf /tmp/gate_verify
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_verify" 2>/dev/null >/dev/null
python3 scripts/check_correctness.py /root/testdata/sf0.01 /tmp/gate_verify | tail -3

echo "=== bench @ sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -E '^\{'

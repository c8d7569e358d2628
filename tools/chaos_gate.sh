#!/bin/bash
# Standing executor-loss gate: run ChaosSmoke (two real executor JVMs,
# one killed mid-query / mid-drain) and append a one-line result with the
# commit hash to CHAOS.md, so the evidence regenerates every round
# instead of living in one commit message.
#
# Usage: tools/chaos_gate.sh [sf-dir]   (default /root/testdata/sf0.1)
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT=$(SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  tools/run_one.sh graft.ChaosSmoke "$SF_DIR" 2>&1)
SUMMARY=$(echo "$OUT" | grep -E '^\[chaos\]' | tail -4 | tr '\n' ' ')
STATUS=$(echo "$OUT" | grep -c '\[chaos\] ALL LEGS OK')
LINE="- $(date -u +%Y-%m-%dT%H:%M:%SZ) @$(git rev-parse --short HEAD) sf=$(basename "$SF_DIR") $([ "$STATUS" -eq 1 ] && echo PASS || echo FAIL): $SUMMARY"
if [ ! -f CHAOS.md ]; then
  {
    echo "# Executor-loss chaos gate"
    echo
    echo "One line per scripted \`tools/chaos_gate.sh\` run (graft.ChaosSmoke on"
    echo "local-cluster[2,4,2048]: an executor JVM is killed mid-query in a"
    echo "3-shuffle batch chain and mid-drain in the streaming incremental"
    echo "publish; results must be bit-identical to the undisturbed truth)."
    echo
  } > CHAOS.md
fi
echo "$LINE" >> CHAOS.md
echo "$LINE"
[ "$STATUS" -eq 1 ]

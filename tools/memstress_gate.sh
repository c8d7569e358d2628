#!/bin/bash
# Standing bounded-memory gate: run graft.MemStress (the heaviest
# registered rows on local-cluster[2,2,768] — two executor JVMs starved
# to 768 MiB — vs a comfortable local run, bit-parity required) and
# append a one-line dated result with the commit hash to MEMSTRESS.md.
#
# Usage: tools/memstress_gate.sh [sf-dir]   (default /root/testdata/sf0.1)
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT=$(SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  tools/run_one.sh graft.MemStress "$SF_DIR" 2>&1)
SUMMARY=$(echo "$OUT" | grep -E '^\[mem\] (ALL OK|[0-9]+ row)' | tail -1)
STATUS=$(echo "$OUT" | grep -c '\[mem\] ALL OK')
LINE="- $(date -u +%Y-%m-%dT%H:%M:%SZ) @$(git rev-parse --short HEAD) sf=$(basename "$SF_DIR") $([ "$STATUS" -eq 1 ] && echo PASS || echo FAIL): $SUMMARY"
if [ ! -f MEMSTRESS.md ]; then
  {
    echo "# Bounded-memory stress gate"
    echo
    echo "One line per scripted \`tools/memstress_gate.sh\` run"
    echo "(graft.MemStress: the heaviest registered rows — dedup_edit,"
    echo "dedup_span, sim_reciprocal_nn_ivf, pipeline_prep,"
    echo "q59_percentile_disc — on local-cluster[2,2,768], two executor"
    echo "JVMs starved to 768 MiB; must finish spill-not-OOM with results"
    echo "bit-identical to a comfortable local run)."
    echo
  } > MEMSTRESS.md
fi
echo "$LINE" >> MEMSTRESS.md
echo "$LINE"
[ "$STATUS" -eq 1 ]

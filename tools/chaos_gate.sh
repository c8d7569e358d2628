#!/bin/bash
# Standing chaos gate, two scripted legs per run:
#
#  1. Executor loss (graft.ChaosSmoke on local-cluster[2,4,2048]): an
#     executor JVM is killed mid-query in a 3-shuffle batch chain,
#     mid-drain in the streaming incremental publish, and mid-race under
#     three concurrent atomic publishers (torn-read / pointer-regression /
#     reaped-success invariants); results must be bit-identical to the
#     undisturbed truth.
#  2. DRIVER restart (graft.ChaosDriverRestart): the whole streaming
#     driver JVM is SIGKILLed mid-drain (committed and uncommitted
#     micro-batches outstanding), a fresh JVM resumes from the
#     checkpoint, and the published table must equal batch truth — the
#     retry-to-idempotent-overwrite contract at the process level.
#
# Appends a one-line dated result with the commit hash to CHAOS.md, so
# the evidence regenerates every round instead of living in one commit
# message.
#
# Usage: tools/chaos_gate.sh [sf-dir]   (default /root/testdata/sf0.1)
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"

# ---- leg A: executor loss --------------------------------------------------
OUT=$(SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  tools/run_one.sh graft.ChaosSmoke "$SF_DIR" 2>&1)
SUMMARY=$(echo "$OUT" | grep -E '^\[chaos\]' | tail -4 | tr '\n' ' ')
EXEC_OK=$(echo "$OUT" | grep -c '\[chaos\] ALL LEGS OK')

# ---- leg B: driver SIGKILL mid-drain + checkpoint resume -------------------
WORK=$(mktemp -d /tmp/graft_chaos_restart.XXXXXX)
RESTART_OK=0
RESTART_NOTE="restart: setup failed"
if tools/run_one.sh graft.ChaosDriverRestart prepare "$SF_DIR" "$WORK" \
     > "$WORK/prepare.log" 2>&1; then
  tools/run_one.sh graft.ChaosDriverRestart drain "$WORK" 400 \
    > "$WORK/drain1.log" 2>&1 &
  DRAIN_PID=$!
  # SIGKILL once a few micro-batches have committed (and well before all
  # 40 have): real process death, no shutdown hooks
  for _ in $(seq 1 600); do
    N_COMMITS=$(ls "$WORK/ck/commits" 2>/dev/null | grep -vc '\.tmp' || true)
    [ "${N_COMMITS:-0}" -ge 3 ] && break
    sleep 0.2
  done
  kill -9 "$DRAIN_PID" 2>/dev/null
  wait "$DRAIN_PID" 2>/dev/null
  K=$(ls "$WORK/ck/commits" 2>/dev/null | grep -vc '\.tmp' || true)
  if [ "${K:-0}" -ge 1 ] && [ "${K:-0}" -lt 40 ]; then
    if tools/run_one.sh graft.ChaosDriverRestart drain "$WORK" 0 \
         > "$WORK/drain2.log" 2>&1 \
       && tools/run_one.sh graft.ChaosDriverRestart check "$WORK" \
         > "$WORK/check.log" 2>&1; then
      RESTART_OK=1
      RESTART_NOTE="restart leg OK: SIGKILL after $K/40 committed batches, resume from checkpoint, $(grep -o 'published == batch truth[^"]*' "$WORK/check.log" | head -1)"
    else
      RESTART_NOTE="restart: FAIL — $(tail -1 "$WORK/check.log" 2>/dev/null)"
    fi
  else
    RESTART_NOTE="restart: vacuous kill window (commits=$K of 40) — not counted as PASS"
  fi
fi
rm -rf "$WORK"

STATUS=$([ "$EXEC_OK" -eq 1 ] && [ "$RESTART_OK" -eq 1 ] && echo PASS || echo FAIL)
LINE="- $(date -u +%Y-%m-%dT%H:%M:%SZ) @$(git rev-parse --short HEAD) sf=$(basename "$SF_DIR") $STATUS: $SUMMARY| $RESTART_NOTE"
if [ ! -f CHAOS.md ]; then
  {
    echo "# Chaos gate (executor loss + driver restart)"
    echo
    echo "One line per scripted \`tools/chaos_gate.sh\` run. Leg A:"
    echo "graft.ChaosSmoke on local-cluster[2,4,2048] — an executor JVM is"
    echo "killed mid-query in a 3-shuffle batch chain and mid-drain in the"
    echo "streaming incremental publish; results must be bit-identical to"
    echo "the undisturbed truth. Leg B: graft.ChaosDriverRestart — the whole"
    echo "streaming driver JVM is SIGKILLed mid-drain, a fresh JVM resumes"
    echo "from the checkpoint, and the published table must equal batch"
    echo "truth (the reference's retry-to-idempotent-overwrite contract at"
    echo "the process level)."
    echo
  } > CHAOS.md
fi
echo "$LINE" >> CHAOS.md
echo "$LINE"
[ "$STATUS" = "PASS" ]

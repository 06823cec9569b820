#!/bin/bash
# Sequential on-chip runbook executor (docs/ONCHIP_RUNBOOK.md, round 5).
# Launched by the health watcher (or by hand) the moment the tunnel is
# healthy. Rules (.claude/skills/verify/SKILL.md): NO shell timeouts —
# killing a TPU job mid-compile wedges the remote compile service for
# ~45 min; steps run strictly sequentially (single chip, no contention);
# every step streams into its own log under docs/onchip_r5/.
#
# Order = capture value: the driver-visible bench first (the round-3
# verdict's #1 miss was a round with zero captured numbers), then the
# config-deciding A/Bs, then the scale sweeps, then the long soak.
set -u
OUT=/root/repo/docs/onchip_r5
mkdir -p "$OUT"
cd /root/repo
LOCK="$OUT/.running"
if [ -e "$LOCK" ]; then
  echo "runbook already running ($LOCK exists)" >> "$OUT/runbook.log"
  exit 0
fi
trap 'rm -f "$LOCK"' EXIT
: > "$LOCK"

run() {
  local name=$1; shift
  echo "=== $name start $(date -u +%F' '%T)" >> "$OUT/runbook.log"
  "$@" > "$OUT/$name.out" 2>&1
  echo "=== $name rc=$? end $(date -u +%F' '%T)" >> "$OUT/runbook.log"
}

# Pause any CPU-side drift run (by pidfile, never by pattern) for the
# host-sensitive bench: a 90%-CPU trainer on the 1-core host would
# pollute the ingest host phases. Resumed right after.
DRIFT_PID=""
if [ -f /tmp/drift.pid ] && grep -q synth_drift \
    "/proc/$(cat /tmp/drift.pid)/cmdline" 2>/dev/null; then
  DRIFT_PID=$(cat /tmp/drift.pid)
  kill -STOP "$DRIFT_PID" 2>/dev/null && \
    echo "paused drift pid $DRIFT_PID for bench" >> "$OUT/runbook.log"
fi
run bench        python bench.py
if [ -n "$DRIFT_PID" ]; then
  kill -CONT "$DRIFT_PID" 2>/dev/null && \
    echo "resumed drift pid $DRIFT_PID" >> "$OUT/runbook.log"
fi
run transfer     python tools/transfer_sweep.py \
                     --modes int16 int16d int12 mel8 mulaw8
run int8enc_ab   python tools/profile_int8enc_ab.py
# production-geometry drift at decision strength: reuse the committed
# 6000-step checkpoint (docs/onchip_r5/drift_tiny_prod.npz) — training
# from scratch costs hours; --load-model makes the re-score ~15 min
run drift_prod   env MAS_DRIFT_TPU=1 python tools/synth_drift.py \
                     --production --steps 0 --clips 96 \
                     --load-model "$OUT/drift_tiny_prod.npz" \
                     --out "$OUT/drift_rescore.json"
run soak30       python tools/soak.py --loop-minutes 30
echo "=== runbook complete $(date -u +%F' '%T)" >> "$OUT/runbook.log"

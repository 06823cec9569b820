#!/bin/bash
# Sequential on-chip runbook executor (docs/ONCHIP_RUNBOOK.md, round 4).
# Launched by the health watcher (or by hand) the moment the tunnel is
# healthy. Rules (.claude/skills/verify/SKILL.md): NO shell timeouts —
# killing a TPU job mid-compile wedges the remote compile service for
# ~45 min; steps run strictly sequentially (single chip, no contention);
# every step streams into its own log under docs/onchip_r4/.
#
# Order = capture value: the driver-visible bench first (the round-3
# verdict's #1 miss was a round with zero captured numbers), then the
# config-deciding A/Bs, then the scale sweeps.
set -u
OUT=/root/repo/docs/onchip_r4
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
                     --modes int16 int12 mel16 mel12 mel8 mulaw8
run scan_ab      python tools/profile_decode_scan_ab.py
run stream_ab    python tools/profile_encoder_stream_ab.py
run stream_ab10  python tools/profile_encoder_stream_ab.py --t 500
run ivf_1m       python tools/bench_ivf.py
run headpair_ab  python tools/profile_headpair_ab.py
run drift_prod   env MAS_DRIFT_TPU=1 python tools/synth_drift.py \
                     --production --steps 1200 --clips 64 \
                     --out "$OUT/synth_drift_production.json"
echo "=== runbook complete $(date -u +%F' '%T)" >> "$OUT/runbook.log"

#!/bin/bash
# Detached TPU health probe loop (wedged-backend recovery workflow,
# .claude/skills/verify/SKILL.md). Repeatedly runs tools/chip_probe.py
# in a DISPOSABLE process (each attempt hangs ~25 min in the wedged
# state before failing, so attempts are inherently rate-limited; a
# short sleep between them covers fast failures). The moment a probe
# reports ok, launches the on-chip runbook and exits.
#
#   nohup bash tools/tpu_probe_loop.sh > /tmp/tpu_probe_loop.out 2>&1 &
#
# Never SIGKILL the probe child mid-attempt: it is disposable by
# design; let each attempt run to completion.
set -u
cd /root/repo
N=0
while true; do
  N=$((N + 1))
  echo "--- probe attempt $N $(date -u +%F' '%T)"
  OUT=$(python tools/chip_probe.py 2>&1 | tail -1)
  echo "$OUT"
  if echo "$OUT" | grep -q '"ok": true'; then
    echo "TPU HEALTHY $(date -u +%F' '%T) — launching runbook"
    nohup bash tools/run_onchip_runbook.sh > /tmp/runbook_launch.out 2>&1 &
    exit 0
  fi
  sleep 300
done

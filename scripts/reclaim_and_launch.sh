#!/bin/bash
# Reclaim loop (docs/RUNBOOK.md "Relay wedge"): poll the device with a
# bounded doctor probe every ~3 min; as soon as the claim answers, launch
# the command given as "$@" in the foreground. If the launched run itself
# exits 97 (wedge re-formed mid-claim), go back to polling. Any other exit
# code ends the loop with that code.
#
# Usage: nohup bash scripts/reclaim_and_launch.sh python scripts/... &
set -u
cd "$(dirname "$0")/.."
ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[reclaim] attempt $ATTEMPT: doctor probe $(date -u +%H:%M:%S)"
  timeout 180 python -m nsc_tpu doctor --timeout 120 > /dev/null 2>&1
  rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "[reclaim] doctor rc=$rc (wedged/claimed); sleeping 180s"
    sleep 180
    continue
  fi
  echo "[reclaim] device ok; launching: $* $(date -u +%H:%M:%S)"
  "$@"
  rc=$?
  if [ "$rc" -eq 97 ]; then
    echo "[reclaim] run exited 97 (wedge re-formed); back to polling"
    sleep 180
    continue
  fi
  echo "[reclaim] run finished rc=$rc $(date -u +%H:%M:%S)"
  exit "$rc"
done

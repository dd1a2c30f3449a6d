#!/bin/bash
# Reclaim loop (docs/RUNBOOK.md "Relay wedge"): repeatedly attempt the given
# command; the run's own device_liveness_check (bounded by
# NSC_DEVICE_CHECK_TIMEOUT, here 150 s) exits 97 while the relay claim is
# wedged, and we retry after a pause. No separate doctor probe is made first:
# an extra claim/release cycle immediately before the real launch was
# observed (2026-08-19 04:13-04:15) to precede a fresh wedge, so the launch
# attempt IS the probe. Any exit code other than 97/134 ends the loop.
#
# Usage: nohup bash scripts/reclaim_and_launch.sh python scripts/... &
set -u
cd "$(dirname "$0")/.."
export NSC_DEVICE_CHECK_TIMEOUT="${NSC_DEVICE_CHECK_TIMEOUT:-150}"
ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[reclaim] attempt $ATTEMPT: launching: $* $(date -u +%H:%M:%S)"
  "$@"
  rc=$?
  # 97 = liveness wedge exit; 134 = SIGABRT seen from deadline-guarded
  # teardown while wedged — both mean "device not usable yet, retry"
  if [ "$rc" -eq 97 ] || [ "$rc" -eq 134 ]; then
    echo "[reclaim] rc=$rc (device wedged); sleeping 120s"
    sleep 120
    continue
  fi
  echo "[reclaim] run finished rc=$rc $(date -u +%H:%M:%S)"
  exit "$rc"
done

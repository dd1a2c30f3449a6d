#!/bin/bash
# Harvest a live run's rolling inference checkpoints (r5).
#
# The train loop keeps only the last 3 `infer/<step>` checkpoints (orbax
# eviction) and `infer_best/` is selected by WINDOWED TRAIN mel — so if
# held-out quality peaks mid-run and declines (the finetune-overfit episode,
# docs/PERFORMANCE.md r5), the held-out-best checkpoint is EVICTED before
# the run ends and no post-hoc selection can recover it. This sidecar copies
# every completed rolling checkpoint into `<run>/harvest/<step>/` (42 MB
# each for base_fast; ~1 GB for a 50k/2k-cadence run) so
# scripts/heldout_trend.py can evaluate ALL candidates and
# scripts/export_flagship.py --step can export the held-out winner.
#
# Safe against mid-write reads: the NEWEST step dir is skipped until a newer
# one appears (orbax finalizes a step before the next save starts), except
# after training exits, when everything is copied.
#
# Usage: scripts/harvest_checkpoints.sh <run_dir> [pid_file]
#   pid_file default /tmp/train_run.pid — harvest exits once that pid is
#   gone and the final checkpoint is copied.
set -u
RUN=${1:?usage: harvest_checkpoints.sh <run_dir> [pid_file]}
PIDFILE=${2:-/tmp/train_run.pid}
mkdir -p "$RUN/harvest"

copy_step() {
  local s=$1
  [ -d "$RUN/harvest/$s" ] && return 0
  cp -r "$RUN/infer/$s" "$RUN/harvest/.tmp_$s" \
    && mv "$RUN/harvest/.tmp_$s" "$RUN/harvest/$s" \
    && echo "$(date -u +%H:%M:%S) harvested $s"
}

while true; do
  if [ -d "$RUN/infer" ]; then
    steps=$(ls "$RUN/infer" 2>/dev/null | sort -n)
    latest=$(echo "$steps" | tail -1)
    for s in $steps; do
      [ "$s" = "$latest" ] || copy_step "$s"
    done
    if ! kill -0 "$(cat "$PIDFILE" 2>/dev/null)" 2>/dev/null; then
      for s in $steps; do copy_step "$s"; done
      echo "$(date -u +%H:%M:%S) training pid gone; harvest complete"
      exit 0
    fi
  fi
  sleep 90
done

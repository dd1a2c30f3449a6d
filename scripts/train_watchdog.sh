#!/bin/bash
# Training supervisor for long runs on the relay-tunneled TPU rig
# (SURVEY.md §6 "Failure detection / elastic recovery" row).
#
# Launches `python -m nsc_tpu.train`, then restarts it whenever the process
# dies OR the metrics file goes stale (>STALE_S seconds without a new row —
# the relay link occasionally wedges a d2h pull forever; auto-resume from the
# latest full checkpoint makes a kill+relaunch safe). Hard-learned details:
#
#   * 15-min grace after every (re)launch: restore + the cold step compile
#     produce no metrics rows, and a shorter grace made the stale detector
#     thrash-restart the run 6 times in round 3 (runs/watchdog.log).
#   * stale threshold 600 s: normal logging cadence is ~25-40 s/row; the
#     async checkpoint pull can legitimately pause rows for ~3-5 min.
#   * stop file: `touch $STOP_FILE` ends supervision (the training process
#     itself is left alone — kill $(cat $PID_FILE) separately if needed).
#   * stale orbax tmp dirs from a killed writer are removed pre-launch or
#     orbax refuses the next save at the same step.
#   * WEDGE BACKOFF (2026-08-17 incident): when the relay's device claim
#     wedges pool-side, restarts hang in backend init forever — this loop
#     thrash-restarted hourly for 4 h with zero progress. Now: the train
#     process runs a pre-flight liveness probe (nsc_tpu/utils/liveness.py)
#     and prints "NSC-LIVENESS: DEVICE WEDGED" / "NSC-LIVENESS: RUN STALLED"
#     markers; after each restart that produced no new metrics row, the
#     fruitless counter rises and relaunch waits an extra
#     WEDGE_BACKOFF_S * count (capped 30 min) — restarting cannot un-wedge
#     a pool grant, so stop hammering it.
#
# Usage:
#   scripts/train_watchdog.sh WORKDIR [extra nsc_tpu.train args...]
# e.g.
#   scripts/train_watchdog.sh runs/base_fast_40k \
#     --config base_fast --data synthetic --steps 40000 --batch-size 64 \
#     --warmup-steps 2000 --full-state-every 2000
set -u
WORKDIR=${1:?usage: train_watchdog.sh WORKDIR [train args...]}
shift
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORKDIR=$(cd "$REPO" && mkdir -p "$WORKDIR" && cd "$WORKDIR" && pwd)
M="$WORKDIR/metrics.jsonl"
LOG="$WORKDIR.log"
WLOG="$REPO/runs/watchdog.log"
PID_FILE=${PID_FILE:-/tmp/train_run.pid}
STOP_FILE=${STOP_FILE:-/tmp/train_stop}
# grace 1500 (was 900): on 2026-08-19 a relaunch restoring the step-80000
# full state while a pytest run shared the single host core produced its
# first metrics row >976 s after launch — the 900 s grace stale-killed a
# HEALTHY restore mid-pull, and the fruitless counter then charged the kill
# to the device. 1500 s covers restore+cold-compile on a contended host;
# legit-stall detection only moves out by the same 10 min, which a
# multi-hour run can afford.
GRACE_S=${GRACE_S:-1500}
STALE_S=${STALE_S:-600}
WEDGE_BACKOFF_S=${WEDGE_BACKOFF_S:-300}
TOTAL_STEPS=$(printf ' %s ' "$@" | grep -oP -- '--steps[= ]\K[0-9]+' || echo "")
FRUITLESS=0
LAST_M_T=0

# A stop file left behind by a previous session (round_close.sh touches it
# and nothing removes it) must not silently end THIS supervision run at the
# first loop tick — starting the watchdog is an explicit request to
# supervise, so begin from a clean slate.
rm -f "$STOP_FILE"

launch() {
  # fruitless-restart accounting: if metrics advanced since the previous
  # launch, the last incarnation made progress — reset the wedge counter.
  m_t=$(stat -c %Y "$M" 2>/dev/null || echo 0)
  if [ "$m_t" -gt "$LAST_M_T" ]; then FRUITLESS=0; else FRUITLESS=$((FRUITLESS + 1)); fi
  LAST_M_T=$m_t
  if [ "$FRUITLESS" -ge 2 ] || tail -c 4000 "$LOG" 2>/dev/null \
      | grep -q "NSC-LIVENESS: DEVICE WEDGED"; then
    backoff=$(( WEDGE_BACKOFF_S * FRUITLESS ))
    [ "$backoff" -lt "$WEDGE_BACKOFF_S" ] && backoff=$WEDGE_BACKOFF_S
    [ "$backoff" -gt 1800 ] && backoff=1800
    echo "$(date) wedge suspected (fruitless=$FRUITLESS) -> backoff ${backoff}s" >> "$WLOG"
    sleep "$backoff"
    [ -f "$STOP_FILE" ] && { echo "$(date) stop file -> exit" >> "$WLOG"; exit 0; }
  fi
  rm -rf "$WORKDIR"/train/*.orbax-checkpoint-tmp \
         "$WORKDIR"/infer/*.orbax-checkpoint-tmp \
         "$WORKDIR"/infer_best/*.orbax-checkpoint-tmp
  PYTHONPATH="$REPO:${PYTHONPATH:-}" nohup python -m nsc_tpu.train \
    --workdir "$WORKDIR" "$@" >> "$LOG" 2>&1 &
  echo $! > "$PID_FILE"
  LAUNCH_T=$(date +%s)
  echo "$(date) launched pid $(cat "$PID_FILE") ($WORKDIR)" >> "$WLOG"
}
LAST_M_T=$(stat -c %Y "$M" 2>/dev/null || echo 0)
FRUITLESS=-1   # first launch is not a restart
launch "$@"
while true; do
  sleep 120
  [ -f "$STOP_FILE" ] && { echo "$(date) stop file -> exit" >> "$WLOG"; exit 0; }
  if [ -n "$TOTAL_STEPS" ] && tail -c 2000 "$M" 2>/dev/null \
      | grep -q "\"step\": $TOTAL_STEPS,"; then
    echo "$(date) run complete" >> "$WLOG"; exit 0
  fi
  now=$(date +%s)
  # Death detection runs BEFORE the grace gate: a dead pid is unambiguous
  # (no risk of killing a healthy restore), and during a relay wedge the
  # liveness probe exits 97 within minutes — gating detection on the grace
  # stretched every reclaim attempt to GRACE_S (25 min) per cycle.
  if ! kill -0 "$(cat "$PID_FILE")" 2>/dev/null; then
    # The training process is our child, so `wait` can recover its exit
    # status even after death. rc==0 means main() returned cleanly — the
    # run is COMPLETE (covers --steps=N and config-default step counts the
    # TOTAL_STEPS grep can't see); anything else (crash, liveness exit
    # 97/98/99, kill) is a restart. 127 = unknown pid (not our child after
    # a supervisor restart): fall through to restart, auto-resume makes
    # relaunching a finished run a no-op that then exits 0.
    wait "$(cat "$PID_FILE")" 2>/dev/null
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "$(date) process exited 0 -> run complete" >> "$WLOG"; exit 0
    fi
    echo "$(date) process gone (rc=$rc) -> restart" >> "$WLOG"
    launch "$@"; continue
  fi
  # the stale check below, by contrast, DOES need the grace: restore +
  # cold compile legitimately produce no metrics rows for many minutes
  [ $(( now - LAUNCH_T )) -lt "$GRACE_S" ] && continue
  age=$(( now - $(stat -c %Y "$M" 2>/dev/null || echo 0) ))
  if [ "$age" -gt "$STALE_S" ]; then
    echo "$(date) stale ${age}s -> restart" >> "$WLOG"
    kill "$(cat "$PID_FILE")" 2>/dev/null; sleep 8
    kill -9 "$(cat "$PID_FILE")" 2>/dev/null; sleep 4
    launch "$@"
  fi
done

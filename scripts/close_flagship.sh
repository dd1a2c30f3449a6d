#!/bin/bash
# One-command flagship close (r5): stop the run, score EVERY harvested
# checkpoint held-out, export the winner, refit its codebooks, bound it with
# the autoencoder ceiling, then run the round_close capture sequence.
#
# Exists because the close is where rounds historically lost artifacts: r3
# lost both driver captures to host contention, r4 lost run #2 to a VM reset,
# and the r5 close was done by hand against a wall-clock deadline. Each stage
# below is restartable (heldout_trend resumes, export/refit gate on measured
# improvement, round_close re-runs cleanly), so a crash mid-close loses one
# stage, not the round.
#
# Usage:
#   scripts/close_flagship.sh RUN_DIR NAME_PREFIX [DATA] [SEGMENT_LEN]
# e.g.
#   scripts/close_flagship.sh runs/base_fast_synthetic2_50k \
#       base_fast_synthetic2 synthetic2 17600
#
# Skips export when the held-out winner is a step that is already exported
# (the existing artifact stays the headline); round_close still recaptures
# bench/suite/dryrun/smoke either way.
set -u -o pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

RUN=${1:?usage: close_flagship.sh RUN_DIR NAME_PREFIX [DATA] [SEGMENT_LEN]}
PREFIX=${2:?usage: close_flagship.sh RUN_DIR NAME_PREFIX [DATA] [SEGMENT_LEN]}
DATA=${3:-synthetic2}
SEG=${4:-17600}
CONFIG=${CONFIG:-base_fast}
PID_FILE=${PID_FILE:-/tmp/train_run.pid}
STOP_FILE=${STOP_FILE:-/tmp/train_stop}

echo "== close 1/7: stop training =="
touch "$STOP_FILE"
if [ -f "$PID_FILE" ] && kill -0 "$(cat "$PID_FILE")" 2>/dev/null; then
  kill "$(cat "$PID_FILE")" 2>/dev/null
  for i in $(seq 1 12); do
    kill -0 "$(cat "$PID_FILE")" 2>/dev/null || break; sleep 5
  done
  kill -9 "$(cat "$PID_FILE")" 2>/dev/null
fi
sleep 3
echo "  training stopped"

echo "== close 2/7: final harvest sweep =="
# the harvest sidecar exits on its own once the pid is gone; sweep once more
# ourselves so this script does not depend on the sidecar still running
for s in $(ls "$RUN/infer" 2>/dev/null); do
  [ -d "$RUN/harvest/$s" ] && continue
  cp -r "$RUN/infer/$s" "$RUN/harvest/.tmp_$s" \
    && mv "$RUN/harvest/.tmp_$s" "$RUN/harvest/$s" && echo "  harvested $s"
done

echo "== close 3/7: held-out trend over all harvested checkpoints =="
# --cpu: every existing trend row was CPU-scored (the in-run sidecar runs on
# CPU while training holds the chip); keep the winner comparison
# single-numerics. ~75 s/checkpoint on this host.
timeout 5400 python scripts/heldout_trend.py "$RUN" --config "$CONFIG" \
  --data "$DATA" --segment-len "$SEG" --cpu || exit 1

echo "== close 4/7: pick the held-out winner =="
BEST=$(python - "$RUN" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(f"{sys.argv[1]}/heldout_trend.jsonl") if l.strip()]
rows.sort(key=lambda r: r["step"])
by_step = {r["step"]: r["mel_short"] for r in rows}

# adjacent rows differ by ~±0.02 on this eval batch (run-2 trend), so a raw
# min() picks a lucky draw; smooth each candidate with its harvested
# neighbors and let the smoothed curve choose
def smoothed(i):
    vals = [rows[j]["mel_short"] for j in (i - 1, i, i + 1) if 0 <= j < len(rows)]
    return sum(vals) / len(vals)

i = min(range(len(rows)), key=smoothed)
best = rows[i]
print(best["step"])
print(f"held-out winner: step {best['step']} mel_short {best['mel_short']:.4f} "
      f"(smoothed {smoothed(i):.4f}) si_snr {best['si_snr_short']:.2f} dB "
      f"of {len(rows)} candidates", file=sys.stderr)
PYEOF
) || exit 1
NAME="${PREFIX}_$((BEST / 1000))k"
echo "  winner: step $BEST -> artifacts/$NAME"

if [ -d "artifacts/$NAME" ]; then
  echo "  artifacts/$NAME already exported — keeping it as the headline"
else
  echo "== close 5/7: export + codebook refit =="
  timeout 1800 python scripts/export_flagship.py "$RUN" --name "$NAME" \
    --config "$CONFIG" --step "$BEST" --data "$DATA" --segment-len "$SEG" \
    || exit 1
  timeout 3600 python scripts/refit_flagship.py "artifacts/$NAME" \
    --export "artifacts/${NAME}_refit"
  rc=$?
  # rc 2 = the refit gate REFUSED export (worsened full-depth mel); the
  # unrefit artifact remains the valid headline — not a close failure
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 2 ]; then exit "$rc"; fi
fi

echo "== close 6/7: rate-distortion ceiling on the headline artifact =="
timeout 3600 python scripts/rd_ceiling.py || exit 1

echo "== close 7/7: round_close capture sequence =="
exec bash scripts/round_close.sh

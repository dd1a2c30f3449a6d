#!/bin/bash
# Round-end capture sequence (VERDICT r3 "next" #5: capture hygiene).
#
# Round 3 lost both driver artifacts to contention: a 40k training run +
# watchdog left hot through the capture window cost −15% on BENCH_r03 and
# pushed the multichip dryrun past the driver's 10-minute timeout. This
# script is the institutionalized fix: run it BEFORE the round ends, in this
# order, with nothing else on the host.
#
#   1. stop supervision + training, verify the pids are gone
#   2. let the chip/host idle a few seconds
#   3. bench.py            -> canonical headline JSON (driver re-runs this)
#   4. bench_suite.py      -> regenerated bench_suite.json
#   5. timed dryrun        -> proves MULTICHIP will fit the 10-min budget
#   6. fast smoke tests    -> pytest -m smoke (<~5 min, forced CPU)
#
# Usage: scripts/round_close.sh [--skip-suite] [--skip-dryrun] [--skip-tests]
set -u -o pipefail  # pipefail: `bench.py | tee` must fail on BENCH failure,
                    # not report tee's exit status
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
SKIP_SUITE=""; SKIP_DRYRUN=""; SKIP_TESTS=""
for a in "$@"; do case "$a" in
  --skip-suite) SKIP_SUITE=1;; --skip-dryrun) SKIP_DRYRUN=1;;
  --skip-tests) SKIP_TESTS=1;; esac; done

echo "== 1/6 stopping training + watchdog =="
touch /tmp/train_stop
for f in /tmp/train_run.pid; do
  if [ -f "$f" ] && kill -0 "$(cat "$f")" 2>/dev/null; then
    kill "$(cat "$f")" 2>/dev/null; sleep 8
    kill -9 "$(cat "$f")" 2>/dev/null
    echo "  killed training pid $(cat "$f")"
  fi
done
sleep 5
if [ -f /tmp/train_run.pid ] && kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; then
  echo "  ERROR: training pid still alive — aborting capture"; exit 1
fi
echo "  host quiet"

echo "== 2/6 idle settle + device health =="
sleep 10
# Bounded-time wedge check (docs/RUNBOOK.md "Relay wedge"): when the relay
# claim is hung, say so NOW instead of burning the bench/suite timeouts —
# the only remedy is waiting for the pool to reclaim the grant.
# outer budget > 2x the per-stage deadline: doctor runs TWO deadline-guarded
# backend touches (devices + probe), so its worst case is ~2x --timeout
if ! timeout 420 python -m nsc_tpu doctor --timeout 180 --json; then
  echo "  ERROR: device wedged/errored (see doctor output) — captures would"
  echo "  hang or lie; retry round_close when 'doctor' exits 0"; exit 1
fi

echo "== 3/6 bench.py (headline) =="
timeout 1200 python bench.py | tee /tmp/round_close_bench.json || exit 1

if [ -z "$SKIP_SUITE" ]; then
  echo "== 4/6 bench_suite.py -> bench_suite.json =="
  timeout 3600 python bench_suite.py || exit 1
  # Staleness guard (VERDICT r4 #4): the suite's flagship rows and bench.py's
  # headline must describe the SAME checkpoint — round 4 shipped a suite
  # captured against the pre-refit artifact while the headline had moved on.
  python - <<'PYEOF' || exit 1
import json, sys
bench = json.load(open("/tmp/round_close_bench.json"))
suite = json.load(open("bench_suite.json"))
c5 = next((r for r in suite if r.get("config") == 5), None)
sc = c5.get("flagship_checkpoint") if c5 else None
bc = bench.get("checkpoint")
if bc != sc:
    print(f"STALENESS GUARD FAILED: bench.py measured {bc!r} but "
          f"bench_suite.json flagship rows are {sc!r} — regenerate the suite "
          f"against the current headline artifact", file=sys.stderr)
    sys.exit(1)
print(f"staleness guard ok: both artifacts == {bc!r}")
PYEOF
fi

if [ -z "$SKIP_DRYRUN" ]; then
  echo "== 5/6 timed multichip dryrun (budget: 600 s) =="
  START=$(date +%s)
  timeout 600 python -c \
    "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('DRYRUN_OK')" \
    || { echo "  DRYRUN FAILED/TIMED OUT"; exit 1; }
  echo "  dryrun wall: $(( $(date +%s) - START )) s (must be <600 with margin)"
fi

if [ -z "$SKIP_TESTS" ]; then
  echo "== 6/6 smoke tests =="
  timeout 1800 python -m pytest tests/ -m smoke -q || exit 1
fi
echo "== round_close complete =="

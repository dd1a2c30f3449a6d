"""Device liveness + in-process stall detection (SURVEY.md §6 failure row).

Motivation (2026-08-17 incident, runs/watchdog.log): the relay's device leg
wedged mid-run — the training process hung inside a device pull at step 600,
and every supervisor restart then hung inside backend init (``jax.devices()``
never returned).  From *outside* the process a hung claim is indistinguishable
from a slow cold compile, so the supervisor thrash-restarted hourly for four
hours without ever making progress.  These helpers give the process itself a
voice:

- :func:`device_liveness_check` proves the backend answers a tiny program
  within a deadline, else prints a one-line diagnosis and exits with
  :data:`EXIT_DEVICE_WEDGED`.  Run it *before* expensive startup work
  (data-init, state init, the cold step compile) so a wedged claim fails in
  seconds, not after a 16-minute supervisor grace.
- :class:`Heartbeat` is a training-loop stall detector: the loop calls
  :meth:`Heartbeat.beat` at every synchronous point (metric readback); a
  monitor thread exits the process with :data:`EXIT_STALLED` if no beat
  arrives within the deadline.  A clean, *distinctive* exit beats an external
  ``kill -9``: the supervisor can tell "device wedged / run stalled" apart
  from "process crashed" and back off accordingly (restarting cannot un-wedge
  a pool grant).

A wedged device call cannot be interrupted from Python (the thread is parked
inside the PJRT client), so both helpers use a *monitor thread* +
``os._exit`` rather than trying to cancel the call.  ``os._exit`` skips
atexit/orbax finalizers on purpose — they would themselves touch the wedged
client and hang the exit.

The printed markers (``NSC-LIVENESS: ...``) are part of the supervisor
contract: ``scripts/train_watchdog.sh`` greps the run log for them.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional

EXIT_DEVICE_WEDGED = 97
EXIT_STALLED = 98
EXIT_RSS_LIMIT = 99

_MARKER_WEDGED = "NSC-LIVENESS: DEVICE WEDGED"
_MARKER_STALLED = "NSC-LIVENESS: RUN STALLED"
_MARKER_RSS = "NSC-LIVENESS: HOST RSS LIMIT"


def _default_probe() -> float:
    """One tiny device program, result read back to host (the readback is the
    point: on the relay rig dispatch alone succeeds even when d2h is dead —
    see CLAUDE.md on ``block_until_ready`` being a relay no-op)."""
    import jax
    import jax.numpy as jnp

    x = jnp.full((8, 128), 2.0, jnp.float32)
    return float(jnp.sum(x * x))


def host_rss_gb() -> float:
    """This process's resident set size in GiB (``/proc/self/statm``, zero
    deps). 0.0 where /proc is unavailable (non-Linux) — callers treat that
    as "unknown, don't act"."""
    try:
        with open("/proc/self/statm") as f:
            resident_pages = int(f.read().split()[1])
        return resident_pages * os.sysconf("SC_PAGE_SIZE") / 2**30
    except (OSError, ValueError, IndexError):
        return 0.0


def rss_exit_limit_gb() -> Optional[float]:
    """Host-RSS ceiling above which a long run should checkpoint and exit
    (2026-08-19 incident: the relay client retains a host copy of every
    h2d transfer buffer — one 4.5 MB batch per step — so the flagship train
    process grew to 130 GB in 2.7 h and the OOM killer SIGKILLed it mid-run,
    leaving a wedged pool grant behind. A *clean* exit at a checkpoint
    boundary costs one relaunch; a SIGKILL risks the async writer and wedges
    the device claim).

    ``NSC_RSS_EXIT_GB`` overrides (0 disables). Default: 80% of MemTotal on
    hosts with >=32 GB, else disabled — on small CI boxes the Python+JAX
    baseline alone could graze a relative limit and self-kill healthy tests.
    """
    env = os.environ.get("NSC_RSS_EXIT_GB")
    if env is not None:
        v = float(env)
        return v if v > 0 else None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) / 2**20  # kB -> GiB
                    break
            else:
                return None
    except (OSError, ValueError):
        return None
    return 0.8 * total_gb if total_gb >= 32 else None


def run_with_deadline(
    fn: Callable[[], object], timeout_s: float
) -> tuple:
    """Run ``fn`` in a daemon thread under a deadline — the building block
    every bounded-time backend touch in this repo shares (doctor CLI,
    liveness probe, dryrun device count). A wedged call parks the daemon
    thread; the caller gets an answer either way.

    Returns ``(status, value, dt)``: ``("ok", result, seconds)`` on success,
    ``("error", exception, seconds)`` if ``fn`` raised, and
    ``("timeout", None, timeout_s)`` if the deadline passed (``fn`` may
    still be running — do not retry backend touches in-process after this).
    """
    done = threading.Event()
    box: list = []

    def _worker() -> None:
        try:
            box.append(("ok", fn()))
        except Exception as e:  # noqa: BLE001 — diagnostic surface
            box.append(("error", e))
        finally:
            done.set()

    t0 = time.monotonic()
    threading.Thread(target=_worker, daemon=True).start()
    if not done.wait(timeout_s):
        return "timeout", None, float(timeout_s)
    status, value = box[0]
    return status, value, time.monotonic() - t0


def device_liveness_check(
    timeout_s: Optional[float] = None,
    *,
    probe: Callable[[], object] = _default_probe,
    _exit: Callable[[int], None] = os._exit,
) -> float:
    """Run ``probe`` under a deadline; return its wall time on success.

    On timeout prints :data:`_MARKER_WEDGED` and calls ``_exit`` (default
    ``os._exit``) with :data:`EXIT_DEVICE_WEDGED`.  Default deadline comes
    from ``NSC_DEVICE_CHECK_TIMEOUT`` (seconds, default 420 — generous enough
    for a cold backend init + one tiny remote compile on the relay rig, far
    below the supervisor's grace).
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("NSC_DEVICE_CHECK_TIMEOUT", "420"))
    status, value, dt = run_with_deadline(probe, timeout_s)
    if status == "timeout":
        print(
            f"{_MARKER_WEDGED}: no probe result in {timeout_s:.0f}s — "
            "the device/relay claim is hung; exiting "
            f"{EXIT_DEVICE_WEDGED} (restarts cannot fix this; the pool "
            "must reclaim the grant)",
            file=sys.stderr, flush=True,
        )
        _exit(EXIT_DEVICE_WEDGED)
        return dt  # only reached with an injected _exit (tests)
    if status == "error":
        raise value
    print(f"NSC-LIVENESS: device ok ({dt:.1f}s)", file=sys.stderr, flush=True)
    return dt


class Heartbeat:
    """Exit the process if the training loop stops making progress.

    ``first_timeout_s`` covers the window before the first beat (restore +
    the multi-minute cold step compile); ``timeout_s`` applies between beats
    (normal cadence is one beat per ``log_every`` steps, ~25-40 s on the
    flagship run, but an async checkpoint pull can legitimately pause the
    loop ~3-5 min — keep the deadline well above that).

    Ordering constraint: both deadlines must undercut the external
    supervisor's (``train_watchdog.sh``: ``STALE_S`` 600 after-first-row,
    ``GRACE_S`` 900 post-launch) — the whole point is the *distinctive*
    exit, and a detector the supervisor always beats to the kill is dead
    code.  Hence 450 < 600 and 780 < 900.

    The defaults assume a metric row lands at least every ~7 min.  A config
    whose beat cadence is legitimately slower (huge ``log_every``, very slow
    steps) must raise ``NSC_HEARTBEAT_TIMEOUT`` / ``NSC_HEARTBEAT_FIRST``
    (seconds) — and the supervisor's ``STALE_S`` with them, keeping
    heartbeat < STALE_S — or the detector self-kills a healthy run.
    ``train.loop`` warns at startup when ``log_every`` makes this likely.
    """

    def __init__(
        self,
        timeout_s: Optional[float] = None,
        first_timeout_s: Optional[float] = None,
        *,
        poll_s: float = 5.0,
        _exit: Callable[[int], None] = os._exit,
    ):
        if timeout_s is None:
            timeout_s = float(os.environ.get("NSC_HEARTBEAT_TIMEOUT", "450"))
        if first_timeout_s is None:
            first_timeout_s = float(
                os.environ.get("NSC_HEARTBEAT_FIRST", "780")
            )
        self._timeout = float(timeout_s)
        self._deadline = time.monotonic() + float(first_timeout_s)
        self._poll = poll_s
        self._exit_fn = _exit
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._last_step: Optional[int] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def beat(self, step: Optional[int] = None) -> None:
        with self._lock:
            self._deadline = time.monotonic() + self._timeout
            if step is not None:
                self._last_step = step

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            with self._lock:
                late = time.monotonic() - self._deadline
                step = self._last_step
            if late > 0:
                print(
                    f"{_MARKER_STALLED}: no progress for {self._timeout:.0f}s"
                    f" past deadline (last step: {step}); exiting "
                    f"{EXIT_STALLED} so the supervisor restarts cleanly",
                    file=sys.stderr, flush=True,
                )
                self._exit_fn(EXIT_STALLED)
                return  # only reached with an injected _exit (tests)

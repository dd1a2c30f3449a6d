"""Device-liveness probe + in-process stall detector (utils/liveness.py;
SURVEY.md §6 failure-detection row).

The wedge paths must NOT call the real os._exit under pytest, so they inject
a recording _exit; the real-exit contract (os._exit with the documented
codes) is covered by the subprocess test at the bottom.
"""

import subprocess
import sys
import time

from nsc_tpu.utils import liveness


def test_device_check_passes_on_healthy_backend():
    # forced-CPU conftest: the tiny probe completes in milliseconds
    dt = liveness.device_liveness_check(timeout_s=60.0)
    assert dt < 60.0


def test_run_with_deadline_ok_error_timeout():
    status, value, dt = liveness.run_with_deadline(lambda: 41 + 1, 5.0)
    assert (status, value) == ("ok", 42) and dt < 5.0

    def boom():
        raise RuntimeError("no backend")

    status, value, _ = liveness.run_with_deadline(boom, 5.0)
    assert status == "error" and isinstance(value, RuntimeError)

    status, value, dt = liveness.run_with_deadline(
        lambda: time.sleep(1.0), 0.1
    )
    assert (status, value) == ("timeout", None) and dt == 0.1


def test_heartbeat_env_override(monkeypatch):
    monkeypatch.setenv("NSC_HEARTBEAT_TIMEOUT", "123")
    monkeypatch.setenv("NSC_HEARTBEAT_FIRST", "456")
    hb = liveness.Heartbeat(poll_s=60.0, _exit=lambda c: None)
    try:
        assert hb._timeout == 123.0
    finally:
        hb.stop()


def test_device_check_exits_on_wedged_probe():
    codes = []

    def fake_exit(code):
        codes.append(code)

    liveness.device_liveness_check(
        timeout_s=0.2, probe=lambda: time.sleep(1.0), _exit=fake_exit
    )
    assert codes == [liveness.EXIT_DEVICE_WEDGED]


def test_heartbeat_fires_after_silence_and_reports_last_step():
    codes = []
    hb = liveness.Heartbeat(
        timeout_s=0.3, first_timeout_s=0.3, poll_s=0.05,
        _exit=lambda c: codes.append(c),
    )
    hb.beat(41)
    deadline = time.monotonic() + 5.0
    while not codes and time.monotonic() < deadline:
        time.sleep(0.05)
    hb.stop()
    assert codes and codes[0] == liveness.EXIT_STALLED


def test_heartbeat_quiet_while_beating():
    codes = []
    hb = liveness.Heartbeat(
        timeout_s=0.4, first_timeout_s=0.4, poll_s=0.05,
        _exit=lambda c: codes.append(c),
    )
    for _ in range(8):
        hb.beat()
        time.sleep(0.1)  # each gap well under timeout_s
    hb.stop()
    time.sleep(0.2)
    assert codes == []


def test_real_exit_code_via_subprocess():
    # the actual os._exit path, isolated in a child interpreter
    code = (
        "from nsc_tpu.utils import liveness\n"
        "import time\n"
        "liveness.device_liveness_check(timeout_s=0.2,"
        " probe=lambda: time.sleep(30))\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert p.returncode == liveness.EXIT_DEVICE_WEDGED
    # markers go to stderr so bench.py's one-JSON-line stdout contract holds
    assert "NSC-LIVENESS: DEVICE WEDGED" in p.stderr

"""`python -m nsc_tpu doctor` (SURVEY.md §6 failure-detection row): bounded-
time environment/device diagnostics. The real-wedge behavior (backend init
itself hanging) was verified live against a wedged relay (docs/RUNBOOK.md);
here we cover the healthy path and the probe-stage wedge via injection."""

import json
import time

from nsc_tpu import __main__ as cli
from nsc_tpu.utils import liveness


def test_doctor_healthy_reports_and_exits_zero(capsys):
    rc = cli.main(["doctor", "--json", "--timeout", "60"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["device_status"] == "ok"
    assert out["backend"] == "cpu" and out["device_count"] >= 1
    assert out["jax"] and out["nsc_tpu"]


def test_doctor_wedged_probe_exits_97(capsys, monkeypatch):
    monkeypatch.setattr(liveness, "_default_probe", lambda: time.sleep(30))
    rc = cli.main(["doctor", "--json", "--timeout", "0.5"])
    assert rc == liveness.EXIT_DEVICE_WEDGED
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["device_status"] == "wedged"

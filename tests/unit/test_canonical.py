"""Canonical-index contract (nsc_tpu/canonical.py; VERDICT r3 #3).

The serving graph is the codec: archived indices are pinned at export and
`index_parity_exact` means bit-identical reproduction of the pin. These
tests cover the pin/check machinery and the determinism property it rests
on, at tiny-config scale on CPU (the on-chip check is bench.py's job).
"""

import dataclasses

import jax
import numpy as np
import pytest

from nsc_tpu import api, canonical
from nsc_tpu.configs import get_config
from nsc_tpu.models.codec import init_codec


def _bundle(seed=0):
    cfg = get_config("tiny_test")
    model, params, rvq = init_codec(jax.random.PRNGKey(seed), cfg)
    return api.ModelBundle(model, params, rvq)


def test_pin_roundtrip_exact(tmp_path):
    b = _bundle()
    path = canonical.write_pin(b, str(tmp_path))
    assert path.endswith(canonical.PIN_NAME)
    exact, rate, status = canonical.check_pin(b, str(tmp_path))
    assert exact is True and rate == 1.0
    assert "pinned" in status


def test_check_without_pin_is_none(tmp_path):
    exact, rate, status = canonical.check_pin(_bundle(), str(tmp_path))
    assert exact is None and "no canonical pin" in status


def test_pin_rejects_different_codebooks(tmp_path):
    b = _bundle(seed=0)
    canonical.write_pin(b, str(tmp_path))
    other = _bundle(seed=1)  # same config, different checkpoint
    exact, rate, status = canonical.check_pin(other, str(tmp_path))
    assert exact is None and "different codebooks" in status


def test_pin_version_gate(tmp_path):
    b = _bundle()
    path = canonical.write_pin(b, str(tmp_path))
    with np.load(path) as z:
        data = dict(z)
    data["version"] = np.int32(canonical.PIN_VERSION + 1)
    np.savez_compressed(path, **data)
    exact, _, status = canonical.check_pin(b, str(tmp_path))
    assert exact is None and "version" in status


def test_encode_deterministic_across_jit_instances():
    """The property the pin rests on: two independently-built bundles of the
    same checkpoint (fresh traces/compilations) produce identical indices."""
    a, b = _bundle(seed=0), _bundle(seed=0)
    wav = canonical.probe_input(a.cfg, batch=2)[:, : 8 * a.cfg.hop]
    np.testing.assert_array_equal(api.encode(a, wav), api.encode(b, wav))


def test_probe_input_matches_bench_prefix():
    """bench.py measures on RandomState(0).randn(64, t)*0.1 and checks
    parity on its first 8 rows; the pin probe must be exactly those rows or
    the bench-time check silently measures a different input."""
    cfg = get_config("base_fast")
    t = int(10.0 * cfg.sample_rate)
    bench_wav = (np.random.RandomState(0).randn(64, t) * 0.1).astype(
        np.float32
    )
    np.testing.assert_array_equal(canonical.probe_input(cfg), bench_wav[:8])


def test_pin_carries_speech_probe_and_detects_mismatch(tmp_path):
    """r5 pins carry a second, speech-like probe plane (synthetic2 — the
    in-distribution geometry the archival contract protects). A corrupted
    speech plane must fail the check even when the noise plane matches."""
    b = _bundle()
    path = canonical.write_pin(b, str(tmp_path))
    with np.load(path) as z:
        data = dict(z)
    assert "indices_speech" in data
    exact, rate, status = canonical.check_pin(b, str(tmp_path))
    assert exact is True and rate == 1.0 and "speech" in status
    flipped = data["indices_speech"].copy()
    flipped.flat[0] = (flipped.flat[0] + 1) % 4
    data["indices_speech"] = flipped
    np.savez_compressed(path, **data)
    exact, rate, _ = canonical.check_pin(b, str(tmp_path))
    assert exact is False and rate < 1.0


def test_v1_pin_without_speech_plane_stays_valid(tmp_path):
    """Pins written before r5 (no indices_speech key) must keep checking
    exactly as before — the speech plane is additive, not a format break."""
    b = _bundle()
    path = canonical.write_pin(b, str(tmp_path))
    with np.load(path) as z:
        data = dict(z)
    del data["indices_speech"]
    np.savez_compressed(path, **data)
    exact, rate, status = canonical.check_pin(b, str(tmp_path))
    assert exact is True and rate == 1.0
    assert "speech" not in status

"""Golden regression tests (SURVEY.md §5): codebook indices must match the
pinned files EXACTLY and waveforms within float tolerance. These catch
numeric drift the self-consistent torch-twin parity tests cannot (both sides
of those are rebuilt per session, so coordinated drift passes them).

To re-pin after an INTENTIONAL numerics change: python tests/golden/generate.py
and review the diff alongside the code change.
"""

import os

import numpy as np
import pytest

from nsc_tpu import api

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "golden")


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.fail(
            f"golden file {path} missing — run tests/golden/generate.py"
        )
    return np.load(path)


@pytest.mark.parametrize("name", ["tiny_test", "small"])
def test_golden_indices_exact(name):
    g = _load(name)
    bundle = api.load_model(name, seed=0)
    idx = api.encode(bundle, g["wav"])
    np.testing.assert_array_equal(np.asarray(idx), g["indices"])


@pytest.mark.parametrize("name", ["tiny_test", "small"])
def test_golden_waveform_tolerance(name):
    g = _load(name)
    bundle = api.load_model(name, seed=0)
    recon = api.decode(bundle, g["indices"])
    np.testing.assert_allclose(
        np.asarray(recon), g["recon"], rtol=1e-5, atol=1e-6
    )

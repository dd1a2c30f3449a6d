"""Generate pinned golden regression files (SURVEY.md §5: "pinned golden
files (tests/golden/*.npz)").

Purpose: the torch-twin parity tests compare two implementations built in the
same session, so coordinated drift (a refactor or a jax upgrade changing both
sides, or just this repo's numerics) passes them silently. These files pin the
exact-sine-path codebook indices and reconstructed waveforms for fixed audio
and a fixed PRNG seed, so ANY numeric drift across refactors fails
tests/unit/test_golden.py.

Run (only when intentionally re-pinning — the diff is the review artifact):
    python tests/golden/generate.py
Conditions match tests/conftest.py: CPU platform, highest matmul precision.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
CONFIGS = ("tiny_test", "small")
SECONDS = 0.5


def golden_wav(sample_rate: int) -> np.ndarray:
    """Deterministic test signal: chirp + tone + fixed-seed noise floor."""
    t = np.arange(int(SECONDS * sample_rate)) / sample_rate
    sig = (
        0.3 * np.sin(2 * np.pi * (200 + 400 * t) * t)
        + 0.2 * np.sin(2 * np.pi * 1333.0 * t)
        + 0.05 * np.random.RandomState(1234).randn(t.size)
    )
    return sig.astype(np.float32)


def generate(name: str) -> str:
    from nsc_tpu import api

    bundle = api.load_model(name, seed=0)
    wav = golden_wav(bundle.cfg.sample_rate)
    indices = api.encode(bundle, wav)
    recon = api.decode(bundle, indices)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    np.savez_compressed(
        path,
        wav=wav,
        indices=np.asarray(indices, np.int32),
        recon=np.asarray(recon, np.float32),
        jax_version=np.array(jax.__version__),
    )
    return path


if __name__ == "__main__":
    for name in CONFIGS:
        p = generate(name)
        d = np.load(p)
        print(f"{p}: indices {d['indices'].shape}, recon {d['recon'].shape}")

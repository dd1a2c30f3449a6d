"""Input pipeline (SURVEY.md §3 #16): random-crop waveform batches.

Two sources:
  * `WavDirectorySource` — a directory of WAV files (LibriSpeech layout or
    flat; BASELINE.json:9 names LibriSpeech — no dataset ships in this
    environment, so any local corpus dir works the same way).
  * `SyntheticSource` — deterministic harmonic/noise mixtures for smoke
    tests and benchmarks (no data dependency).

Host-side numpy only; batches go to device via nsc_tpu.parallel.shard_batch.
Files are decoded once into a pooled float32 cache (speech corpora fit in
host RAM at 16 kHz; LibriSpeech-100 ~ 6 GB as float32 — use max_files to cap).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

from nsc_tpu.utils import audio


class SyntheticSource:
    """Deterministic speech-like signal generator (harmonics + noise bursts)."""

    def __init__(self, sample_rate: int = 16_000, seed: int = 0):
        self.sample_rate = sample_rate
        self._rng = np.random.RandomState(seed)

    def batches(self, batch_size: int, segment_len: int) -> Iterator[np.ndarray]:
        sr = self.sample_rate
        while True:
            t = np.arange(segment_len, dtype=np.float32) / sr
            out = np.zeros((batch_size, segment_len), np.float32)
            for i in range(batch_size):
                f0 = self._rng.uniform(80, 300)
                sig = np.zeros_like(t)
                for h in range(1, 6):
                    sig += self._rng.uniform(0.05, 0.3) / h * np.sin(
                        2 * np.pi * f0 * h * t + self._rng.uniform(0, 2 * np.pi)
                    )
                # amplitude envelope (syllable-ish, 4 Hz)
                env = 0.5 * (1 + np.sin(2 * np.pi * self._rng.uniform(2, 6) * t))
                sig = sig * env + 0.01 * self._rng.randn(segment_len)
                out[i] = np.clip(sig, -1, 1)
            yield out


class SyntheticSourceV2:
    """Richer deterministic speech-like generator (VERDICT r3 #4).

    The v1 source (above) spans too little acoustic variety: a 40k flagship
    run on it converged with codebook usage ~14% / perplexity ~128-of-1024 —
    ~128 effective clusters genuinely cover that distribution, so the
    codebooks were starved by the DATA, not (only) by the EMA dynamics. V2
    widens the latent distribution along the axes real speech varies on:

      * pitch GLIDES (log-linear f0 start->end over the segment) + vibrato,
        not a single static f0;
      * up to 10 harmonics with random spectral tilt and per-harmonic phase;
      * 1-3 formant resonators (2nd-order IIR, vowel-range centers) applied
        to the harmonic part — distinct spectral envelopes per segment;
      * unvoiced fricative-like segments: high-passed noise bursts replacing
        some syllables;
      * syllabic 2-8 Hz envelope, per-segment overall level over ~24 dB,
        and occasional leading/trailing silence.

    Kept SEPARATE from v1 ("synthetic" vs "synthetic2" in make_source): each
    trained checkpoint must be evaluated on its own training distribution,
    and the r3 flagship artifact was trained on v1."""

    def __init__(self, sample_rate: int = 16_000, seed: int = 0):
        self.sample_rate = sample_rate
        self._rng = np.random.RandomState(seed)

    def _segment(self, t: np.ndarray) -> np.ndarray:
        rng = self._rng
        sr = self.sample_rate
        n = t.shape[0]
        # --- voiced part: gliding-f0 harmonic stack ---
        f0a = rng.uniform(70, 320)
        f0b = np.clip(f0a * 2.0 ** rng.uniform(-0.7, 0.7), 60, 400)
        f0 = f0a * (f0b / f0a) ** (t / max(t[-1], 1e-6))
        if rng.rand() < 0.5:  # vibrato
            f0 = f0 * (1 + 0.02 * np.sin(2 * np.pi * rng.uniform(4, 7) * t))
        phase = 2 * np.pi * np.cumsum(f0) / sr
        tilt = rng.uniform(0.7, 1.6)  # spectral rolloff exponent
        sig = np.zeros_like(t)
        for h in range(1, 11):
            if f0a * h > 0.45 * sr:
                break
            sig += (
                rng.uniform(0.5, 1.0) / h**tilt
                * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
            )
        # formant resonators (2nd-order IIR peaks at vowel-ish centers)
        from scipy.signal import lfilter

        for lo, hi in ((250, 900), (850, 2400), (2300, 3400)):
            if rng.rand() < 0.8:
                fc = rng.uniform(lo, hi)
                bw = rng.uniform(60, 200)
                r = np.exp(-np.pi * bw / sr)
                th = 2 * np.pi * fc / sr
                sig = lfilter(
                    [1 - r], [1, -2 * r * np.cos(th), r * r], sig
                ).astype(np.float32)
        sig = sig / (np.abs(sig).max() + 1e-6)
        # --- syllabic envelope with unvoiced (noise-burst) syllables ---
        env = 0.5 * (
            1 + np.sin(2 * np.pi * rng.uniform(2, 8) * t + rng.uniform(0, 2 * np.pi))
        )
        noise = rng.randn(n).astype(np.float32)
        noise = lfilter([1, -0.97], [1], noise).astype(np.float32)  # high-pass
        noise = noise / (np.abs(noise).max() + 1e-6)
        frac_unvoiced = rng.uniform(0.0, 0.4)
        gate = (rng.rand(max(1, int(t[-1] * 8)) + 1) < frac_unvoiced)
        gate = np.repeat(gate, n // gate.shape[0] + 1)[:n]
        mix = np.where(gate, 0.6 * noise, sig) * env
        mix = mix + 0.003 * rng.randn(n)
        # --- level + occasional edge silence ---
        mix *= 10.0 ** (rng.uniform(-24, 0) / 20.0) / (np.abs(mix).max() + 1e-6)
        if rng.rand() < 0.15:
            cut = rng.randint(0, n // 4)
            if rng.rand() < 0.5:
                mix[:cut] = 0.0
            else:
                mix[n - cut:] = 0.0
        return np.clip(mix, -1, 1).astype(np.float32)

    def batches(self, batch_size: int, segment_len: int) -> Iterator[np.ndarray]:
        t = np.arange(segment_len, dtype=np.float32) / self.sample_rate
        while True:
            out = np.zeros((batch_size, segment_len), np.float32)
            for i in range(batch_size):
                out[i] = self._segment(t)
            yield out


class PooledSource:
    """Pre-generates a finite pool of segments from any source, then serves
    batches by sampling the pool with cheap augmentation (random crop offset,
    gain jitter, polarity flip).

    Why: on a 1-core host, per-batch synthesis throttles training — measured
    2026-08-18 with `synthetic2` at batch 64 x 1 s: ~0.5-0.9 s/batch of host
    synthesis vs a 0.24 s device step, capping the run at ~1.3-2 it/s where
    run #1 (cheaper v1 source) sustained 4.2. Generating the pool once up
    front (~1-2 min for 8192 segments) restores device-bound throughput, and
    a finite pool is no less realistic than a real corpus — every WAV dataset
    is a finite pool too. Pool segments carry `margin` extra samples so crops
    see fresh alignments each epoch."""

    MARGIN = 1600  # 0.1 s of crop jitter at 16 kHz

    def __init__(self, inner, pool_size: int = 8192, seed: int = 0):
        self._inner = inner
        self._pool_size = int(pool_size)
        self._seed = int(seed)
        self._rng = np.random.RandomState(seed ^ 0x5EED)
        self._pool: Optional[np.ndarray] = None
        self._pool_seg_len = -1
        self._cache_dir: Optional[str] = None

    def set_cache_dir(self, d: str) -> None:
        """Cache the generated pool as .npy under `d` (the train workdir):
        watchdog restarts then reload it in seconds instead of re-running
        minutes of synthesis inside the post-restart grace window."""
        self._cache_dir = d

    def _build(self, segment_len: int) -> None:
        gen_len = segment_len + self.MARGIN
        cache = None
        if self._cache_dir:
            cache = os.path.join(
                self._cache_dir,
                f"pool_{self._pool_size}x{gen_len}_s{self._seed}.npy",
            )
            if os.path.exists(cache):
                pool = np.load(cache)
                if pool.shape == (self._pool_size, gen_len):
                    self._pool = pool.astype(np.float32, copy=False)
                    self._pool_seg_len = segment_len
                    return
        # pull full batches from the inner source for generator efficiency
        chunk = 64
        parts = []
        have = 0
        it = self._inner.batches(chunk, gen_len)
        while have < self._pool_size:
            b = next(it)
            parts.append(b)
            have += b.shape[0]
        self._pool = np.concatenate(parts, axis=0)[: self._pool_size]
        self._pool_seg_len = segment_len
        if cache:
            tmp = cache + ".tmp.npy"
            np.save(tmp, self._pool)
            os.replace(tmp, cache)

    def batches(self, batch_size: int, segment_len: int) -> Iterator[np.ndarray]:
        if self._pool is None or self._pool_seg_len != segment_len:
            self._build(segment_len)
        pool, rng = self._pool, self._rng
        n = pool.shape[0]
        while True:
            rows = rng.randint(0, n, size=batch_size)
            offs = rng.randint(0, self.MARGIN + 1, size=batch_size)
            gain = 10.0 ** (rng.uniform(-6, 6, size=batch_size) / 20.0)
            sign = rng.choice((-1.0, 1.0), size=batch_size)
            out = np.empty((batch_size, segment_len), np.float32)
            for i in range(batch_size):
                seg = pool[rows[i], offs[i] : offs[i] + segment_len]
                out[i] = seg * np.float32(gain[i] * sign[i])
            yield np.clip(out, -1, 1)


class WavDirectorySource:
    """Recursively loads WAVs under `root`, serves random crops."""

    def __init__(
        self,
        root: str,
        sample_rate: int = 16_000,
        seed: int = 0,
        max_files: Optional[int] = None,
    ):
        self.sample_rate = sample_rate
        self._rng = np.random.RandomState(seed)
        paths: List[str] = []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if f.lower().endswith(".wav"):
                    paths.append(os.path.join(dirpath, f))
        if not paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        if max_files:
            paths = paths[:max_files]
        self._clips = []
        for p in paths:
            wav, _ = audio.load_wav(p, target_sr=sample_rate)
            self._clips.append(audio.to_mono(wav).astype(np.float32))

    def batches(self, batch_size: int, segment_len: int) -> Iterator[np.ndarray]:
        n = len(self._clips)
        while True:
            out = np.zeros((batch_size, segment_len), np.float32)
            for i in range(batch_size):
                clip = self._clips[self._rng.randint(n)]
                if len(clip) <= segment_len:
                    out[i, : len(clip)] = clip
                else:
                    start = self._rng.randint(len(clip) - segment_len)
                    out[i] = clip[start : start + segment_len]
            yield out


class GrainWavSource:
    """grain-backed WAV pipeline (SURVEY.md §3 #16 names grain as the torch
    DataLoader equivalent): decodes files ON DEMAND instead of caching the
    corpus in RAM, shards the file list across hosts, and shuffles
    deterministically per epoch. Use for corpora that outgrow
    WavDirectorySource's in-memory cache (LibriSpeech-960 at 16 kHz ~ 60 GB
    f32); for small corpora the cached source is faster.

    Each yielded batch is (batch_size, segment_len) float32 random crops —
    the same contract as the other sources, so loop.py is agnostic.
    """

    def __init__(
        self,
        root: str,
        sample_rate: int = 16_000,
        seed: int = 0,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
    ):
        self.sample_rate = sample_rate
        self._seed = seed
        paths: List[str] = []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if f.lower().endswith(".wav"):
                    paths.append(os.path.join(dirpath, f))
        if not paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        if (shard_index is None) != (shard_count is None):
            raise ValueError(
                "shard_index and shard_count must be provided together "
                f"(got index={shard_index}, count={shard_count})"
            )
        if shard_index is None:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"shard_index {shard_index} not in [0, {shard_count})")
        # contiguous-stride file sharding: each host sees a disjoint subset.
        # More hosts than files => round-robin wrap (hosts may share a file
        # but never silently get the FULL corpus — ADVICE r2).
        if shard_count > len(paths):
            self._paths = [paths[shard_index % len(paths)]]
        else:
            self._paths = paths[shard_index::shard_count]

    def batches(self, batch_size: int, segment_len: int) -> Iterator[np.ndarray]:
        import grain

        seed = self._seed
        sr = self.sample_rate

        def decode_and_crop(args):
            path, idx = args
            wav, _ = audio.load_wav(path, target_sr=sr)
            clip = audio.to_mono(wav).astype(np.float32)
            out = np.zeros(segment_len, np.float32)
            rng = np.random.RandomState((seed + 7919 * idx) % (2**31))
            if len(clip) <= segment_len:
                out[: len(clip)] = clip
            else:
                start = rng.randint(len(clip) - segment_len)
                out = clip[start : start + segment_len]
            return out

        ds = (
            grain.MapDataset.source(self._paths)
            .repeat()  # infinite epochs, reshuffled each epoch
            .shuffle(seed=seed)
            .map_with_index(lambda i, p: decode_and_crop((p, i)))
            .batch(batch_size)
        )
        for batch in ds.to_iter_dataset():
            yield np.asarray(batch, np.float32)


def make_source(spec: str, sample_rate: int, seed: int = 0):
    """'synthetic'/'synthetic2', a directory path, or 'grain:<dir>'
    (on-demand grain pipeline for corpora too large to cache in host RAM).
    A ':pool=N' suffix on the synthetic specs wraps the generator in
    PooledSource (N pre-generated segments, augmented sampling) — use on
    slow hosts where per-batch synthesis would throttle the device."""
    pool = 0
    if ":pool=" in spec:
        spec, _, arg = spec.partition(":pool=")
        pool = int(arg)
    if spec == "synthetic":
        src = SyntheticSource(sample_rate, seed)
    elif spec == "synthetic2":
        src = SyntheticSourceV2(sample_rate, seed)
    elif spec.startswith("grain:"):
        src = GrainWavSource(spec[len("grain:"):], sample_rate, seed)
    else:
        src = WavDirectorySource(spec, sample_rate, seed)
    if pool:
        return PooledSource(src, pool_size=pool, seed=seed)
    return src


class Prefetcher:
    """Background-thread batch assembly (SURVEY.md §3 #16: the reference's
    DataLoader runs workers off the training thread; this is the host-side
    equivalent). Wraps any batch iterator with a bounded queue so random-crop
    / synthesis work overlaps the device step. depth=2 suffices: one batch
    in flight to the device (loop.py's device prefetch), one being built."""

    _STOP = object()

    def __init__(self, it, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None
        self._done = False

        def worker():
            try:
                for item in it:
                    if self._done:
                        return
                    self._q.put(item)
            except BaseException as e:  # surface in the consumer thread
                self._err = e
            finally:
                self._q.put(self._STOP)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._STOP:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._done = True
        # drain so the worker's blocked put() releases
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass

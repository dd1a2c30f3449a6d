"""RTF benchmark (SURVEY.md §3 #20): batched encode+decode real-time factor.

Prints ONE JSON line:
  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime", "vs_baseline": N}

Metric definition (BASELINE.json:2): waveforms encoded+decoded per second per
chip, expressed as real-time factor at 16 kHz — (batch * seconds_of_audio) /
wall_seconds on one chip. The north-star (BASELINE.json:5) is >2000x on a
v5e-8 slice == 250x per chip for the linearly-scaling DP inference path, so
vs_baseline = rtf_per_chip / 250.

Config matches BASELINE.json:8: 64 x 16 kHz utterances, full RVQ depth.
Compile excluded (one warmup), bf16 compute, f32 RVQ distances (parity).
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from nsc_tpu.configs import get_config
    from nsc_tpu.models.codec import init_codec
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # Backends picked by measurement (docs/PERFORMANCE.md): native XLA convs
    # beat the matmul reformulations end-to-end (stacked pays HBM
    # transposes); fused Pallas RVQ for the quantizer; polynomial-sine snake
    # (8e-5 max activation deviation, ~100x under bf16 resolution) for the
    # serving path — XLA's precise
    # sin was 78% of runtime.
    cfg = dataclasses.replace(
        get_config("base"),
        compute_dtype="bfloat16",
        rvq_backend="pallas",
        activation="snake_fast",
        unit_backend="auto",  # CT-layout fused stage kernel (r2: 1450->2900x)
    )
    model, params, rvq = init_codec(jax.random.PRNGKey(0), cfg)

    batch, seconds = 64, 10.0
    t = int(seconds * cfg.sample_rate)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(batch, t).astype(np.float32) * 0.1
    )

    # The jitted program returns a scalar checksum: under this environment's
    # remote-execution relay, block_until_ready returns before the device
    # finishes, so a host readback of a (tiny) result is the only reliable
    # completion barrier. The sum adds negligible work to the measured graph.
    fn = jax.jit(lambda p, q, w: jnp.sum(model.reconstruct(p, q, w)))
    float(fn(params, rvq, wav))  # compile + warmup excluded from timing

    iters = 5
    start = time.perf_counter()
    for _ in range(iters):
        checksum = float(fn(params, rvq, wav))
    wall = (time.perf_counter() - start) / iters
    assert np.isfinite(checksum)

    audio_seconds = batch * seconds
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 250.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

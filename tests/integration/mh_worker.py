"""Worker process for the multi-host DP test (launched by
test_multihost.py, 2 processes x 4 fake CPU devices = one 8-device mesh).

Executes the REAL multi-host path: jax.distributed.initialize() +
make_array_from_process_local_data + shard_map train step with psum'd
gradients/EMA stats — the same code a TPU pod runs over DCN (SURVEY.md §6
comms row; mesh.py docstring).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> None:
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=list(range(4)),
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes  # global view

    import numpy as np

    from nsc_tpu.configs import TrainConfig, get_config
    from nsc_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate,
        shard_batch,
    )
    from nsc_tpu.train.train import init_train_state

    cfg = get_config("tiny_test")
    tcfg = TrainConfig(
        batch_size=8, segment_seconds=0.064, use_gan=False,
        quantizer_dropout=0.0, stft_fft_sizes=(256, 128),
        mel_fft_size=256, mel_bins=20,
    )
    model, state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    mesh = make_mesh()
    state = replicate(mesh, state)
    step = make_parallel_train_step(model, tcfg, mesh)

    # identical global batch in every process; each passes its local half
    seg = int(tcfg.segment_seconds * cfg.sample_rate) // cfg.hop * cfg.hop
    global_batch = (
        np.random.RandomState(0).randn(tcfg.batch_size, seg).astype(np.float32)
        * 0.1
    )
    local = global_batch[process_id * 4 : (process_id + 1) * 4]
    batch = shard_batch(mesh, local)

    new_state, metrics = step(state, batch)
    out = {k: float(v) for k, v in metrics.items()}
    out["step"] = int(new_state["step"].addressable_data(0))
    print("MHRESULT " + json.dumps(out, sort_keys=True), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

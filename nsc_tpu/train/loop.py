"""Training loop runner (SURVEY.md §3 #15; §6 observability rows).

Wires together: data source -> sharded batches -> parallel train step ->
metrics (JSONL + optional tensorboard) -> orbax checkpoints with auto-resume.

Usage:  python -m nsc_tpu.train --config small --data synthetic --steps 100
Multi-host: call jax.distributed.initialize() before run() (the mesh code is
identical; DCN handled by the same 'data' axis).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import numpy as np

from nsc_tpu.configs import CodecConfig, TrainConfig, get_config
from nsc_tpu.parallel import make_mesh, make_parallel_train_step, replicate, shard_batch
from nsc_tpu.train import checkpoint as ckpt
from nsc_tpu.train import data as data_lib
from nsc_tpu.train.train import init_train_state


class MetricsLogger:
    """JSONL metrics (structured, driver-friendly) + optional tensorboard."""

    def __init__(self, workdir: str, use_tensorboard: bool = True):
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        row = {"step": step}
        row.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def run(
    cfg: CodecConfig,
    tcfg: TrainConfig,
    *,
    workdir: str,
    data_spec: str = "synthetic",
    steps: Optional[int] = None,
    resume: bool = True,
) -> dict:
    """Train; returns the last metrics dict. Restartable: picks up from the
    latest checkpoint in workdir (fault-recovery contract, SURVEY.md §6)."""
    steps = steps if steps is not None else tcfg.steps
    from nsc_tpu.utils.cache import enable_compilation_cache

    # Prove the device answers BEFORE any expensive startup (state init,
    # data-init, cold compile): when the relay claim is wedged, fail in
    # minutes with a distinctive exit code the supervisor can grep for,
    # instead of hanging silently until its stale-kill (utils/liveness.py).
    # Must precede enable_compilation_cache — jax.default_backend() there is
    # itself the first (hangable) backend touch.
    from nsc_tpu.utils.liveness import (
        EXIT_RSS_LIMIT,
        Heartbeat,
        _MARKER_RSS,
        device_liveness_check,
        host_rss_gb,
        rss_exit_limit_gb,
    )

    device_liveness_check()
    enable_compilation_cache()  # restarts skip the multi-minute step compile
    mesh = make_mesh()
    n_dev = mesh.devices.size
    if tcfg.batch_size % n_dev:
        raise ValueError(f"batch {tcfg.batch_size} not divisible by {n_dev} devices")

    model, state = init_train_state(jax.random.PRNGKey(tcfg.seed), cfg, tcfg)
    start_step = 0
    train_dir = os.path.join(workdir, "train")
    if resume and ckpt.latest_step(train_dir) is not None:
        start_step, state = ckpt.restore(train_dir, state)
        print(f"resumed from step {start_step}")
    elif tcfg.codebook_init == "data":
        # Data-driven codebook init (VERDICT r3 #4): seed every code at an
        # actual encoder latent + a few Lloyd iterations. The warm batch
        # comes from a PROCESS-INDEPENDENT source (fixed seed, no process
        # offset) so every host computes identical codebooks before
        # replication — the DP bit-identity invariant starts true.
        import jax.numpy as jnp

        from nsc_tpu.ops import rvq as rvq_ops

        seg0 = int(tcfg.segment_seconds * cfg.sample_rate)
        seg0 = max(cfg.hop, (seg0 // cfg.hop) * cfg.hop)
        # strip any :pool= suffix — one warm batch must not trigger minutes
        # of pool synthesis (the pool is a steady-state throughput fix)
        warm_spec = data_spec.partition(":pool=")[0]
        warm = next(
            data_lib.make_source(warm_spec, cfg.sample_rate, tcfg.seed)
            .batches(min(tcfg.batch_size, 16), seg0)
        )
        z = jax.jit(model.latents)(state["params_g"], jnp.asarray(warm))
        state["rvq"] = jax.jit(rvq_ops.init_codebooks_from_data)(
            jax.random.PRNGKey(tcfg.seed + 77), state["rvq"], z
        )
        print("codebooks: data-driven init (residual sampling + k-means)")

    state = replicate(mesh, state)
    step_fn = make_parallel_train_step(model, tcfg, mesh)

    seg_len = int(tcfg.segment_seconds * cfg.sample_rate)
    seg_len = (seg_len // cfg.hop) * cfg.hop
    # per-process seed offset: each host draws distinct data (multi-host DP)
    source = data_lib.make_source(
        data_spec, cfg.sample_rate, tcfg.seed + 1009 * jax.process_index()
    )
    if hasattr(source, "set_cache_dir"):
        source.set_cache_dir(workdir)
    local_batch = tcfg.batch_size // jax.process_count()
    # background-thread batch assembly + one-step device prefetch below:
    # crop/synthesis work and host->device transfer both overlap the step
    batches = data_lib.Prefetcher(source.batches(local_batch, seg_len))

    logger = MetricsLogger(workdir)
    metrics = {}
    # best-metric tracking survives restarts via a sidecar json
    best_path = os.path.join(workdir, "best.json")
    best = float("inf")
    if resume and os.path.exists(best_path):
        with open(best_path) as f:
            best = float(json.load(f)["value"])

    # Async checkpointing (SURVEY.md §6): the training thread only takes a
    # device-side snapshot (one async device program — a copy into a fresh
    # flat buffer, so the live state stays donatable) and hands it to a
    # writer thread that does the slow d2h pull + orbax save. On the
    # tunneled-TPU rig the pull is ~4-7 min for a ~430 MB GAN state (relay
    # bulk d2h ~1-2 MB/s); overlapped, training keeps stepping. At most
    # one write in flight (join before the next snapshot) bounds device
    # memory at state + one flat copy.
    #
    # TPU-only: on the CPU runtime a writer-thread d2h pull concurrent with
    # main-thread dispatch can deadlock (observed: Array._value wedged in
    # one thread while the other waits — three distinct interleavings, all
    # with both threads touching the client). CPU runs (tests) write
    # synchronously inline — r2 behavior, known good. The FINAL checkpoint
    # is synchronous everywhere: there is nothing left to overlap with.
    import threading

    from nsc_tpu.utils.transfer import bundled_snapshot

    async_ckpt = jax.default_backend() == "tpu"
    writer: Optional[threading.Thread] = None
    writer_err: list = []

    def _write(snap, step1, improved, best_val, full):
        try:
            host_state = snap.materialize()
            if full:
                ckpt.save(
                    train_dir, step1, host_state,
                    max_to_keep=tcfg.keep_checkpoints,
                    keep_period=tcfg.keep_period or None,
                )
            ckpt.save_inference(
                os.path.join(workdir, "infer"), step1,
                host_state["params_g"], host_state["rvq"],
            )
            if improved:
                ckpt.save_inference(
                    os.path.join(workdir, "infer_best"), step1,
                    host_state["params_g"], host_state["rvq"],
                )
                with open(best_path, "w") as f:
                    json.dump(
                        {"metric": tcfg.best_metric, "value": best_val,
                         "step": step1}, f,
                    )
        except BaseException as e:  # surface on the training thread
            writer_err.append(e)

    # window of best-metric values observed at log points since the last
    # checkpoint: best-model selection compares a MEAN over the window, not
    # a single minibatch's noisy loss (ADVICE r2)
    metric_window: list = []
    # Full-save cadence tracks steps SINCE THE LAST FULL SAVE, not a step
    # modulus: with checkpoint_every and full_state_every independently
    # CLI-settable, a modulus only fires at lcm(...) — e.g. 3000/10000 would
    # silently degrade resume granularity to every 30000 steps (ADVICE r3).
    # Resume implies the latest full save is at start_step.  On a FRESH run
    # no full save exists at all, so the first checkpoint boundary forces
    # one (have_full=False below): a wedge/crash in the first
    # full_state_every steps then costs checkpoint_every steps of work, not
    # the whole run (2026-08-17: run #2 wedged at step 600 with the first
    # full save scheduled at 2000 — everything was lost).
    last_full = start_step
    have_full = start_step > 0
    # In-process stall detector (TPU only — on CPU the test-suite's pace is
    # not a health signal and the external watchdog still covers process
    # death).  Beats happen at every metric readback, the loop's only
    # guaranteed-synchronous point.
    hb = Heartbeat() if async_ckpt else None
    if hb is not None and tcfg.log_every > 200:
        # Beats only land at log boundaries: at <1 it/s a 200+-step cadence
        # can exceed the 450 s default deadline and self-kill a healthy run.
        print(
            f"WARNING: log_every={tcfg.log_every} — if a metric row takes "
            ">450 s the stall detector will fire on a healthy run; raise "
            "NSC_HEARTBEAT_TIMEOUT (and the watchdog STALE_S above it)",
            flush=True,
        )
    t0 = time.time()
    try:
        # one-step host->device prefetch: the next batch transfers while the
        # current step runs (dispatch is async; transfer overlaps compute)
        pending = shard_batch(mesh, next(batches))
        for step in range(start_step, steps):
            batch = pending
            if step + 1 < steps:
                pending = shard_batch(mesh, next(batches))
            state, metrics = step_fn(state, batch)
            if (step + 1) % tcfg.log_every == 0 or step + 1 == steps:
                m = {k: float(v) for k, v in metrics.items()}
                if hb is not None:
                    hb.beat(step + 1)  # float() above forced a device sync
                rate = tcfg.log_every / max(time.time() - t0, 1e-9)
                m["steps_per_sec"] = rate
                t0 = time.time()
                logger.log(step + 1, m)
                if tcfg.best_metric in m:
                    metric_window.append(m[tcfg.best_metric])
                print(
                    f"step {step+1}: g={m.get('loss/g_total', 0):.4f} "
                    f"d={m.get('loss/d_total', 0):.4f} "
                    f"mel={m.get('loss/mel', 0):.4f} ({rate:.2f} it/s)"
                )
            if (step + 1) % tcfg.checkpoint_every == 0 or step + 1 == steps:
                if not metric_window:
                    metric_window.append(float(metrics.get(tcfg.best_metric, np.inf)))
                val = float(np.mean(metric_window))
                metric_window = []
                improved = bool(np.isfinite(val) and val < best)
                if improved:
                    best = val
                if hb is not None:
                    # reset the stall window right before the blocking
                    # checkpoint ops: a legit relay pull can take ~4-7 min and
                    # deserves its full deadline from ITS start; a wedged pull
                    # still trips the detector timeout_s after this beat
                    hb.beat(step + 1)
                if writer is not None:
                    writer.join()
                if writer_err:
                    raise writer_err[0]
                # Host-RSS self-restart guard (utils/liveness.py
                # rss_exit_limit_gb has the incident write-up): when the
                # leaked-transfer-buffer RSS nears the host ceiling, take a
                # FULL synchronous save and exit EXIT_RSS_LIMIT — the
                # supervisor relaunches and auto-resume loses nothing, vs.
                # the OOM killer's SIGKILL which races the async writer and
                # strands the device claim. Boundary-only check: the leak is
                # ~4.6 MB/step, so one checkpoint interval of drift is GBs
                # below the 20%-of-RAM headroom the default limit leaves.
                rss_limit = rss_exit_limit_gb()
                rss_gb = host_rss_gb() if rss_limit is not None else 0.0
                rss_exit = (
                    rss_limit is not None
                    and rss_gb > rss_limit
                    and step + 1 < steps
                )
                # full train state only every full_state_every steps (or at the
                # end); inference-only (~10x smaller pull) otherwise — see
                # TrainConfig.full_state_every
                full = (
                    rss_exit
                    or not tcfg.full_state_every
                    or not have_full
                    or (step + 1 - last_full) >= tcfg.full_state_every
                    or step + 1 == steps
                )
                if full:
                    last_full = step + 1
                    have_full = True
                snap = bundled_snapshot(
                    state if full
                    else {"params_g": state["params_g"], "rvq": state["rvq"]}
                )
                if async_ckpt and step + 1 < steps and not rss_exit:
                    writer = threading.Thread(
                        target=_write, args=(snap, step + 1, improved, best, full)
                    )
                    writer.start()
                else:
                    # on TPU this branch is the FINAL step's synchronous
                    # save (or the RSS-limit exit save): a full-state pull
                    # can legitimately run 4-7 min on the relay, longer than
                    # the stall deadline — retire the in-process detector
                    # and leave a wedged final save to the supervisor
                    if hb is not None:
                        hb.stop()
                    _write(snap, step + 1, improved, best, full)
                    if writer_err:
                        raise writer_err[0]
                if rss_exit:
                    print(
                        f"{_MARKER_RSS}: rss {rss_gb:.1f} GB > limit "
                        f"{rss_limit:.1f} GB — full state saved at step "
                        f"{step + 1}; exiting {EXIT_RSS_LIMIT} for a clean "
                        "supervisor relaunch (auto-resume)",
                        flush=True,
                    )
                    batches.close()
                    logger.close()
                    raise SystemExit(EXIT_RSS_LIMIT)
    finally:
        # retire the monitor on EVERY exit path: a daemon thread left armed
        # would os._exit(98) out of a host process that caught the real
        # exception (sweep runners, notebooks)
        if hb is not None:
            hb.stop()
    if writer is not None:
        writer.join()
    if writer_err:
        raise writer_err[0]
    batches.close()
    logger.close()
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="nsc_tpu.train")
    p.add_argument("--config", default="base")
    p.add_argument("--workdir", default="./runs/nsc")
    p.add_argument("--data", default="synthetic", help="'synthetic' or a wav dir")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--segment-seconds", type=float, default=None)
    p.add_argument("--no-gan", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--warmup-steps", type=int, default=2000,
        help="linear LR warmup (family-standard for long GAN runs)",
    )
    p.add_argument(
        "--checkpoint-every", type=int, default=None,
        help="checkpoint cadence in steps (TrainConfig.checkpoint_every)",
    )
    p.add_argument(
        "--full-state-every", type=int, default=None,
        help="full train-state save cadence; intermediate boundaries export "
        "inference-only state (TrainConfig.full_state_every; 0 = always "
        "full). Resume can only start from a FULL save — lower this on "
        "flaky links, raise it when the d2h pipe is slow",
    )
    p.add_argument(
        "--lr-decay-steps", type=int, default=-1,
        help="cosine-decay horizon; -1 = the full run, 0 = constant LR",
    )
    p.add_argument(
        "--debug-nans", action="store_true",
        help="enable jax_debug_nans (SURVEY.md §6 sanitizer row): the step "
        "raises at the first non-finite value instead of training on garbage",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize(); the same 'data' mesh then "
        "spans all hosts (ICI within a slice, DCN across — SURVEY.md §6)",
    )
    args = p.parse_args(argv)

    if args.multihost:
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    cfg = get_config(args.config)
    overrides = {"seed": args.seed, "warmup_steps": args.warmup_steps}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.segment_seconds:
        overrides["segment_seconds"] = args.segment_seconds
    if args.no_gan:
        overrides["use_gan"] = False
    if args.checkpoint_every is not None:
        overrides["checkpoint_every"] = args.checkpoint_every
    if args.full_state_every is not None:
        overrides["full_state_every"] = args.full_state_every
    tcfg = dataclasses.replace(TrainConfig(), **overrides)
    total = args.steps if args.steps is not None else tcfg.steps
    decay = total if args.lr_decay_steps < 0 else args.lr_decay_steps
    tcfg = dataclasses.replace(tcfg, lr_decay_steps=decay)
    run(cfg, tcfg, workdir=args.workdir, data_spec=args.data,
        steps=args.steps, resume=not args.no_resume)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Checkpoint/resume via orbax (SURVEY.md §6 "Failure detection / elastic
recovery" and "Checkpoint / resume" rows).

The FULL train state is saved — both optimizers, EMA codebook statistics and
the PRNG key — so training restarts bit-identically from any checkpoint
(restartability test: tests/integration/test_training.py). Asynchrony lives
in the TRAIN LOOP (train/loop.py: device-side snapshot + writer thread), not
in orbax — see _manager below for why orbax's own async layer is off.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(
    directory: str, max_to_keep: int = 3, keep_period: Optional[int] = None
) -> ocp.CheckpointManager:
    # Orbax's OWN async layer stays OFF: overlap comes from the train
    # loop's writer thread (train/loop.py), and orbax's async commit
    # machinery can deadlock in wait_until_finished when save() is invoked
    # from a non-main thread (observed on the forced-CPU path: the commit
    # future thread wedges in asyncio_utils.run_sync). A blocking save on
    # the writer thread is exactly what we want.
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            enable_async_checkpointing=False,
        ),
    )


def save(
    directory: str,
    step: int,
    state: Any,
    *,
    max_to_keep: int = 3,
    keep_period: Optional[int] = None,
) -> None:
    """Save + evict: keeps the newest `max_to_keep` checkpoints, plus every
    `keep_period`-th step as a permanent milestone (orbax eviction policy)."""
    mgr = _manager(directory, max_to_keep, keep_period)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str, target_state: Any) -> Tuple[int, Any]:
    """Restore the latest checkpoint into the structure of target_state.

    Falls back to a structure-free raw restore when the stored tree has
    leaves the template lacks — e.g. params saved after int8 calibration
    carry extra "a_s" scale leaves (ops/quant.py) that a fresh
    init_codec() template doesn't."""
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {directory}")
    try:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state)
        state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    except (ValueError, KeyError, TypeError) as orig:
        # The fallback exists ONLY for stored trees that are a strict
        # superset of the template (extra leaves, e.g. int8 "a_s" scales).
        # A genuinely mismatched checkpoint must re-raise the structured
        # error, not restore silently and explode later (ADVICE r2).
        state = mgr.restore(step, args=ocp.args.StandardRestore())
        if not _is_superset(state, target_state):
            mgr.close()
            raise ValueError(
                f"checkpoint at {directory} step {step} does not match the "
                f"target structure (and is not a superset of it)"
            ) from orig
    mgr.close()
    return step, state


def _is_superset(stored: Any, template: Any) -> bool:
    """True when every path/leaf of `template` exists in `stored` with the
    same shape (extra leaves in `stored` are allowed)."""
    tmpl_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    stored_paths = {
        jax.tree_util.keystr(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(stored)[0]
    }
    for path, leaf in tmpl_leaves:
        got = stored_paths.get(jax.tree_util.keystr(path))
        if got is None:
            return False
        want_shape = getattr(leaf, "shape", None)
        if want_shape is not None and getattr(got, "shape", None) != want_shape:
            return False
        # Shape alone is not enough: a right-shaped leaf with the wrong dtype
        # (f32 state restored into a bf16 template) would pass silently and
        # change numerics / trigger recompiles downstream (ADVICE r3).
        want_dtype = getattr(leaf, "dtype", None)
        if want_dtype is not None and getattr(got, "dtype", None) != want_dtype:
            return False
    return True


def restore_inference(directory: str, params_template, rvq_template):
    """Load (params_g, rvq) for the public API (nsc_tpu.load_model).
    Preference order: <dir>/infer_best (best eval-metric export, written by
    the train loop when TrainConfig.best_metric improves) > <dir>/infer
    (latest) > the directory itself as an inference checkpoint."""
    target = directory
    for sub in ("infer_best", "infer"):
        cand = os.path.join(directory, sub)
        if latest_step(cand) is not None:
            target = cand
            break
    _, state = restore(
        target, {"params_g": params_template, "rvq": rvq_template}
    )
    return state["params_g"], state["rvq"]


def save_inference(directory: str, step: int, params_g, rvq) -> None:
    """Export an inference-only checkpoint (params + codebooks)."""
    save(
        directory,
        step,
        {
            "params_g": jax.tree.map(np.asarray, params_g),
            "rvq": jax.tree.map(np.asarray, rvq),
        },
    )

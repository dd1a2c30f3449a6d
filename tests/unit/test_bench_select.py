"""Flagship-artifact selection (bench.flagship_key): must be deterministic
on a fresh clone, where every artifact dir shares the checkout mtime."""

import json
import os
import time


def test_flagship_key_orders_by_meta_step_then_mtime(tmp_path):
    from bench import flagship_key

    a = tmp_path / "base_fast_synthetic_40k"
    b = tmp_path / "base_fast_f_50k"
    c = tmp_path / "base_fast_nometa"
    for d in (a, b, c):
        d.mkdir()
    json.dump({"step": 34000}, open(a / "meta.json", "w"))
    json.dump({"step": 48000}, open(b / "meta.json", "w"))
    # identical mtimes (the fresh-clone case): meta step must decide
    now = time.time()
    for d in (a, b, c):
        os.utime(d, (now, now))
    dirs = [str(d) for d in (a, b, c)]
    assert max(dirs, key=flagship_key) == str(b)
    # meta-less dirs rank below any meta-carrying one at equal mtime
    assert sorted(dirs, key=flagship_key)[0] == str(c)


def test_flagship_key_refit_supersedes_source_at_equal_step(tmp_path):
    from bench import flagship_key

    src = tmp_path / "base_fast_synthetic_40k"
    ref = tmp_path / "base_fast_synthetic_40k_refit"
    for d in (src, ref):
        d.mkdir()
    json.dump({"step": 34000}, open(src / "meta.json", "w"))
    json.dump(
        {"step": 34000, "refit": {"from": "artifacts/base_fast_synthetic_40k"}},
        open(ref / "meta.json", "w"),
    )
    now = time.time()  # fresh-clone mtime collapse: the refit flag decides
    for d in (src, ref):
        os.utime(d, (now, now))
    assert max([str(src), str(ref)], key=flagship_key) == str(ref)
    # a LATER-step plain artifact still beats an older-step refit
    later = tmp_path / "base_fast_synthetic2_50k"
    later.mkdir()
    json.dump({"step": 50000}, open(later / "meta.json", "w"))
    os.utime(later, (now, now))
    assert max([str(ref), str(later)], key=flagship_key) == str(later)

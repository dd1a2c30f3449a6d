"""Driver contract (__graft_entry__): entry() must trace, dryrun_multichip
must run the full GAN DP step on the fake-device mesh."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 16000)


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)

"""The driver hooks (__graft_entry__.py) must always work: entry() compiles
single-device; dryrun_multichip runs a full sharded train step on the
8-device CPU mesh (dp + fsdp)."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 1000)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

"""Driver entry points stay green: ``entry()`` must jit-compile and run
single-device; ``dryrun_multichip`` must shard + execute over the 8
virtual devices the conftest configures."""
import jax

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    r = jax.jit(fn)(*args)
    jax.block_until_ready(r)


def test_dryrun_multichip():
    ge.dryrun_multichip(8)

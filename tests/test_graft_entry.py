"""Driver entry-point tests: entry() compiles and dryrun_multichip runs."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    q, e = jax.jit(fn)(*args)
    assert q.shape == (256, 100)
    assert np.isfinite(np.asarray(e)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)

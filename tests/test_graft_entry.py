"""Driver entry points stay healthy: single-chip forward compiles (tiny
proxy) and the multichip dry run executes on the virtual 8-device mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) == 8
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_entry_signature():
    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn)
    assert isinstance(args, tuple)
    # do not run the full-size forward on CPU (slow); just verify the
    # abstract eval traces with the example args
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (4, 32, 1536)

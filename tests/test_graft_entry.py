"""Driver-contract checks for __graft_entry__ (trace-level; the driver does
the real compile/execute)."""

import sys

sys.path.insert(0, "/root/repo")

import jax


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (16, 56, 30)
    assert out.dtype == jax.numpy.float32

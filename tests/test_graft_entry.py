"""Driver contract: entry() compiles and runs; dryrun covered in
tests/test_parallel.py."""

import sys

import jax

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    rgb, depth, opacity = out
    assert rgb.shape == (240, 320, 3)
    assert depth.shape == (240, 320)
    assert float(opacity.max()) > 0.01  # scene actually rendered

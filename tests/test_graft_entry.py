"""Driver-contract tests: __graft_entry__.entry / dryrun_multichip must keep
compiling and running on the virtual mesh (the driver compile-checks these)."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out, err = fn(*args)
    assert np.asarray(out).shape[1] == 32768
    assert not np.asarray(err).any()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)  # asserts round-trip internally


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)

"""Driver-contract tests: entry() compiles single-chip; dryrun_multichip
executes the full sharded step on the virtual mesh."""

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    len(_jax.devices()) < 2, reason="needs a multi-device mesh (virtual CPU devices)"
)

import jax
import numpy as np

import __graft_entry__


def test_entry_jits_and_runs():
    fn, args = __graft_entry__.entry()
    out = np.asarray(jax.jit(fn)(*args))  # packed (4, m): [idx_hi, idx_lo, cert, d2]
    assert out.shape == (4, 256)
    idx = (out[0].astype(np.int64) << 12) | out[1].astype(np.int64)
    assert idx.min() >= 0  # valid reference indices
    assert set(np.unique(out[2])) <= {0, 1}  # certificate flags


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    __graft_entry__.dryrun_multichip(2)

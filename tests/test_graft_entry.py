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
    out = jax.jit(fn)(*args)
    min_d, idx = out
    assert idx.shape == (256,)
    assert np.asarray(min_d).min() >= 0


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    __graft_entry__.dryrun_multichip(2)

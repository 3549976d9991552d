"""Driver-contract tests for __graft_entry__.py."""

import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 192, 80)
    assert out.dtype == np.float32


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    graft.dryrun_multichip(8)

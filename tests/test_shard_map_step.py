"""Explicit-collective (shard_map) train step on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.parallel import batch_sharding, make_mesh
from speechsplit_tpu.training.train_step import (
    create_train_state,
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

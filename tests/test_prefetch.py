"""Prefetcher: background transfer, optional bf16 feed compression."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.data.prefetch import prefetch_to_device
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_train_step,
)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield Batch(
            mel=rng.rand(4, 192, 80).astype(np.float32),
            spk_emb=np.eye(4, 82, dtype=np.float32),
            f0=rng.rand(4, 192, 1).astype(np.float32),
            len_org=rng.randint(64, 129, 4).astype(np.int32),
        )


def test_prefetch_preserves_order_and_values():
    src = list(_batches(3))
    out = list(prefetch_to_device(iter(src)))
    assert len(out) == 3
    for a, b in zip(src, out):
        np.testing.assert_array_equal(a.mel, np.asarray(b.mel))


@pytest.mark.slow
def test_compressed_prefetch_feeds_train_step():
    batches = list(
        prefetch_to_device(_batches(1, seed=1), compress=True)
    )
    batch = batches[0]
    assert batch.mel.dtype == jnp.bfloat16
    assert batch.len_org.dtype == jnp.int32  # ints untouched

    module, state = create_train_state(SMALL, jax.random.PRNGKey(0))
    step = make_train_step(SMALL, module)
    new_state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # loss close to the uncompressed feed (bf16 target quantization)
    full = list(prefetch_to_device(_batches(1, seed=1)))[0]
    module2, state2 = create_train_state(SMALL, jax.random.PRNGKey(0))
    step2 = make_train_step(SMALL, module2)
    _, loss_full = step2(state2, full, jax.random.PRNGKey(1))
    assert abs(float(loss) - float(loss_full)) < 5e-3

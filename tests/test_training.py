"""Training-stack tests: step semantics, loss decrease, checkpointing,
and data-parallel execution on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.parallel import batch_sharding, make_mesh
from speechsplit_tpu.training.checkpoint import (
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
)
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_f0_train_step,
    make_train_step,
)

# a small config keeps CPU compile + step time reasonable
SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
    chs_grp=16, batch_size=8,
    learning_rate=1e-3,  # overfit-one-batch tests converge faster
)


def _fake_batch(cfg, batch_size, seed=0):
    rng = np.random.RandomState(seed)
    t = cfg.max_len_pad
    lens = rng.randint(cfg.min_len_seq, cfg.max_len_seq + 1, batch_size)
    mel = rng.rand(batch_size, t, cfg.dim_freq).astype(np.float32)
    f0 = rng.rand(batch_size, t, 1).astype(np.float32)
    for i, l in enumerate(lens):
        mel[i, l:] = 0.0
        f0[i, l:] = -1e10
    emb = np.zeros((batch_size, cfg.dim_spk_emb), np.float32)
    emb[np.arange(batch_size), rng.randint(0, 4, batch_size)] = 1.0
    return Batch(
        mel=mel, spk_emb=emb, f0=f0, len_org=lens.astype(np.int32)
    )


@pytest.mark.slow
def test_generator_loss_decreases():
    cfg = SMALL
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, module)
    batch = _fake_batch(cfg, cfg.batch_size)
    key = jax.random.PRNGKey(42)
    losses = []
    for _ in range(30):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss substantially
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5])


@pytest.mark.slow
def test_f0_converter_loss_decreases():
    cfg = SMALL
    module, state = create_train_state(
        cfg, jax.random.PRNGKey(0), "f0_converter"
    )
    step = make_f0_train_step(cfg, module)
    batch = _fake_batch(cfg, cfg.batch_size)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_step_deterministic_per_iteration():
    cfg = SMALL
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, module)
    batch = _fake_batch(cfg, cfg.batch_size)
    key = jax.random.PRNGKey(7)
    _, loss_a = step(state, batch, key)
    module2, state2 = create_train_state(cfg, jax.random.PRNGKey(0))
    step2 = make_train_step(cfg, module2)
    _, loss_b = step2(state2, batch, key)
    assert float(loss_a) == float(loss_b)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = SMALL
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, module)
    batch = _fake_batch(cfg, cfg.batch_size)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(str(tmp_path), 1, state)
    assert latest_checkpoint_step(str(tmp_path)) == 1

    _, fresh = create_train_state(cfg, jax.random.PRNGKey(5))
    restored = restore_checkpoint(str(tmp_path), 1, fresh)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1

    # resumed training continues identically
    next_a, loss_a = step(state, batch, jax.random.PRNGKey(9))
    next_b, loss_b = step(restored, batch, jax.random.PRNGKey(9))
    assert float(loss_a) == float(loss_b)


@pytest.mark.slow
def test_data_parallel_8_devices_matches_single():
    cfg = SMALL
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh()
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = _fake_batch(cfg, 16)

    step_single = make_train_step(cfg, module)
    step_mesh = make_train_step(cfg, module, mesh)

    sharded_batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )
    _, state_b = create_train_state(cfg, jax.random.PRNGKey(0))

    new_single, loss_single = step_single(state, batch, jax.random.PRNGKey(3))
    new_mesh, loss_mesh = step_mesh(
        state_b, sharded_batch, jax.random.PRNGKey(3)
    )
    # identical math across layouts (float tolerance for reduction order)
    assert abs(float(loss_single) - float(loss_mesh)) < 1e-5
    for a, b in zip(
        jax.tree.leaves(new_single.params), jax.tree.leaves(new_mesh.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


@pytest.mark.slow
def test_adam_mu_bfloat16_trains_and_resumes(tmp_path):
    """adam_mu_dtype=bfloat16: mu leaves stored bf16, descent matches the
    f32-mu trajectory closely, and an f32-mu checkpoint restores into a
    bf16-mu state (Orbax casts to the abstract target's dtypes)."""
    import dataclasses

    cfg32 = dataclasses.replace(SMALL, adam_mu_dtype="float32")
    cfg16 = dataclasses.replace(SMALL, adam_mu_dtype="bfloat16")

    module, state16 = create_train_state(cfg16, jax.random.PRNGKey(0))
    mu_dtypes = {
        a.dtype for a in jax.tree.leaves(state16.opt_state[0].mu)
    }
    assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}
    nu_dtypes = {
        a.dtype for a in jax.tree.leaves(state16.opt_state[0].nu)
    }
    assert nu_dtypes == {jnp.dtype(jnp.float32)}

    _, state32 = create_train_state(cfg32, jax.random.PRNGKey(0))
    step16 = make_train_step(cfg16, module)
    step32 = make_train_step(cfg32, module)
    batch = _fake_batch(cfg16, cfg16.batch_size)
    key = jax.random.PRNGKey(3)
    l16, l32 = [], []
    for _ in range(20):
        state16, loss = step16(state16, batch, key)
        l16.append(float(loss))
        state32, loss = step32(state32, batch, key)
        l32.append(float(loss))
    assert np.isfinite(l16).all()
    # same descent: bf16 mu only perturbs the update direction slightly
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    assert np.mean(l16[-5:]) < 0.8 * np.mean(l16[:5])

    # cross-dtype resume: save f32-mu, restore into a bf16-mu template
    save_checkpoint(str(tmp_path), 1, state32)
    restored = restore_checkpoint(str(tmp_path), 1, state16)
    assert {
        a.dtype for a in jax.tree.leaves(restored.opt_state[0].mu)
    } == {jnp.dtype(jnp.bfloat16)}
    _, loss_resumed = step16(restored, batch, key)
    assert np.isfinite(float(loss_resumed))


@pytest.mark.slow
def test_grad_dtype_bfloat16_descends_like_f32():
    """grad_dtype=bfloat16 narrows the gradient tree before Adam; the
    descent must track the f32-grad trajectory closely (bf16 rounding is
    ~0.4% relative per gradient, far below gradient noise)."""
    import dataclasses

    cfg32 = dataclasses.replace(
        SMALL, grad_dtype="float32", adam_mu_dtype="float32"
    )
    cfg16 = dataclasses.replace(
        SMALL, grad_dtype="bfloat16", adam_mu_dtype="float32"
    )
    module, s16 = create_train_state(cfg16, jax.random.PRNGKey(0))
    _, s32 = create_train_state(cfg32, jax.random.PRNGKey(0))
    step16 = make_train_step(cfg16, module)
    step32 = make_train_step(cfg32, module)
    batch = _fake_batch(cfg16, cfg16.batch_size)
    key = jax.random.PRNGKey(11)
    l16, l32 = [], []
    for _ in range(20):
        s16, loss = step16(s16, batch, key)
        l16.append(float(loss))
        s32, loss = step32(s32, batch, key)
        l32.append(float(loss))
    assert np.isfinite(l16).all()
    # bf16 grad rounding compounds with steps: tight early, looser tail
    # (measured worst case on this config: 3.4% at step 17).
    np.testing.assert_allclose(l16[:10], l32[:10], rtol=2e-2)
    np.testing.assert_allclose(l16, l32, rtol=8e-2)
    assert np.mean(l16[-5:]) < 0.8 * np.mean(l16[:5])

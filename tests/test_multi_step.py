"""Staged multi-step dispatch: k steps per XLA program (VERDICT r1 #6).

The contract: scanning k train steps inside one dispatch follows the
same trajectory as k individual dispatches — same RNG streams (the
per-step augmentation key is folded with ``state.step``, which the scan
carries), same math; only XLA fusion/reassociation noise (~1e-9) may
differ between the two compiled programs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.data.prefetch import stack_batches
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_train_multi_step,
    make_train_step,
)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
    batch_size=2,
)


def _batch(rng, cfg, b=None):
    b = b or cfg.batch_size
    t = cfg.max_len_pad
    return Batch(
        mel=rng.rand(b, t, cfg.dim_freq).astype(np.float32),
        spk_emb=np.eye(b, cfg.dim_spk_emb, dtype=np.float32),
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=np.full((b,), cfg.min_len_seq, np.int32),
    )


def test_stack_batches_shapes_and_remainder(rng):
    batches = [_batch(rng, SMALL) for _ in range(7)]
    stacked = list(stack_batches(iter(batches), 3))
    assert len(stacked) == 2  # trailing group of 1 dropped
    assert stacked[0].mel.shape == (3, 2, 192, 80)
    assert stacked[0].len_org.shape == (3, 2)
    np.testing.assert_array_equal(stacked[1].mel[0], batches[3].mel)


def test_stack_batches_rejects_nonpositive_k(rng):
    with pytest.raises(ValueError):
        next(stack_batches(iter([]), 0))


@pytest.mark.slow
def test_multi_step_matches_single_steps(rng):
    """One k=4 dispatch == four k=1 dispatches (up to fusion noise)."""
    k = 4
    module, state1 = create_train_state(SMALL, jax.random.PRNGKey(0))
    _, state2 = create_train_state(SMALL, jax.random.PRNGKey(0))
    single = make_train_step(SMALL, module)
    multi = make_train_multi_step(SMALL, module)

    batches = [_batch(rng, SMALL) for _ in range(k)]
    key = jax.random.PRNGKey(7)

    losses_single = []
    for b in batches:
        state1, loss = single(state1, b, key)
        losses_single.append(float(loss))

    stacked = next(stack_batches(iter(batches), k))
    state2, losses_multi = multi(state2, stacked, key)

    np.testing.assert_allclose(
        np.asarray(losses_multi, np.float32),
        np.asarray(losses_single, np.float32),
        rtol=1e-6, atol=1e-8,
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    assert int(state2.step) == k


def test_solver_rejects_misaligned_cadence(tmp_path, rng):
    from speechsplit_tpu.training.solver import Solver, SolverConfig

    rc = SolverConfig(
        num_iters=4, log_step=3, model_save_step=4, sample_step=4,
        steps_per_dispatch=2,
        log_dir=str(tmp_path / "l"), model_save_dir=str(tmp_path / "m"),
        sample_dir=str(tmp_path / "s"),
        validation_path=str(tmp_path / "none.pkl"),
    )
    loader = iter([_batch(rng, SMALL) for _ in range(8)])
    solver = Solver(loader, rc, SMALL)
    with pytest.raises(ValueError, match="log_step"):
        solver.train()

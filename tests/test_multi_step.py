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
@pytest.mark.parametrize(
    "mode,param_atol,param_rtol",
    [
        # exact accumulators: only XLA fusion/reassociation noise
        # between the two compiled programs (measured <= 1.3e-7 abs
        # on the CPU backend; exactly 0.0 on TPU)
        ("float32", 1e-6, 1e-5),
        # the DEFAULT config stores Adam mu (and the grad tree) in
        # bfloat16: fusion-level grad diffs can cross a bf16 rounding
        # boundary, amplifying to ~one bf16 ulp of the Adam update —
        # lr * ~0.8% * k steps ~= 3e-6 abs (measured 2.1e-6 / 1.8e-3
        # rel at tiny params). The contract is the same trajectory,
        # at the accumulator's own precision.
        ("bfloat16", 2e-5, 5e-3),
    ],
)
def test_multi_step_matches_single_steps(mode, param_atol, param_rtol):
    """One k=4 dispatch == four k=1 dispatches (up to fusion noise).

    Local RandomState (not the session ``rng`` fixture): the f32
    bounds are tight enough that the input must not depend on test
    selection order."""
    k = 4
    cfg = SMALL.replace(adam_mu_dtype=mode, grad_dtype=mode)
    module, state1 = create_train_state(cfg, jax.random.PRNGKey(0))
    _, state2 = create_train_state(cfg, jax.random.PRNGKey(0))
    single = make_train_step(cfg, module)
    multi = make_train_multi_step(cfg, module)

    local = np.random.RandomState(0)
    batches = [_batch(local, cfg) for _ in range(k)]
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
        rtol=1e-5, atol=1e-7,
    )
    for a, b in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            rtol=param_rtol, atol=param_atol,
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

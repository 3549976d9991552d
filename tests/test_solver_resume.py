"""Solver resume semantics: checkpoint -> resume continues the schedule
(reference: solver.py:117-121 shifts the iteration window)."""

import pytest
import os
import pickle

import numpy as np

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.training.solver import Solver, SolverConfig

pytestmark = pytest.mark.slow  # full loops / subprocess CLIs (~30-70 s)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


def _loader(seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield Batch(
            mel=rng.rand(4, 192, 80).astype(np.float32),
            spk_emb=np.eye(4, 82, dtype=np.float32),
            f0=rng.rand(4, 192, 1).astype(np.float32),
            len_org=rng.randint(64, 129, 4).astype(np.int32),
        )


def test_resume_continues_from_checkpoint(tmp_path):
    rc = SolverConfig(
        num_iters=3, log_step=10, sample_step=100, model_save_step=3,
        model_save_dir=str(tmp_path / "models"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        validation_path=str(tmp_path / "missing.pkl"),
    )
    solver = Solver(_loader(), rc, SMALL)
    state = solver.train()
    assert int(state.step) == 3
    assert os.path.isdir(tmp_path / "models" / "3-G")

    # resume: runs 3 more iterations (num_iters += resume_iters)
    rc2 = SolverConfig(
        num_iters=3, resume_iters=3, log_step=10, sample_step=100,
        model_save_step=3,
        model_save_dir=str(tmp_path / "models"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        validation_path=str(tmp_path / "missing.pkl"),
    )
    solver2 = Solver(_loader(), rc2, SMALL)
    state2 = solver2.train()
    assert int(state2.step) == 6
    assert os.path.isdir(tmp_path / "models" / "6-G")


def test_checkpoint_pruning(tmp_path):
    import jax

    from speechsplit_tpu.training.checkpoint import (
        checkpoint_steps,
        prune_checkpoints,
        save_checkpoint,
    )
    from speechsplit_tpu.training.train_step import create_train_state

    _, state = create_train_state(SMALL, jax.random.PRNGKey(0))
    for step in (1, 2, 3, 4):
        save_checkpoint(str(tmp_path), step, state)
    prune_checkpoints(str(tmp_path), keep=2)
    assert checkpoint_steps(str(tmp_path)) == [3, 4]
    prune_checkpoints(str(tmp_path), keep=0)  # 0 = keep all
    assert checkpoint_steps(str(tmp_path)) == [3, 4]

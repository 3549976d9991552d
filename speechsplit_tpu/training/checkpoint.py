"""Checkpoint save/restore with reference-compatible naming.

The reference saves ``{iter}-G.ckpt`` dicts holding model + optimizer
state every ``model_save_step`` iterations and restores both on
``--resume_iters`` (solver.py:84-90,198-202). Here the full TrainState
(params, optimizer state, step) goes through Orbax into
``{model_save_dir}/{iter}-{tag}`` directories with the same cadence and
resume semantics.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from speechsplit_tpu.training.train_step import TrainState


def _path(model_save_dir: str, step: int, tag: str) -> str:
    return os.path.abspath(os.path.join(model_save_dir, f"{step}-{tag}"))


def save_checkpoint(
    model_save_dir: str, step: int, state: TrainState, tag: str = "G"
) -> str:
    path = _path(model_save_dir, step, tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(
    model_save_dir: str,
    step: int,
    abstract_state: TrainState,
    tag: str = "G",
) -> TrainState:
    path = _path(model_save_dir, step, tag)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_state
    )
    try:
        # shardings come from the checkpoint's own sharding file — the
        # same-platform path (resume on the device that saved)
        return ckptr.restore(path, target)
    except ValueError:
        # cross-PLATFORM restore (e.g. scoring a TPU-trained checkpoint
        # on the CPU backend): the saved sharding names devices that
        # don't exist here, so target the local default device instead
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=sharding
            ),
            abstract_state,
        )
        return ckptr.restore(path, target)


def latest_checkpoint_step(
    model_save_dir: str, tag: str = "G"
) -> Optional[int]:
    steps = checkpoint_steps(model_save_dir, tag)
    return max(steps) if steps else None


def checkpoint_steps(model_save_dir: str, tag: str = "G") -> list[int]:
    if not os.path.isdir(model_save_dir):
        return []
    steps = []
    for name in os.listdir(model_save_dir):
        if name.endswith(f"-{tag}"):
            try:
                steps.append(int(name.split("-")[0]))
            except ValueError:
                continue
    return sorted(steps)


def prune_checkpoints(
    model_save_dir: str, keep: int, tag: str = "G"
) -> None:
    """Delete all but the newest ``keep`` checkpoints for ``tag``.

    The reference keeps every 1000-step checkpoint forever
    (solver.py:198-202) — a disk leak over a 1M-iteration run; retention
    is opt-in here via SolverConfig.keep_checkpoints.
    """
    import shutil

    steps = checkpoint_steps(model_save_dir, tag)
    for step in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(_path(model_save_dir, step, tag), ignore_errors=True)

"""The training driver.

Rebuilds the reference Solver (solver.py:18-269): train loop with
periodic logging, checkpointing, demo-set validation and 5-panel ablation
spectrogram renders — on top of a single fused train step (see
train_step.py) and background device prefetch. Also trains the
F0 converter (``model='f0_converter'``), which the reference never
shipped training code for.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.data.prefetch import prefetch_to_device, stack_batches
from speechsplit_tpu.ops.masks import pad_time_axis
from speechsplit_tpu.ops.quantize import quantize_f0_onehot
from speechsplit_tpu.training import checkpoint as ckpt_lib
from speechsplit_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_f0_train_step,
    make_train_multi_step,
    make_train_step,
)
from speechsplit_tpu.utils.profiling import StepTimer


@dataclasses.dataclass
class SolverConfig:
    """Run configuration (reference: main.py:41-59 argparse surface)."""

    num_iters: int = 1_000_000
    resume_iters: Optional[int] = None
    log_dir: str = "run/logs"
    model_save_dir: str = "run/models"
    sample_dir: str = "run/samples"
    log_step: int = 10
    sample_step: int = 1000
    model_save_step: int = 1000
    use_tensorboard: bool = False
    seed: int = 0
    validation_path: str = "assets/demo.pkl"
    model: str = "speechsplit"  # or "f0_converter"
    profile_dir: str = ""       # jax.profiler trace of a step window
    profile_start: int = 10
    profile_steps: int = 5
    compress_transfers: bool = False  # bf16 host->device feature feed
    keep_checkpoints: int = 0         # 0 = keep all (reference behavior)
    # >1: stage this many batches per transfer and advance them in ONE
    # XLA dispatch (lax.scan over train steps) — amortizes the fixed
    # per-dispatch host cost so the sustained loop approaches the
    # resident-batch step rate. Must divide log/save/sample steps and
    # num_iters (events land on dispatch boundaries). Same training
    # trajectory as steps_per_dispatch=1 (identical RNG streams).
    steps_per_dispatch: int = 1
    # keep ALL features in HBM and collate on device; the host sends
    # only [B] crop indices per step (~200 bytes vs ~2.5 MB). Requires
    # constructing the Solver with dataset=...; bit-identical batches
    # to the host loader (tests/test_resident.py). "bfloat16" halves
    # the resident HBM footprint at ~4e-3 feature quantization.
    data_on_device: bool = False
    resident_dtype: str = "float32"


class Solver:
    def __init__(
        self,
        loader: Optional[Iterator[Batch]],
        run_config: SolverConfig,
        config: SpeechSplitConfig,
        mesh=None,
        dataset=None,
        resident=None,
    ):
        self.loader = loader
        self.rc = run_config
        self.config = config
        self.mesh = mesh

        self.module, self.state = create_train_state(
            config, jax.random.PRNGKey(run_config.seed), run_config.model
        )
        self.tag = "G" if run_config.model == "speechsplit" else "P"
        self._resident = None
        if run_config.data_on_device:
            from speechsplit_tpu.config import resolve_dtype
            from speechsplit_tpu.data import resident as resident_lib

            if resident is not None:
                # prebuilt store, e.g. build_resident_from_wavs (the
                # device-direct preprocessing path — cli/train --wav_dir)
                features, speaker_utts = resident
            elif dataset is not None:
                features, speaker_utts = resident_lib.build_resident(
                    dataset, config,
                    store_dtype=resolve_dtype(run_config.resident_dtype),
                )
            else:
                raise ValueError(
                    "data_on_device=True requires Solver(dataset=...) "
                    "or Solver(resident=(features, speaker_utts))"
                )
            self._resident = (features, speaker_utts)
            self.train_step = resident_lib.make_resident_train_step(
                config, self.module, features, mesh, run_config.model
            )
        elif run_config.steps_per_dispatch > 1:
            self.train_step = make_train_multi_step(
                config, self.module, mesh, run_config.model
            )
        elif run_config.model == "speechsplit":
            self.train_step = make_train_step(config, self.module, mesh)
        else:
            self.train_step = make_f0_train_step(config, self.module, mesh)
        self.base_key = jax.random.PRNGKey(run_config.seed + 1)

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )
        print(f"{self.tag}: {n_params} parameters")

        self.writer = None
        if run_config.use_tensorboard:
            from tensorboardX import SummaryWriter  # lazy, optional

            os.makedirs(run_config.log_dir, exist_ok=True)
            self.writer = SummaryWriter(run_config.log_dir)

        self.validation_pt = None
        if os.path.exists(run_config.validation_path):
            import pickle

            with open(run_config.validation_path, "rb") as handle:
                self.validation_pt = pickle.load(handle)

        self._eval_fn = jax.jit(
            lambda params, x_f0, x_org, c_trg: self.module.apply(
                {"params": params}, x_f0, x_org, c_trg, train=False
            )
        )

    # ------------------------------------------------------------------
    def train(self) -> TrainState:
        rc = self.rc
        os.makedirs(rc.model_save_dir, exist_ok=True)
        os.makedirs(rc.sample_dir, exist_ok=True)

        start_iters = 0
        num_iters = rc.num_iters
        if rc.resume_iters:
            print(f"Resuming from step {rc.resume_iters}...")
            start_iters = rc.resume_iters
            num_iters += rc.resume_iters  # ref: solver.py:119-120
            self.state = ckpt_lib.restore_checkpoint(
                rc.model_save_dir, rc.resume_iters, self.state, self.tag
            )

        k = rc.steps_per_dispatch
        if k > 1:
            for name, val in (
                ("log_step", rc.log_step),
                ("model_save_step", rc.model_save_step),
                ("sample_step", rc.sample_step),
                ("num_iters", rc.num_iters),
            ):
                if val % k:
                    raise ValueError(
                        f"steps_per_dispatch={k} must divide {name}={val} "
                        "so logging/checkpoint events land on dispatch "
                        "boundaries"
                    )
        if self._resident is not None:
            from speechsplit_tpu.data import resident as resident_lib

            features, speaker_utts = self._resident
            plans = resident_lib.plan_batches(
                speaker_utts, np.asarray(features.length),
                self.config, seed=rc.seed,
            )
            loader = (
                resident_lib.stack_plans(plans, k)
                if k > 1 or self.mesh is not None
                else plans
            )
        elif k > 1:
            loader = stack_batches(self.loader, k)
        else:
            loader = self.loader
        batches = prefetch_to_device(loader, compress=rc.compress_transfers)
        print("Start training...")
        start_time = time.time()
        timer = StepTimer()

        profiling = False
        for i in range(start_iters, num_iters, k):
            batch = next(batches)
            if (
                rc.profile_dir
                and not profiling
                and i >= start_iters + rc.profile_start
            ):
                jax.profiler.start_trace(rc.profile_dir)
                profile_end = i + rc.profile_steps
                profiling = True
            self.state, loss = self.train_step(
                self.state, batch, self.base_key
            )
            timer.tick(k)
            if profiling and i + k > profile_end:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                profiling = False
                print(f"Wrote profiler trace to {rc.profile_dir}")
                rc = dataclasses.replace(rc, profile_dir="")  # once only
            i = i + k - 1  # end-of-dispatch iteration for bookkeeping

            if (i + 1) % rc.log_step == 0:
                loss_val = float(np.ravel(np.asarray(loss))[-1])
                if not np.isfinite(loss_val):
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at step {i + 1}; "
                        f"latest checkpoint is in {rc.model_save_dir}"
                    )
                et = str(
                    datetime.timedelta(seconds=time.time() - start_time)
                )[:-7]
                print(
                    f"Elapsed [{et}], Iteration [{i + 1}/{num_iters}], "
                    f"{self.tag}/loss_id: {loss_val:.8f}, "
                    f"{timer.steps_per_sec:.1f} steps/s"
                )
                if self.writer:
                    self.writer.add_scalar(
                        f"{self.tag}/loss_id", loss_val, i + 1
                    )
                    self.writer.add_scalar(
                        "steps_per_sec", timer.steps_per_sec, i + 1
                    )

            if (i + 1) % rc.model_save_step == 0:
                path = ckpt_lib.save_checkpoint(
                    rc.model_save_dir, i + 1, self.state, self.tag
                )
                print(f"Saved checkpoint {path}")
                if rc.keep_checkpoints:
                    ckpt_lib.prune_checkpoints(
                        rc.model_save_dir, rc.keep_checkpoints, self.tag
                    )

            if (i + 1) % rc.sample_step == 0 and self.validation_pt:
                if self.rc.model == "speechsplit":
                    val = self.validate()
                    print(f"Validation loss: {val}")
                    if self.writer:
                        self.writer.add_scalar("Validation_loss", val, i + 1)
                    self.render_samples(i + 1)

        return self.state

    # ------------------------------------------------------------------
    def _prepare_val_inputs(self, val_sub):
        """Pad one validation utterance (ref: solver.py:210-220)."""
        cfg = self.config
        # accept both the reference's (1, 82) and flat (82,) bundles
        emb = np.asarray(val_sub[1], np.float32).reshape(1, -1)
        mel, f0, length, _uid = val_sub[2]
        x_pad, _ = pad_time_axis(
            np.asarray(mel, np.float32)[None], cfg.max_len_pad
        )
        f0_pad = np.pad(
            np.asarray(f0, np.float64), (0, cfg.max_len_pad - length),
            constant_values=0.0,
        )
        f0_onehot = np.asarray(
            quantize_f0_onehot(jnp.asarray(f0_pad), cfg.dim_f0 - 1)
        )[None]
        x_f0 = np.concatenate([x_pad, f0_onehot], axis=-1)
        if cfg.spk_emb_mode == "learned":
            # the decoder was trained on SpeakerEncoder(mel) embeddings
            # (train_step passes batch.mel as c_trg); conditioning
            # validation on the stored one-hot would feed a vector from
            # the wrong distribution and silently score garbage — pass
            # the utterance mel (rank 3) so the generator's learned-mode
            # dispatch embeds it the same way training does
            return x_f0, x_pad, x_pad
        return x_f0, x_pad, emb

    def validate(self) -> float:
        """Sum-MSE reconstruction over validation utterances
        (ref: solver.py:206-225)."""
        losses = []
        for val_sub in self.validation_pt:
            x_f0, x_pad, emb = self._prepare_val_inputs(val_sub)
            out = self._eval_fn(
                self.state.params,
                jnp.asarray(x_f0),
                jnp.asarray(x_pad),
                jnp.asarray(emb),
            )
            losses.append(
                float(jnp.sum(jnp.square(jnp.asarray(x_pad) - out)))
            )
        return float(np.mean(losses))

    def render_samples(self, step: int) -> None:
        """5-panel ablation renders: GT / recon / woC / woR / woF
        (ref: solver.py:231-269)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for val_sub in self.validation_pt:
            x_f0, x_pad, emb = self._prepare_val_inputs(val_sub)
            x_f0 = jnp.asarray(x_f0)
            x_pad = jnp.asarray(x_pad)
            emb = jnp.asarray(emb)
            zeros_f0 = x_f0.at[:, :, self.config.dim_freq :].set(0.0)
            zeros_mel = x_f0.at[:, :, : self.config.dim_freq].set(0.0)

            recon = self._eval_fn(self.state.params, x_f0, x_pad, emb)
            wo_f = self._eval_fn(self.state.params, zeros_f0, x_pad, emb)
            wo_r = self._eval_fn(
                self.state.params, x_f0, jnp.zeros_like(x_pad), emb
            )
            wo_c = self._eval_fn(self.state.params, zeros_mel, x_pad, emb)

            panels = [
                np.asarray(x)[0].T
                for x in (x_pad, recon, wo_c, wo_r, wo_f)
            ]
            vmin = min(p.min() for p in panels)
            vmax = max(p.max() for p in panels)
            fig, axes = plt.subplots(5, 1, sharex=True)
            for ax, panel in zip(axes, panels):
                ax.imshow(panel, aspect="auto", vmin=vmin, vmax=vmax)
            fig.savefig(
                f"{self.rc.sample_dir}/{step}_{val_sub[0]}_2.png", dpi=150
            )
            plt.close(fig)

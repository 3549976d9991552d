"""Loss-trajectory equivalence across gradient-precision modes.

Trains the full generator for N steps on fixed synthetic data (same
seed, same crops) once per residual-dtype mode and reports the
step-wise relative loss deltas. This is the measurement behind the
BENCHMARKS.md claim that bf16 residuals (and, round 3, bf16-input dW
contractions) are loss-trajectory-equivalent to the exact f32 path.

Usage::

    python -m benchmarks.trajectory_check [--steps 400] [--batch 16]
           [--modes float32,bfloat16]
    # dh-stream lever equivalence at the shipped default config:
    python -m benchmarks.trajectory_check --modes bfloat16,bfloat16+dh
"""

from __future__ import annotations

import argparse
import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--modes", default="float32,bfloat16")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.RandomState(0)
    b = args.batch
    base_cfg = SpeechSplitConfig(batch_size=b)
    t = base_cfg.max_len_pad
    # ONE fixed batch shared by every mode (speech-like smooth targets
    # so the loss has structure to fit)
    base = np.cumsum(
        rng.randn(b, t, base_cfg.dim_freq).astype(np.float32) * 0.05,
        axis=1,
    )
    np_batch = Batch(
        mel=np.clip(0.5 + 0.2 * np.tanh(base), 0.0, 1.0).astype(
            np.float32
        ),
        spk_emb=np.eye(b, base_cfg.dim_spk_emb, dtype=np.float32),
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=rng.randint(
            base_cfg.min_len_seq, base_cfg.max_len_seq + 1, b
        ).astype(np.int32),
    )
    from speechsplit_tpu.ops import pallas_lstm

    orig_dh_fn = pallas_lstm._dh_stream_dtype
    trajectories = {}
    for mode in args.modes.split(","):
        # "+dh" forces the backward dh cotangent stream to bf16 and
        # "+f32dh" forces it to f32, overriding the default (which,
        # since the round-4 flip, is ALREADY bf16 when residuals are
        # bf16 — BENCHMARKS.md "dh stream default"). The recorded
        # equivalence run compared the two forced sides; a bare
        # residual-dtype mode runs the shipped default.
        residual, _, lever = mode.partition("+")
        import jax.numpy as jnp

        if lever == "dh":
            pallas_lstm._dh_stream_dtype = lambda c, r: jnp.bfloat16
        elif lever == "f32dh":
            pallas_lstm._dh_stream_dtype = lambda c, r: jnp.float32
        else:
            pallas_lstm._dh_stream_dtype = orig_dh_fn
        config = SpeechSplitConfig(batch_size=b, residual_dtype=residual)
        batch = jax.tree.map(jax.device_put, np_batch)
        module, state = create_train_state(config, jax.random.PRNGKey(0))
        step = make_train_step(config, module)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(args.steps):
            state, loss = step(state, batch, key)
            if (i + 1) % args.log_every == 0 or i == 0:
                losses.append((i + 1, float(loss)))
                log(f"{mode} step {i + 1}: {losses[-1][1]:.6f}")
        trajectories[mode] = losses

    modes = list(trajectories)
    if len(modes) == 2:
        ref, alt = trajectories[modes[0]], trajectories[modes[1]]
        deltas = [
            abs(a[1] - b_[1]) / (abs(a[1]) + 1e-12)
            for a, b_ in zip(ref, alt)
        ]
        print(
            f"max relative loss delta {modes[0]} vs {modes[1]} over "
            f"{args.steps} steps: {max(deltas):.2e} "
            f"(final {deltas[-1]:.2e})"
        )
    for mode, losses in trajectories.items():
        print(mode, " ".join(f"{i}:{v:.6f}" for i, v in losses))


if __name__ == "__main__":
    main()

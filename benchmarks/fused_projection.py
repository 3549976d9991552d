"""A/B benchmark: fused in-kernel input projection vs project-outside.

Times the full fused train step (quantize + augment + fwd + bwd + adam)
with ``pallas_lstm.PROJ_FUSION`` pinned "off" vs "auto" at one or more
batch sizes, value-chained and fenced per the repo's timing methodology
(see benchmarks/suite.py — jax.block_until_ready does not synchronize on
this tunneled platform).

Usage::

    python -m benchmarks.fused_projection [--batches 16,32] [--steps 200]
           [--dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--modes", default="off,auto")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.ops import pallas_lstm
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.RandomState(0)
    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        config = SpeechSplitConfig(
            batch_size=b, compute_dtype=args.dtype
        )
        t = config.max_len_pad
        batch = Batch(
            mel=rng.rand(b, t, config.dim_freq).astype(np.float32),
            spk_emb=np.eye(b, config.dim_spk_emb, dtype=np.float32),
            f0=rng.rand(b, t, 1).astype(np.float32),
            len_org=rng.randint(
                config.min_len_seq, config.max_len_seq + 1, b
            ).astype(np.int32),
        )
        batch = jax.tree.map(jax.device_put, batch)
        for mode in args.modes.split(","):
            pallas_lstm.PROJ_FUSION = mode
            module, state = create_train_state(
                config, jax.random.PRNGKey(0)
            )
            step = make_train_step(config, module)  # already jitted
            key = jax.random.PRNGKey(1)
            for _ in range(max(args.warmup, 1)):  # >=1: 'loss' fences
                state, loss = step(state, batch, key)
            float(loss)  # fence: compile + warmup complete
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, loss = step(state, batch, key)
            lv = float(loss)  # value-dependent chain + scalar fence
            dt = (time.perf_counter() - t0) / args.steps
            log(
                f"batch {b} {args.dtype} PROJ_FUSION={mode}: "
                f"{dt * 1e3:.2f} ms/step ({1 / dt:.1f} steps/s), "
                f"loss {lv:.4f}"
            )
            results.append((b, mode, dt))
    for b, mode, dt in results:
        print(f"{b},{args.dtype},{mode},{dt * 1e3:.3f}")


if __name__ == "__main__":
    main()

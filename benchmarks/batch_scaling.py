"""Train-step throughput vs batch size and compute dtype (TPU).

VERDICT r1 #2/#3: at the reference geometry (batch 16) the recurrent
matmuls use 16 of 128 MXU rows; larger batches should harvest the idle
rows nearly for free. This sweep measures the fused train step at
batch 16/32/64/128 in float32 and bfloat16 and reports steps/s and
mel-frames/s per chip.

Timing: per-dispatch loop with value-chained state (the TrainState
dependency serializes steps) fenced by one scalar fetch — the
methodology benchmarks/suite.py validates against in-scan device-only
timing (they agree within ~2%, CLAUDE.md).

Usage: python -m benchmarks.batch_scaling [--batches 16,32,64,128]
       [--dtypes float32,bfloat16] [--n 200]
Prints one JSON dict; also appends nothing to disk (callers redirect).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_step(batch_size: int, compute_dtype: str, n_meas: int) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    config = SpeechSplitConfig(
        batch_size=batch_size, compute_dtype=compute_dtype
    )
    module, state = create_train_state(config, jax.random.PRNGKey(0))
    step = make_train_step(config, module)

    rng = np.random.RandomState(0)
    b, t = batch_size, config.max_len_pad
    batch = Batch(
        mel=rng.rand(b, t, config.dim_freq).astype(np.float32),
        spk_emb=np.eye(b, config.dim_spk_emb, dtype=np.float32),
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=rng.randint(
            config.min_len_seq, config.max_len_seq + 1, b
        ).astype(np.int32),
    )
    batch = jax.tree.map(jax.device_put, batch)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step(state, batch, key)
    warm_loss = float(loss)
    compile_s = time.perf_counter() - t0

    start = time.perf_counter()
    for _ in range(n_meas):
        state, loss = step(state, batch, key)
    final_loss = float(loss)  # fence
    elapsed = time.perf_counter() - start

    assert np.isfinite(final_loss), final_loss
    ms = elapsed / n_meas * 1e3
    out = {
        "batch": batch_size,
        "dtype": compute_dtype,
        "ms_per_step": round(ms, 3),
        "steps_per_sec": round(n_meas / elapsed, 2),
        "frames_per_sec": round(n_meas * b * t / elapsed, 0),
        "loss_after": round(final_loss, 5),
        "warmup_s": round(compile_s, 1),
    }
    log(f"  {out}")
    return out


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64,128")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--n", type=int, default=200)
    args = ap.parse_args(argv)

    rows = []
    for dtype in args.dtypes.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            log(f"bench batch={b} dtype={dtype} ...")
            rows.append(bench_step(b, dtype, args.n))
    return {"train_step_sweep": rows}


if __name__ == "__main__":
    print(json.dumps(main(), indent=2))

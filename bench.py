"""Benchmark: full-geometry training throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}

The reference publishes no performance numbers (BASELINE.md), so the
baseline here is the measured throughput of the reference PyTorch train
step (same model geometry, same batch 16, forward+backward+Adam) on this
host's CPU — the only hardware both stacks can run on in this
environment. ``vs_baseline`` is ours/theirs. Extra context (preprocessing
throughput, baseline numbers) goes to stderr only.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_train_steps(
    n_warmup: int = 3, n_meas: int = 200, k: int = 10
) -> float:
    """Sustained steps/s of the shipped training configuration.

    Times the k-steps-per-dispatch scan path (``make_train_multi_step``
    — the CLI's ``--steps_per_dispatch``, the recommended configuration
    for resident-data training). It runs the SAME per-step math and RNG
    stream as single-step dispatch (trajectory identical digit-for-digit
    on hardware, tests/test_training.py), so this is a training rate,
    not a kernel microbenchmark; staging k steps per program simply
    stops this environment's ~0.2-4 ms per-dispatch tunnel cost from
    being billed to every step. The single-dispatch number lives in
    ``benchmarks.suite`` for comparison.
    """
    import jax

    _enable_compile_cache()

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_multi_step,
    )

    config = SpeechSplitConfig()
    module, state = create_train_state(config, jax.random.PRNGKey(0))
    step = make_train_multi_step(config, module)

    rng = np.random.RandomState(0)
    b, t = config.batch_size, config.max_len_pad
    batch = Batch(
        mel=rng.rand(k, b, t, config.dim_freq).astype(np.float32),
        spk_emb=np.broadcast_to(
            np.eye(b, config.dim_spk_emb, dtype=np.float32),
            (k, b, config.dim_spk_emb),
        ).copy(),
        f0=rng.rand(k, b, t, 1).astype(np.float32),
        len_org=rng.randint(
            config.min_len_seq, config.max_len_seq + 1, (k, b)
        ).astype(np.int32),
    )
    batch = jax.tree.map(jax.device_put, batch)
    key = jax.random.PRNGKey(1)

    # NOTE: on the tunneled TPU platform in this environment,
    # block_until_ready does not actually synchronize; the only reliable
    # fence is a host fetch. Dispatches are value-chained (state feeds
    # the next one), so fetching the final loss times the whole chain.
    for _ in range(n_warmup):
        state, losses = step(state, batch, key)
    _ = float(losses[-1])

    n_dispatch = n_meas // k
    start = time.perf_counter()
    for _ in range(n_dispatch):
        state, losses = step(state, batch, key)
    _ = float(losses[-1])
    elapsed = time.perf_counter() - start
    log(
        f"jax: {n_dispatch * k} steps ({n_dispatch} dispatches of {k}) "
        f"in {elapsed:.3f}s on {jax.devices()[0]}"
    )
    return n_dispatch * k / elapsed


def bench_reference_cpu(n_meas: int = 3) -> float | None:
    """Reference PyTorch train step on host CPU (same batch/geometry)."""
    try:
        sys.path.insert(0, "/root/repo/tests")
        sys.path.insert(0, "/root/repo")
        import torch
        from tests.reference_oracle import load_reference

        ref_model, ref_hparams = load_reference()
    except Exception as exc:  # reference not available
        log(f"reference baseline unavailable: {exc}")
        return None

    import torch

    torch.manual_seed(0)
    g = ref_model.Generator_3(ref_hparams).train()
    interp = ref_model.InterpLnr(ref_hparams).train()
    opt = torch.optim.Adam(g.parameters(), 1e-4, (0.9, 0.999))

    rng = np.random.RandomState(0)
    b, t = 16, 192
    mel = torch.from_numpy(rng.rand(b, t, 80).astype(np.float32))
    f0 = torch.from_numpy(rng.rand(b, t, 1).astype(np.float32))
    emb = torch.from_numpy(np.eye(b, 82, dtype=np.float32))
    lens = torch.from_numpy(
        rng.randint(64, 129, b).astype(np.int64)
    )

    sys.path.insert(0, "/root/reference")
    from utils import quantize_f0_torch  # reference util, host oracle

    def one_step():
        x_f0 = torch.cat((mel, f0), dim=-1)
        x_f0_intrp = interp(x_f0, lens)
        f0_q = quantize_f0_torch(x_f0_intrp[:, :, -1])[0]
        x_in = torch.cat((x_f0_intrp[:, :, :-1], f0_q), dim=-1)
        out = g(x_in, mel, emb)
        loss = torch.nn.functional.mse_loss(mel, out)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one_step()  # warmup
    # host timing is noisy under background load; credit the baseline
    # its fastest step (conservative for our speedup ratio)
    best = float("inf")
    for _ in range(n_meas):
        start = time.perf_counter()
        one_step()
        best = min(best, time.perf_counter() - start)
    log(f"torch-cpu best step: {best:.3f}s")
    return 1.0 / best


def main() -> None:
    ours = bench_train_steps()
    baseline = bench_reference_cpu()
    vs = round(ours / baseline, 3) if baseline else None
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec",
                "value": round(ours, 3),
                "unit": "steps/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Reconcile the dh-stream A/B win with the graded bench.py headline.

Round 4 measured the dh cotangent-stream lever at **-11.0%** per step
(6.132 -> 5.455 ms, B16 f32 compute + bf16 residuals — exactly
bench.py's configuration) with single-step dispatch on a loaded host
(`benchmarks.stream_dtype_ab`), and flipped the default ON after a
trajectory-equivalence run. Yet BENCH_r04.json's k=10 multi-step scan
headline was bit-for-bit flat vs round 3 (217.78 vs 217.89 steps/s) —
an unreconciled contradiction (VERDICT r4 weak #1 / task #2).

This benchmark settles it by measuring BOTH dispatch paths with the dh
lever pinned each way, interleaved A/B/B/A on one process:

  - ``multi``  — ``make_train_multi_step`` with k=10 (bench.py's path)
  - ``single`` — ``make_train_step`` single dispatch (suite's path)

Methodology per CLAUDE.md: value-chained dispatches fenced by one
scalar fetch; fresh device state per timed block (the steps donate
their input state); dh arms alternate per round so tunnel/host drift
cannot masquerade as a lever effect. Run on an idle host (never
concurrently with pytest).
"""

from __future__ import annotations

import json
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_block", type=int, default=200,
                    help="steps per timed block (multi: /k dispatches)")
    ap.add_argument("--n_rounds", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.ops import pallas_lstm
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_multi_step,
        make_train_step,
    )

    config = SpeechSplitConfig()  # B16, f32 compute, bf16 residuals
    module, state0 = create_train_state(config, jax.random.PRNGKey(0))
    state_host = jax.tree.map(np.asarray, state0)
    rng = np.random.RandomState(0)
    b, t, k = config.batch_size, config.max_len_pad, args.k

    def make_batch(lead):
        return Batch(
            mel=rng.rand(*lead, b, t, config.dim_freq).astype(np.float32),
            spk_emb=np.broadcast_to(
                np.eye(b, config.dim_spk_emb, dtype=np.float32),
                (*lead, b, config.dim_spk_emb),
            ).copy(),
            f0=rng.rand(*lead, b, t, 1).astype(np.float32),
            len_org=rng.randint(
                config.min_len_seq, config.max_len_seq + 1, (*lead, b)
            ).astype(np.int32),
        )

    batch1 = jax.tree.map(jax.device_put, make_batch(()))
    batchk = jax.tree.map(jax.device_put, make_batch((k,)))
    key = jax.random.PRNGKey(1)

    # one step function per (path, dh) arm — jit caches are per function
    arms = {}
    for dh in (True, False):
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = dh
        arms[("multi", dh)] = make_train_multi_step(config, module)
        arms[("single", dh)] = make_train_step(config, module)

    # warm all four programs (compile)
    for (path, dh), step in arms.items():
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = dh
        st = jax.device_put(state_host)
        t0 = time.perf_counter()
        if path == "multi":
            st, losses = step(st, batchk, key)
            warm = float(losses[-1])
        else:
            st, loss = step(st, batch1, key)
            warm = float(loss)
        log(f"{path} dh={dh}: warm loss {warm:.6f} "
            f"(compile {time.perf_counter() - t0:.1f}s)")

    times = {key_: [] for key_ in arms}
    for r in range(args.n_rounds):
        order = list(arms)
        if r % 2:
            order = order[::-1]
        for path, dh in order:
            pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = dh
            step = arms[(path, dh)]
            st = jax.device_put(state_host)
            if path == "multi":
                st, losses = step(st, batchk, key)
                float(losses[-1])  # fence before the timed block
                n_dispatch = max(args.n_block // k, 1)
                start = time.perf_counter()
                for _ in range(n_dispatch):
                    st, losses = step(st, batchk, key)
                float(losses[-1])
                ms = (time.perf_counter() - start) / (n_dispatch * k) * 1e3
            else:
                st, loss = step(st, batch1, key)
                float(loss)
                start = time.perf_counter()
                for _ in range(args.n_block):
                    st, loss = step(st, batch1, key)
                float(loss)
                ms = (time.perf_counter() - start) / args.n_block * 1e3
            times[(path, dh)].append(ms)
            log(f"round {r} {path} dh={dh}: {ms:.3f} ms/step")

    pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = True  # restore default
    results = {
        f"{path}_dh{dh}": {
            "min_ms": round(min(ts), 3),
            "steps_per_sec_at_min": round(1e3 / min(ts), 2),
            "all_ms": [round(x, 3) for x in ts],
        }
        for (path, dh), ts in times.items()
    }
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()

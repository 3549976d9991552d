"""A/B: static f32 vs static bf16 vs adaptive result fetch (VERDICT r3).

Round-3 measured ``--compress_results`` (bf16 result fetch) winning on
two tunnel-weather windows and LOSING 15% on a compute-bound one —
a static flag cannot be right everywhere. Round-4 adds two adaptive
mechanisms:

  - ``convert_stream(compress_fetch="auto")`` decides once on the
    first batch: link profile + a fenced compute timing of the actual
    grid -> linkprobe.choose_compress. (The first auto design probed
    both modes in-stream with 3-batch phases; window-1 measured those
    probe phases costing 15% of a 24-batch stream, failing this
    benchmark's own acceptance bar — hence the one-shot redesign.)
  - single-request paths resolve "auto" from a once-per-process link
    probe (linkprobe.choose_compress).

This benchmark runs the three policies interleaved per round on the
SAME pair stream (drift protection) and reports utterances/s. The
acceptance bar: auto within 5% of the better static choice on every
recorded window.

  python -m benchmarks.adaptive_fetch --out /tmp/adaptive_ab.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_batches", type=int, default=24)
    ap.add_argument("--n_pairs", type=int, default=8)
    ap.add_argument("--n_rounds", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.convert import (
        convert_batched,
        convert_stream,
        prepare_utterance,
    )
    from speechsplit_tpu.linkprobe import probe_link
    from speechsplit_tpu.training.train_step import create_train_state

    config = SpeechSplitConfig()
    g_module, g_state = create_train_state(config, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        config, jax.random.PRNGKey(1), "f0_converter"
    )
    rng = np.random.RandomState(0)

    def utt(name, uid, length=150):
        mel = rng.rand(length, 80).astype(np.float32)
        f0 = rng.rand(length).astype(np.float32)
        emb = np.zeros(82, np.float32)
        emb[rng.randint(0, 82)] = 1.0
        return prepare_utterance(config, mel, f0, emb, name=name, uid=uid)

    pairs = [
        (utt(f"s{i}", "u"), utt(f"t{i}", "v"))
        for i in range(args.n_pairs)
    ]
    # warm both compiled modes
    for c in (False, True):
        _ = convert_batched(
            g_module, g_state.params, p_module, p_state.params, pairs,
            compress_fetch=c,
        )
    profile = probe_link()
    log(f"link probe: {profile}")

    def run(policy) -> float:
        start = time.perf_counter()
        n = 0
        for results in convert_stream(
            g_module, g_state.params, p_module, p_state.params,
            (pairs for _ in range(args.n_batches)),
            compress_fetch=policy,
        ):
            n += sum(len(r) for r in results)
        elapsed = time.perf_counter() - start
        assert n == args.n_batches * args.n_pairs * 7
        return n / elapsed

    policies = [("f32", False), ("bf16", True), ("auto", "auto")]
    rates = {name: [] for name, _ in policies}
    for r in range(args.n_rounds):
        order = policies if r % 2 == 0 else policies[::-1]
        for name, policy in order:
            rates[name].append(round(run(policy), 2))
            log(f"round {r} {name}: {rates[name][-1]} utt/s")

    best = {name: max(v) for name, v in rates.items()}
    static_best = max(best["f32"], best["bf16"])
    report = {
        "link_probe": profile._asdict(),
        "utt_per_sec": rates,
        "best": best,
        "auto_vs_best_static": round(best["auto"] / static_best, 4),
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()

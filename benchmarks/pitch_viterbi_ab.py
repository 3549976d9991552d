"""Honest in-scan A/B: serial vs block (radix-k) vs parallel Viterbi.

CLAUDE.md open lead (r4): Viterbi is ~0.51 ms of the 3.70 ms device
preprocessing body. The serial decoder pays 2xT sequential-issue scan
steps of tiny [S, S] work; the full associative scan removed latency
but measured a LOSS (log2 T levels of [T, S, S, S] min-plus). The
block decoder (PitchParams.block_viterbi=k) is the middle ground:
k-fold fewer sequential steps for a bounded ~2x FLOP growth.

Methodology is the nccf_ab / bench_preprocess_device standard: time
the FULL fused extract_features body inside a lax.scan with every
output folded into the carry (nothing DCE-able), flipping only the
decoder knob. Upside is bounded by the 0.51 ms Viterbi share.

  python -m benchmarks.pitch_viterbi_ab --out /tmp/viterbi_ab.json
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
    ap.add_argument("--n_meas", type=int, default=30)
    ap.add_argument("--n_rounds", type=int, default=4)
    ap.add_argument(
        "--radices", default="4,8,16,32",
        help="comma list of block_viterbi radices to A/B",
    )
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.ops.pitch import PitchParams
    from speechsplit_tpu.preprocess import extract_features

    rng = np.random.RandomState(0)
    b, n = 16, 4 * 16000
    wavs = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    lengths = jnp.full((b,), n, jnp.int32)
    lo = jnp.full((b,), 50.0, jnp.float32)
    hi = jnp.full((b,), 600.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    n_meas = args.n_meas

    def make_run(params):
        @jax.jit
        def run_n(x0):
            def body(carry, i):
                mel, f0 = extract_features(
                    carry, lengths, lo, hi, jax.random.fold_in(key, i),
                    pitch_params=params,
                )
                fold = mel.mean() + jnp.clip(f0, -1.0, 2.0).mean()
                return x0 + fold * 1e-12, fold

            _, outs = jax.lax.scan(body, x0, jnp.arange(n_meas))
            return outs[-1]

        return run_n

    runs = {"serial": make_run(PitchParams())}
    for r in args.radices.split(","):
        r = r.strip()
        if r:
            runs[f"block{r}"] = make_run(
                PitchParams(block_viterbi=int(r))
            )
    runs["parallel"] = make_run(PitchParams(parallel_viterbi=True))

    for name, run in runs.items():
        t0 = time.perf_counter()
        _ = float(run(wavs))
        log(f"{name}: warm in {time.perf_counter() - t0:.1f}s")

    times = {name: [] for name in runs}
    for r in range(args.n_rounds):
        order = list(runs) if r % 2 == 0 else list(runs)[::-1]
        for name in order:
            t0 = time.perf_counter()
            _ = float(runs[name](wavs))
            per = (time.perf_counter() - t0) / n_meas * 1e3
            times[name].append(round(per, 3))
    frames = b * (n // 256 + 1)
    report = {
        name: {
            "ms_per_batch": min(ts),
            "all": ts,
            "frames_per_sec": round(frames / (min(ts) / 1e3), 1),
        }
        for name, ts in times.items()
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()

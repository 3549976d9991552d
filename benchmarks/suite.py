"""Benchmark suite for the three BASELINE.json metrics.

  1. train steps/s          (Generator_3 training, batch 16, T=192)
  2. preprocessing mel-frames/s  (wav -> mel + F0, batched on device)
  3. conversion utterances/s     (7-condition batched conversion)

Timing methodology: on this environment's tunneled TPU,
``block_until_ready`` does not synchronize and the tunnel adds ~35 ms
per host round trip, so every measurement chains value-dependent device
calls and fences once with a scalar host fetch; overhead is amortized
over long chains.

``python -m benchmarks.suite`` prints a JSON dict of all metrics; the
repo-root ``bench.py`` wraps the primary metric in the driver's
single-line format.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    return jax


def train_flops_per_step(n_params: int, batch: int, t: int) -> float:
    """Analytic model-FLOPs per train step (the MFU numerator).

    Every parameter of this model is a conv / LSTM / linear weight
    applied once per output frame, and all branches run at the full
    T=192 grid (downsampling happens at the code level AFTER the
    recurrences): forward matmul FLOPs = 2 * P * B * T MACs, and the
    backward pass of a matmul-dominated model costs 2x the forward
    (dX and dW each re-use every weight/activation once) -> train step
    = 6 * P * B * T. Elementwise/optimizer FLOPs are excluded (true
    model-FLOPs convention), so the resulting utilization is not
    flattered by pointwise work."""
    return 6.0 * n_params * batch * t


# bf16 MXU peak of one TPU v5 lite (v5e) chip, FLOP/s
V5E_BF16_PEAK = 197e12


def bench_train(n_meas: int = 300, batch_size=None, dtypes=None) -> dict:
    """Measure the train step; returns rate + an MFU estimate.

    ``batch_size``/``dtypes`` override the reference defaults for
    best-operating-point runs (BENCHMARKS.md "Batch scaling": B40 full
    bf16 is the throughput/chip optimum)."""
    jax = setup_jax()
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    config = SpeechSplitConfig()
    if batch_size is not None:
        import dataclasses

        config = dataclasses.replace(config, batch_size=batch_size)
    if dtypes is not None:
        import dataclasses

        config = dataclasses.replace(config, **dtypes)
    module, state = create_train_state(config, jax.random.PRNGKey(0))
    step = make_train_step(config, module)

    rng = np.random.RandomState(0)
    b, t = config.batch_size, config.max_len_pad
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

    n_params = sum(x.size for x in jax.tree.leaves(state.params))

    for _ in range(5):
        state, loss = step(state, batch, key)
    _ = float(loss)
    start = time.perf_counter()
    for _ in range(n_meas):
        state, loss = step(state, batch, key)
    _ = float(loss)
    elapsed = time.perf_counter() - start
    rate = n_meas / elapsed
    flops = train_flops_per_step(n_params, b, t)
    tflops = rate * flops / 1e12
    log(
        f"train (B{b} {config.compute_dtype}): {n_meas} steps in "
        f"{elapsed:.3f}s = {rate:.1f} steps/s, "
        f"{tflops:.1f} model-TFLOP/s "
        f"({100 * tflops * 1e12 / V5E_BF16_PEAK:.0f}% of v5e bf16 peak)"
    )
    return {
        "steps_per_sec": round(rate, 3),
        "mel_frames_per_sec": round(rate * b * t, 1),
        "model_tflops_per_sec": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(tflops * 1e12 / V5E_BF16_PEAK, 3),
    }


def bench_preprocess(n_meas: int = 30, k: int = 8) -> float:
    """mel-frames/s through the fused wav->features pipeline, staged
    ``k`` batches per dispatch (extract_features_scan — one program
    amortizes the fixed per-dispatch host cost over k batches, the same
    staging data.prepare.extract_dir ships). Dispatches are
    value-chained (each consumes a scalar of the previous output) and
    fenced once at the end, per the tunnel methodology above."""
    jax = setup_jax()
    import jax.numpy as jnp

    from speechsplit_tpu.preprocess import extract_features_scan

    rng = np.random.RandomState(0)
    b, n = 16, 4 * 16000  # sixteen 4-second utterances per batch
    wavs = jnp.asarray(rng.randn(k, b, n).astype(np.float32) * 0.3)
    lengths = jnp.full((k, b), n, jnp.int32)
    lo = jnp.full((k, b), 50.0, jnp.float32)
    hi = jnp.full((k, b), 600.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    mel, f0 = extract_features_scan(wavs, lengths, lo, hi, key)
    _ = float(mel[0, 0, 0, 0])
    frames_per_call = k * b * (n // 256 + 1)

    start = time.perf_counter()
    chained = wavs
    for i in range(n_meas):
        mel, f0 = extract_features_scan(chained, lengths, lo, hi, key)
        # fold a scalar of the output back into the input to chain
        chained = wavs + mel[0, 0, 0, 0] * 1e-12
    _ = float(mel[0, 0, 0, 0])
    elapsed = time.perf_counter() - start
    rate = n_meas * frames_per_call / elapsed
    log(
        f"preprocess: {n_meas} dispatches x {frames_per_call} frames "
        f"(k={k}) in {elapsed:.3f}s"
    )
    return rate


def bench_preprocess_with_fetch(n_meas: int = 20, k: int = 8) -> float:
    """Like bench_preprocess but every dispatch's FULL feature results
    cross back to the host (bf16, as extract_dir --compress_fetch
    fetches them), with one dispatch kept in flight so fetch overlaps
    compute — the honest wav-array-in, numpy-features-out rate."""
    jax = setup_jax()
    import jax.numpy as jnp

    from speechsplit_tpu.preprocess import extract_features_scan

    rng = np.random.RandomState(0)
    b, n = 16, 4 * 16000
    wavs = jnp.asarray(rng.randn(k, b, n).astype(np.float32) * 0.3)
    lengths = jnp.full((k, b), n, jnp.int32)
    lo = jnp.full((k, b), 50.0, jnp.float32)
    hi = jnp.full((k, b), 600.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    def submit(i):
        mel, f0 = extract_features_scan(
            wavs, lengths, lo, hi, jax.random.fold_in(key, i),
            compress=True,
        )
        try:
            mel.copy_to_host_async()
            f0.copy_to_host_async()
        except AttributeError:
            pass
        return mel, f0

    mel, f0 = submit(0)
    _ = (np.asarray(mel), np.asarray(f0))
    frames_per_call = k * b * (n // 256 + 1)

    start = time.perf_counter()
    in_flight = [submit(0)]
    total = 0.0
    for i in range(1, n_meas + 1):
        if i <= n_meas - 1:
            in_flight.append(submit(i))
        mel, f0 = in_flight.pop(0)
        total += float(np.asarray(mel, np.float32)[0, 0, 0, 0])
        _ = np.asarray(f0)
    elapsed = time.perf_counter() - start
    assert np.isfinite(total)
    rate = n_meas * frames_per_call / elapsed
    log(
        f"preprocess+fetch: {n_meas} dispatches x {frames_per_call} "
        f"frames in {elapsed:.3f}s"
    )
    return rate


def bench_preprocess_device(n_meas: int = 30) -> float:
    """Device-only mel-frames/s: the whole measurement loop runs inside
    one jitted lax.scan, so no per-iteration host submit cost is
    counted. This is the number a pipelined feeder approaches on a
    normal TPU host; the end-to-end figure above is bounded by this
    environment's device tunnel (~30 ms/dispatch round trip)."""
    jax = setup_jax()
    import jax.numpy as jnp

    from speechsplit_tpu.preprocess import extract_features

    rng = np.random.RandomState(0)
    b, n = 16, 4 * 16000
    wavs = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.3)
    lengths = jnp.full((b,), n, jnp.int32)
    lo = jnp.full((b,), 50.0, jnp.float32)
    hi = jnp.full((b,), 600.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_n(x0):
        def body(carry, i):
            mel, f0 = extract_features(
                carry, lengths, lo, hi, jax.random.fold_in(key, i)
            )
            # fold EVERY output element into the carry: feeding back
            # only mel[0,0,0] let XLA dead-code-eliminate the entire
            # f0 tracker (measured 1.34 vs 8.9 ms/batch — a 6.6x
            # phantom), which overstated this metric ~6x in rounds
            # 1-2. The clip keeps the -1e10 unvoiced sentinels from
            # swamping the fold.
            fold = mel.mean() + jnp.clip(f0, -1.0, 2.0).mean()
            return x0 + fold * 1e-12, fold
        _, outs = jax.lax.scan(body, x0, jnp.arange(n_meas))
        return outs[-1]

    o = run_n(wavs)
    _ = float(o)
    start = time.perf_counter()
    for _ in range(3):
        o = run_n(wavs)
    _ = float(o)
    per = (time.perf_counter() - start) / (3 * n_meas)
    frames = b * (n // 256 + 1)
    log(f"preprocess device-only: {per * 1e3:.2f} ms/batch")
    return frames / per


def bench_reference_preprocess_cpu(n_files: int = 8) -> float | None:
    """Host-side reference-style preprocessing: scipy filtfilt + numpy
    STFT/mel + the native C++ pitch tracker as the RAPT stand-in
    (pysptk is not installed; RAPT itself would be slower than our
    tracker, so this over-estimates the baseline)."""
    try:
        from scipy import signal as sp_signal

        from speechsplit_tpu.ops import pitch_native
        from speechsplit_tpu.ops.filters import butter_highpass
        from speechsplit_tpu.ops.stft import mel_filterbank

        if not pitch_native.available():
            return None
    except Exception as exc:
        log(f"reference preprocess baseline unavailable: {exc}")
        return None

    rng = np.random.RandomState(0)
    n = 4 * 16000
    b, a = butter_highpass(30, 16000)
    basis = mel_filterbank()
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(1024) / 1024)

    def one_pass():
        start = time.perf_counter()
        frames_done = 0
        for i in range(n_files):
            x = rng.randn(n).astype(np.float64) * 0.3
            y = sp_signal.filtfilt(b, a, x)
            wav = y * 0.96 + (rng.rand(n) - 0.5) * 1e-6
            xp = np.pad(wav, 512, mode="reflect")
            n_frames = (len(xp) - 768) // 256
            mags = np.empty((n_frames, 513))
            for m in range(n_frames):
                seg = xp[m * 256 : m * 256 + 1024] * win
                mags[m] = np.abs(np.fft.rfft(seg))
            mel = mags @ basis
            db = 20 * np.log10(np.maximum(1e-5, mel)) - 16
            _ = (db + 100) / 100
            _ = pitch_native.track_pitch_native(wav.astype(np.float32))
            frames_done += n_frames
        return frames_done, time.perf_counter() - start

    # two passes; report the baseline's BEST run (conservative for our
    # speedup ratio — host timing is noisy under background load)
    f1, t1 = one_pass()
    f2, t2 = one_pass()
    rate = max(f1 / t1, f2 / t2)
    log(f"reference-style preprocess: best of 2 -> {rate:.1f} frames/s")
    return rate


def bench_conversion(
    n_meas: int = 30, n_pairs: int = 8, compress: bool = False
) -> float:
    """utterances/s through the 7-condition batched converter, sustained
    via the pipelined ``convert_stream`` driver (each batch's host fetch
    overlaps the next batches' device compute; every yielded result is
    a fully materialized numpy grid, so the loop is fenced by
    construction)."""
    jax = setup_jax()
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.convert import (
        convert_batched,
        convert_stream,
        prepare_utterance,
    )
    from speechsplit_tpu.training.train_step import create_train_state

    config = SpeechSplitConfig()
    g_module, g_state = create_train_state(config, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        config, jax.random.PRNGKey(1), "f0_converter"
    )
    rng = np.random.RandomState(0)

    def utt(name, uid, length):
        mel = rng.rand(length, 80).astype(np.float32)
        f0 = rng.rand(length).astype(np.float32)
        emb = np.zeros(82, np.float32)
        emb[rng.randint(0, 82)] = 1.0
        return prepare_utterance(config, mel, f0, emb, name=name, uid=uid)

    pairs = [
        (utt(f"s{i}", "u", 150), utt(f"t{i}", "v", 150))
        for i in range(n_pairs)
    ]
    # warm (compile both the grid program and the trim/compress tail)
    _ = convert_batched(
        g_module, g_state.params, p_module, p_state.params, pairs,
        compress_fetch=compress,
    )
    start = time.perf_counter()
    n_out = 0
    for results in convert_stream(
        g_module, g_state.params, p_module, p_state.params,
        (pairs for _ in range(n_meas)), compress_fetch=compress,
    ):
        n_out += sum(len(r) for r in results)
    elapsed = time.perf_counter() - start
    utts = n_meas * n_pairs * 7
    assert n_out == utts
    log(
        f"conversion{' (bf16 fetch)' if compress else ''}: "
        f"{utts} conversions in {elapsed:.3f}s"
    )
    return utts / elapsed


def bench_conversion_device(n_meas: int = 30, n_pairs: int = 8) -> float:
    """Device-only conversion utterances/s (in-graph scan: F0 convert +
    all 7 generator conditions per pair, no host fetches)."""
    jax = setup_jax()
    import jax.numpy as jnp

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.training.train_step import create_train_state

    config = SpeechSplitConfig()
    g_module, g_state = create_train_state(config, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        config, jax.random.PRNGKey(1), "f0_converter"
    )
    rng = np.random.RandomState(0)
    p = n_pairs
    mel_src = jnp.asarray(rng.rand(p, 192, 80), jnp.float32)
    mel_trg = jnp.asarray(rng.rand(p, 192, 80), jnp.float32)
    f0_src = jnp.asarray(rng.rand(p, 192, 257), jnp.float32)
    f0_trg = jnp.asarray(rng.rand(p, 192, 257), jnp.float32)
    emb_s = jnp.asarray(rng.rand(p, 82), jnp.float32)
    emb_t = jnp.asarray(rng.rand(p, 82), jnp.float32)

    @jax.jit
    def run_n(x0):
        def body(carry, i):
            ms = carry
            logits = p_module.apply(
                {"params": p_state.params}, ms, f0_trg
            )
            f0c = jax.nn.one_hot(jnp.argmax(logits, -1), 257)
            xo = jnp.concatenate([ms, f0_src], -1)
            xc = jnp.concatenate([ms, f0c], -1)
            xs = jnp.concatenate([xo, xc, xo, xc, xo, xc, xc], 0)
            orgs = jnp.concatenate(
                [mel_trg, ms, ms, mel_trg, mel_trg, ms, mel_trg], 0
            )
            embs = jnp.concatenate(
                [emb_s, emb_s, emb_t, emb_s, emb_t, emb_t, emb_t], 0
            )
            out = g_module.apply({"params": g_state.params}, xs, orgs, embs)
            # fold every output element (not out[0,0,0]) so no part of
            # the 7-condition grid can be dead-code-eliminated — same
            # honesty fix as bench_preprocess_device (the Pallas
            # decoder kernels are opaque to XLA slicing, so the
            # phantom here was bounded, but the pattern was wrong).
            fold = out.mean()
            return x0 + fold * 1e-12, fold

        _, outs = jax.lax.scan(body, x0, jnp.arange(n_meas))
        return outs[-1]

    o = run_n(mel_src)
    _ = float(o)
    start = time.perf_counter()
    for _ in range(3):
        o = run_n(mel_src)
    _ = float(o)
    per = (time.perf_counter() - start) / (3 * n_meas)
    log(f"conversion device-only: {per * 1e3:.2f} ms per {p * 7} convs")
    return p * 7 / per


def run_all() -> dict:
    train = bench_train()
    train_best = bench_train(
        batch_size=40,
        dtypes={
            "compute_dtype": "bfloat16",
            "residual_dtype": "bfloat16",
            "grad_dtype": "bfloat16",
        },
    )
    results = {
        "train_steps_per_sec": train["steps_per_sec"],
        "train_mfu": train,
        "train_best_point_b40_bf16": train_best,
        "preprocess_mel_frames_per_sec": round(bench_preprocess(), 1),
        "preprocess_mel_frames_per_sec_with_fetch": round(
            bench_preprocess_with_fetch(), 1
        ),
        "preprocess_mel_frames_per_sec_device_only": round(
            bench_preprocess_device(), 1
        ),
        "conversion_utterances_per_sec": round(bench_conversion(), 2),
        "conversion_utterances_per_sec_compressed": round(
            bench_conversion(compress=True), 2
        ),
        "conversion_utterances_per_sec_device_only": round(
            bench_conversion_device(), 1
        ),
    }
    ref_pre = bench_reference_preprocess_cpu()
    if ref_pre:
        results["reference_preprocess_frames_per_sec_cpu"] = round(
            ref_pre, 1
        )
        results["preprocess_vs_reference"] = round(
            results["preprocess_mel_frames_per_sec"] / ref_pre, 2
        )
    return results


if __name__ == "__main__":
    print(json.dumps(run_all(), indent=2))

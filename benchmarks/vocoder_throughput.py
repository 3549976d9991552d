"""Batched vocoder synthesis throughput (device-only + end-to-end).

The per-utterance latency table in BENCHMARKS.md "Vocoder quality" is
tunnel-floor-bound (~33-40 ms RTT + waveform fetch per call) since the
scatter-free overlap-add made GL/refinement iterations ~60 us — so the
device's real margin only shows when many utterances share a dispatch
(the serving shape: `synthesize_batch`, cli/serve.py). This benchmark
measures that margin:

- device-only: a jitted ``lax.scan`` of n_meas batched syntheses with
  every output element folded into the carry (no DCE; see
  benchmarks/suite.py docstring for why block_until_ready timing lies
  on this tunneled platform) and one scalar fence.
- end-to-end: repeated ``synthesize_batch`` calls including mel upload
  and waveform fetch.

Usage: python -m benchmarks.vocoder_throughput [--batch 32]
       [--frames 128] [--gl_iters 100] [--refine_iters 24]
       [--ckpt default]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=128,
                    help="mel frames per utterance (~2 s at hop 256)")
    ap.add_argument("--gl_iters", type=int, default=100)
    ap.add_argument("--refine_iters", type=int, default=24)
    ap.add_argument("--ckpt", default="default",
                    help="neural vocoder weights ('default' = shipped "
                    "asset; empty = skip the neural measurements)")
    ap.add_argument("--n_meas", type=int, default=30)
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from speechsplit_tpu.vocoder import GriffinLimVocoder, mel_griffin_lim

    b, t = args.batch, args.frames
    rng = np.random.RandomState(0)
    base = rng.rand(b, t, 80).astype(np.float32)
    mel = np.clip(
        0.35 + 0.25 * (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)) / 3,
        0, 1,
    ).astype(np.float32)
    secs_per_utt = (t - 1) * 256 / 16000.0
    result = {"batch": b, "frames": t}

    def fenced(run_n, x0):
        """warm, then time 3 chained calls, fenced by a scalar fetch."""
        o = run_n(x0)
        _ = float(o)
        start = time.perf_counter()
        for _ in range(3):
            o = run_n(o.reshape(()) + x0)  # value-dependent chain
        _ = float(o)
        return (time.perf_counter() - start) / (3 * args.n_meas)

    # --- Griffin-Lim, device-only --------------------------------------
    gl = GriffinLimVocoder(n_iter=args.gl_iters)
    db = jnp.asarray(mel) * 100.0 - 100.0 + gl.ref_level_db
    amp0 = jnp.power(10.0, db / 20.0)

    @jax.jit
    def gl_n(x0):
        def body(carry, i):
            wavs = mel_griffin_lim(
                amp0 * (1.0 + carry * 1e-12), gl.basis, gl.inv_basis,
                gl.key, gl.n_fft, gl.hop, args.gl_iters,
            )
            fold = wavs.mean()
            return carry + fold * 1e-12, fold

        _, outs = jax.lax.scan(body, x0, jnp.arange(args.n_meas))
        return outs[-1]

    per = fenced(gl_n, jnp.float32(0.0))
    result[f"gl{args.gl_iters}_device_utt_per_s"] = round(b / per, 1)
    result[f"gl{args.gl_iters}_device_rtf"] = round(
        b * secs_per_utt / per, 1
    )  # seconds of audio per wall second
    log(f"GL-{args.gl_iters} device-only: {per * 1e3:.2f} ms per "
        f"{b}-utt batch = {b / per:.0f} utt/s")

    # --- Griffin-Lim, end-to-end (float fetch vs device-pcm16) ----------
    # INTERLEAVED A/B: tunnel bandwidth drifts on ~minutes timescales,
    # so sequential phases can invert a real ~1.5x fetch difference.
    mels = [mel[i] for i in range(b)]
    reps = 5

    def e2e_ab(synth):
        times = {False: [], True: []}
        for pcm16 in (False, True):
            synth(mels, pcm16=pcm16)  # warm both programs first
        for _ in range(reps):
            for pcm16 in (False, True):
                start = time.perf_counter()
                synth(mels, pcm16=pcm16)
                times[pcm16].append(time.perf_counter() - start)
        return {k: float(np.median(v)) for k, v in times.items()}

    for pcm16, e2e in e2e_ab(gl.synthesize_batch).items():
        tag = "_pcm16" if pcm16 else ""
        result[f"gl{args.gl_iters}_e2e{tag}_utt_per_s"] = round(b / e2e, 1)
        log(f"GL-{args.gl_iters} end-to-end{tag}: {e2e * 1e3:.1f} ms "
            f"per batch = {b / e2e:.0f} utt/s")

    # --- Neural head (+refine), device-only + end-to-end ----------------
    if args.ckpt:
        from speechsplit_tpu.vocoder_neural import load_vocoder

        voc = load_vocoder(args.ckpt, refine_iters=args.refine_iters)
        melj = jnp.asarray(mel)

        @jax.jit
        def nv_n(x0):
            def body(carry, i):
                wavs = voc._apply(
                    voc.params, melj * (1.0 + carry * 1e-12)
                )
                fold = wavs.mean()
                return carry + fold * 1e-12, fold

            _, outs = jax.lax.scan(body, x0, jnp.arange(args.n_meas))
            return outs[-1]

        per = fenced(nv_n, jnp.float32(0.0))
        key = f"neural_refine{args.refine_iters}"
        result[f"{key}_device_utt_per_s"] = round(b / per, 1)
        result[f"{key}_device_rtf"] = round(b * secs_per_utt / per, 1)
        log(f"{key} device-only: {per * 1e3:.2f} ms per batch "
            f"= {b / per:.0f} utt/s")

        for pcm16, e2e in e2e_ab(voc.synthesize_batch).items():
            tag = "_pcm16" if pcm16 else ""
            result[f"{key}_e2e{tag}_utt_per_s"] = round(b / e2e, 1)
            log(f"{key} end-to-end{tag}: {e2e * 1e3:.1f} ms per batch "
                f"= {b / e2e:.0f} utt/s")

    print(json.dumps(result))


if __name__ == "__main__":
    main()

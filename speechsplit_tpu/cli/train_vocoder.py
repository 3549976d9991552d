"""Train the neural (iSTFT-head) vocoder on a directory of wavs.

The reference has no counterpart: it points users at an external
pretrained WaveNet (README.md:40-44). Here the vocoder trains from the
same wav corpus the voice-conversion models use, with mels computed by
this repo's own front-end so train and inference see identical
normalization.

    python -m speechsplit_tpu.cli.train_vocoder --wav_dir assets/wavs \
        --save_dir run/vocoder --num_iters 50000
"""

from __future__ import annotations

import argparse
import os
import time


def _load_corpus(wav_dir: str, limit: int | None = None):
    from speechsplit_tpu.data.prepare import list_wavs, read_wav

    paths = list_wavs(wav_dir)  # shared enumeration (split safety)
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no .wav files under {wav_dir}")
    return [read_wav(p) for p in paths]


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--save_dir", default="run/vocoder")
    ap.add_argument("--num_iters", type=int, default=50_000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--crop_frames", type=int, default=64)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--learning_rate", type=float, default=2e-4)
    ap.add_argument(
        "--cosine_decay", action=argparse.BooleanOptionalAction,
        default=True,
        help="warmup + cosine lr decay over --num_iters (default on)",
    )
    ap.add_argument("--log_step", type=int, default=100)
    ap.add_argument("--save_step", type=int, default=5000)
    ap.add_argument(
        "--steps_per_dispatch", type=int, default=25,
        help="optimizer steps scanned per device dispatch (the corpus "
        "is device-resident; the host sends only a PRNG key)",
    )
    ap.add_argument("--max_files", type=int, default=0,
                    help="cap corpus size (0 = all)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.preprocess import extract_features
    from speechsplit_tpu.vocoder_neural import (
        VocoderTrainer,
        save_vocoder,
    )

    config = SpeechSplitConfig()
    wavs = _load_corpus(args.wav_dir, args.max_files or None)
    print(f"corpus: {len(wavs)} wavs")

    # front-end mels. Wavs are zero-padded up to half-second length
    # buckets before extraction: extract_features compiles per input
    # shape, so feeding native lengths costs one full compile per
    # distinct wav length (measured ~20 s each through this
    # environment's compile service — a 100-utterance corpus of random
    # lengths spent >30 min compiling). Buckets cap that at a handful
    # of programs; the mel is sliced back to the true frame count.
    bucket = config.sample_rate // 2
    mels = []
    for w in wavs:
        n_pad = ((len(w) + bucket - 1) // bucket) * bucket
        w_pad = np.zeros(n_pad, np.float32)
        w_pad[: len(w)] = w
        mel, _f0 = extract_features(
            jnp.asarray(w_pad)[None, :],
            jnp.asarray([len(w)]),
            jnp.asarray([50.0], jnp.float32),
            jnp.asarray([600.0], jnp.float32),
            jax.random.PRNGKey(0),
        )
        mels.append(np.asarray(mel)[0, : len(w) // config.hop_length + 1])
    print("front-end mels computed", flush=True)

    trainer = VocoderTrainer(
        n_fft=config.fft_length,
        hop=config.hop_length,
        channels=args.channels,
        depth=args.depth,
        learning_rate=args.learning_rate,
        sample_rate=config.sample_rate,
        n_mels=config.dim_freq,
        fmin=config.mel_fmin,
        fmax=config.mel_fmax,
        total_steps=args.num_iters if args.cosine_decay else 0,
    )
    state = trainer.init(jax.random.PRNGKey(args.seed), args.crop_frames)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(state.params)
    )
    print(f"V: {n_params} parameters")

    # pin the whole corpus in HBM once; crops are drawn in-graph
    # (the host-side make_crops path is bandwidth-bound on slow
    # host<->device links — measured 5-10 steps/s vs hundreds resident)
    t_max = max(len(m) for m in mels)
    n_max = max(len(w) for w in wavs)
    mel_arr = np.zeros((len(mels), t_max, mels[0].shape[1]), np.float32)
    wav_arr = np.zeros((len(wavs), n_max), np.float32)
    frames = np.zeros((len(mels),), np.int32)
    for i, (m, w) in enumerate(zip(mels, wavs)):
        mel_arr[i, : len(m)] = m
        wav_arr[i, : len(w)] = w
        frames[i] = len(m)
    k = max(1, args.steps_per_dispatch)
    dispatch = trainer.make_resident_step(
        jnp.asarray(wav_arr), jnp.asarray(mel_arr), jnp.asarray(frames),
        args.crop_frames, args.batch_size, k,
    )
    print(
        f"corpus resident: {wav_arr.nbytes / 1e6:.0f} MB wav + "
        f"{mel_arr.nbytes / 1e6:.0f} MB mel in HBM, {k} steps/dispatch",
        flush=True,
    )

    key = jax.random.PRNGKey(args.seed + 1)
    os.makedirs(args.save_dir, exist_ok=True)
    start = time.time()
    done = 0
    while done < args.num_iters:
        state, loss = dispatch(state, jax.random.fold_in(key, done))
        done += k
        if done % max(args.log_step, k) < k:
            loss_val = float(loss)
            if not np.isfinite(loss_val):
                raise FloatingPointError(f"loss {loss_val} at {done}")
            rate = done / (time.time() - start)
            print(
                f"iter {done}/{args.num_iters} loss {loss_val:.4f} "
                f"({rate:.1f} steps/s)",
                flush=True,
            )
        if done % args.save_step < k or done >= args.num_iters:
            path = save_vocoder(
                os.path.join(args.save_dir, f"{done}-V"), state.params
            )
            print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()

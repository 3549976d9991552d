"""Vocoder quality/speed benchmark: neural iSTFT head vs Griffin-Lim.

Measures mel-resynthesis error (offset-free L1 on the normalized-dB mel
scale, 0.01 == 1 dB — the same metric as
tests/test_vocoder.py::test_griffin_lim_mel_fidelity) and warm
synthesis latency per utterance, on a held-out slice of a wav corpus.

Usage:
  # generate a synthetic continuous-F0 corpus, train, then:
  python -m benchmarks.vocoder_quality --wav_dir CORPUS/wavs \
      --ckpt RUN/12000-V --held_out_from 100

``--held_out_from N`` marks files N.. (in sorted os.walk order — the
same order cli.train_vocoder consumes with --max_files N) as held out,
so train/eval splits match without a split file.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--held_out_from", type=int, required=True)
    ap.add_argument("--gl_iters", type=int, default=50)
    ap.add_argument("--refine_iters", type=int, default=2,
                    help="mel-consistency projections for the "
                    "neural_refined variant")
    ap.add_argument("--refine_momentum", type=float, default=0.9)
    ap.add_argument("--limit", type=int, default=12,
                    help="max held-out utterances to evaluate")
    ap.add_argument("--only", default="",
                    help="comma-separated subset of vocoders to run "
                    "(griffin_lim,neural,neural_refined)")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from speechsplit_tpu.data.prepare import read_wav
    from speechsplit_tpu.ops.stft import mel_spectrogram
    from speechsplit_tpu.vocoder import GriffinLimVocoder
    from speechsplit_tpu.vocoder_neural import load_vocoder

    from speechsplit_tpu.data.prepare import list_wavs

    # the SAME enumeration cli.train_vocoder consumes (shared helper),
    # so --held_out_from N splits exactly where --max_files N stopped
    paths = list_wavs(args.wav_dir)
    held = paths[args.held_out_from :][: args.limit]
    if not held:
        raise SystemExit("no held-out files — check --held_out_from")
    log(f"{len(paths)} wavs, evaluating {len(held)} held out")

    def mel_of(wav):
        return np.asarray(mel_spectrogram(jnp.asarray(wav[None])))[0]

    def err_db(mel_in, wav_out):
        mel_back = mel_of(np.asarray(wav_out))
        n = min(len(mel_in), len(mel_back)) - 4
        a, b = mel_in[2:n], mel_back[2:n]
        offset = (a - b).mean()
        return float(np.abs(a - b - offset).mean()) * 100

    vocoders = {
        "griffin_lim": lambda: GriffinLimVocoder(n_iter=args.gl_iters),
        "neural": lambda: load_vocoder(args.ckpt),
        "neural_refined": lambda: load_vocoder(
            args.ckpt, refine_iters=args.refine_iters,
            refine_momentum=args.refine_momentum,
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        vocoders = {k: v for k, v in vocoders.items() if k in keep}
    vocoders = {k: v() for k, v in vocoders.items()}
    result = {}
    for name, voc in vocoders.items():
        mels = [mel_of(read_wav(p)) for p in held]
        for m in mels:  # warm all shapes (compile)
            voc(m)
        errs, times = [], []
        for m in mels:
            t0 = time.perf_counter()
            out = voc(m)
            _ = float(np.abs(np.asarray(out)).max())
            times.append(time.perf_counter() - t0)
            errs.append(err_db(m, out))
        result[f"{name}_mel_err_db"] = round(float(np.mean(errs)), 3)
        result[f"{name}_ms_per_utt"] = round(
            float(np.mean(times)) * 1e3, 1
        )
        log(f"{name}: {result[f'{name}_mel_err_db']} dB, "
            f"{result[f'{name}_ms_per_utt']} ms/utt")

    import json

    print(json.dumps(result))


if __name__ == "__main__":
    main()

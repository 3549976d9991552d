"""Neural-vocoder evaluation OFF the training distribution (VERDICT r3).

The shipped iSTFT head was trained AND previously evaluated on the
repo's own synthetic formant corpus — in-distribution for the generator
that made the training data. This benchmark scores it on:

1. **real speech**: the only real mels in this environment are the
   reference demo.pkl's VCTK-derived features
   (/root/reference/assets/demo.pkl, features only — no raw audio
   ships). Audio is GL-resynthesized from those mels (the
   feature_domain.py trick) and the standard vocoder_quality harness
   runs on it. The GL round trip caps achievable fidelity, so the GL
   row doubles as the floor.
2. **out-of-distribution synthetic**: a corpus from a different seed,
   speaker count, and unique-formant draw than the vocoder ever saw
   (training corpus: seed 0, 8 speakers, prototype formants).

Usage:
  python -m benchmarks.vocoder_realspeech \
      --ckpt assets/vocoder_istft_100k.npz --out /tmp/voc_real.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


DEMO_PKL = "/root/reference/assets/demo.pkl"


def build_real_speech_tree(out_dir: str) -> int:
    """GL-resynthesize the demo.pkl mels into a wav tree."""
    import pickle

    import numpy as np
    from scipy.io import wavfile

    from speechsplit_tpu.vocoder import GriffinLimVocoder

    with open(DEMO_PKL, "rb") as fh:
        demo = pickle.load(fh)
    vocoder = GriffinLimVocoder(n_iter=100)
    mels = [np.asarray(e[2][0], np.float32) for e in demo]
    wavs = vocoder.synthesize_batch(mels)
    n = 0
    for entry, wav in zip(demo, wavs):
        spk = entry[0]
        uid = entry[2][3] if len(entry[2]) > 3 else f"u{n}"
        d = os.path.join(out_dir, spk)
        os.makedirs(d, exist_ok=True)
        wavfile.write(
            os.path.join(d, f"{uid}.wav"), 16000,
            (np.clip(wav, -1, 1) * 32767).astype(np.int16),
        )
        n += 1
    return n


def build_ood_tree(out_dir: str) -> int:
    """A synthetic corpus the vocoder never saw: new seed, 6 speakers,
    unique per-speaker formant draws, longer utterances."""
    from speechsplit_tpu.data.synthetic import make_corpus

    paths = make_corpus(
        out_dir, 24, n_speakers=6, seed=12345, duration_s=2.8,
        distinct_formants=True,
    )
    return len(paths)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="assets/vocoder_istft_100k.npz")
    ap.add_argument("--work_dir", default="/tmp/voc_real")
    ap.add_argument("--refine_iters", type=int, default=24)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from benchmarks import vocoder_quality

    report = {}
    for name, builder in (
        ("real_speech_demo", build_real_speech_tree),
        ("ood_synthetic", build_ood_tree),
    ):
        tree = os.path.join(args.work_dir, name)
        if not os.path.isdir(tree):
            n = builder(tree)
            log(f"{name}: built {n} wavs under {tree}")
        # capture vocoder_quality's JSON line
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            vocoder_quality.main([
                "--wav_dir", tree,
                "--ckpt", args.ckpt,
                "--held_out_from", "0",
                "--limit", "24",
                "--refine_iters", str(args.refine_iters),
            ])
        report[name] = json.loads(buf.getvalue().strip().splitlines()[-1])
        log(f"{name}: {json.dumps(report[name])}")

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()

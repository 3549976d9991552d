"""Generate a synthetic multi-speaker wav corpus.

The reference bundles a mini VCTK subset "for code verification purpose
only" (reference README.md:49-50) which is not present in this
environment; this tool synthesizes arbitrarily large speech-like
corpora (formant synthesis, speechsplit_tpu.data.synthetic) for:

  - vocoder training:      python -m benchmarks.make_corpus --out_dir
                           /tmp/voc_corpus/wavs --num 400
  - scale rehearsals:      python -m benchmarks.make_corpus --out_dir
                           /tmp/scale_corpus/wavs --num 10000 \
                           --duration 1.6

Deterministic for a given --seed; wav trees are laid out per speaker
(p300..p3xx) exactly like the reference's assets/wavs tree.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--num", type=int, default=400)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--duration", type=float, default=2.2,
                    help="approximate seconds per utterance")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--distinct_formants", action="store_true",
        help="unique formant set per speaker + _speakers.json ground "
        "truth (the disentanglement-evaluation corpus mode, QUALITY.md)",
    )
    args = ap.parse_args(argv)

    from speechsplit_tpu.data.synthetic import make_corpus

    paths = make_corpus(
        args.out_dir,
        args.num,
        n_speakers=args.speakers,
        seed=args.seed,
        duration_s=args.duration,
        progress_every=max(50, args.num // 20),
        distinct_formants=args.distinct_formants,
    )
    print(f"wrote {len(paths)} wavs under {args.out_dir}")


if __name__ == "__main__":
    main()

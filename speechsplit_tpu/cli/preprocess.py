"""Batch preprocessing CLI (replaces reference make_spect_f0.py).

Walks ``--wav_dir/<speaker>/*.wav``, extracts mel + normalized F0 on
device in batches, writes parallel .npy trees. Speaker genders come from
a ``spk2gen.pkl`` mapping (same format the reference expects,
make_spect_f0.py:19) or default to ``--default_gender``.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--wav_dir", default="assets/wavs")
    parser.add_argument("--mel_dir", default="assets/spmel")
    parser.add_argument("--f0_dir", default="assets/raptf0")
    parser.add_argument("--spk2gen", default="assets/spk2gen.pkl")
    parser.add_argument("--default_gender", default="M", choices="MF")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--batches_per_dispatch", type=int, default=8,
        help="wav batches staged into one device program (amortizes "
        "the fixed per-dispatch host cost; BENCHMARKS.md)",
    )
    parser.add_argument(
        "--compress_fetch", action="store_true",
        help="fetch features from the device as bfloat16 (halves the "
        "device->host transfer on slow links; .npy files stay float32, "
        "~1e-3 rounding on the [0,1] mel scale)",
    )
    args = parser.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from speechsplit_tpu.data.prepare import extract_dir

    if os.path.exists(args.spk2gen):
        with open(args.spk2gen, "rb") as handle:
            spk2gen = pickle.load(handle)
    else:
        print(f"no {args.spk2gen}; defaulting gender {args.default_gender}")
        spk2gen = {}
    speakers = sorted(
        d for d in os.listdir(args.wav_dir)
        if os.path.isdir(os.path.join(args.wav_dir, d))
    )
    for s in speakers:
        spk2gen.setdefault(s, args.default_gender)

    start = time.time()
    done = extract_dir(
        args.wav_dir,
        args.mel_dir,
        args.f0_dir,
        spk2gen,
        batch_size=args.batch_size,
        seed=args.seed,
        batches_per_dispatch=args.batches_per_dispatch,
        compress_fetch=args.compress_fetch,
    )
    print(
        f"processed {len(done)} speakers in {time.time() - start:.1f}s"
    )


if __name__ == "__main__":
    main()

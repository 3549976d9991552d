"""Example: end-to-end voice conversion between two wav files.

Swaps any subset of {Rhythm, F0, timbre (U)} from a target speaker into
a source utterance and writes synthesized wavs. Checkpoints may be this
framework's Orbax directories or reference ``.ckpt`` files.

    python examples/convert_wav_to_wav.py \
        --generator run/models/660000-G --f0_converter run/models/640000-P \
        --src p226_003.wav --trg p231_008.wav --out results/
"""

import argparse
import os

import numpy as np
from scipy.io import wavfile

from speechsplit_tpu.pipeline import VoiceConverter


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--generator", required=True)
    parser.add_argument("--f0_converter", required=True)
    parser.add_argument("--src", required=True)
    parser.add_argument("--trg", required=True)
    parser.add_argument("--src_gender", default="M", choices="MF")
    parser.add_argument("--trg_gender", default="F", choices="MF")
    parser.add_argument("--conditions", default="R,F,U,RF,RU,FU,RFU")
    parser.add_argument("--out", default="results")
    args = parser.parse_args()

    vc = VoiceConverter.from_checkpoints(args.generator, args.f0_converter)
    results = vc.convert_wav_files(
        args.src,
        args.trg,
        src_gender=args.src_gender,
        trg_gender=args.trg_gender,
        conditions=args.conditions.split(","),
    )

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.src))[0]
    for condition, entry in results.items():
        path = os.path.join(args.out, f"{stem}_{condition}.wav")
        wavfile.write(
            path,
            vc.config.sample_rate,
            (entry["wav"] * 32767).astype(np.int16),
        )
        print(f"wrote {path} ({entry['mel'].shape[0]} frames)")


if __name__ == "__main__":
    main()

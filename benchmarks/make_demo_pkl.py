"""Build a demo.pkl-style bundle from preprocessed feature trees.

The reference ships ``assets/demo.pkl`` (entries
``[spk_name, spk_emb(1,82) or (82,), (mel, f0, len, uid)]``) as both
the conversion demo input (demo.ipynb cell-0) and the solver's
validation set (solver.py:32-38). This tool produces the same bundle
from any mel/f0 tree this framework's preprocessing wrote — e.g. the
held-out split of a synthetic quality corpus (QUALITY.md).

Speaker one-hot ids follow the TRAINING tree's sorted order (pass
--train_mel_dir) so validation embeddings match what the model saw.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mel_dir", required=True)
    ap.add_argument("--f0_dir", required=True)
    ap.add_argument("--train_mel_dir", default="",
                    help="tree defining the speaker one-hot id order "
                    "(defaults to --mel_dir)")
    ap.add_argument("--per_speaker", type=int, default=1)
    ap.add_argument("--dim_spk_emb", type=int, default=82)
    ap.add_argument("--max_len", type=int, default=192)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from speechsplit_tpu.data.prepare import speaker_embedding

    id_tree = args.train_mel_dir or args.mel_dir
    id_speakers = sorted(
        d for d in os.listdir(id_tree)
        if os.path.isdir(os.path.join(id_tree, d))
    )
    ids = {s: i for i, s in enumerate(id_speakers)}

    bundle = []
    for spk in sorted(os.listdir(args.mel_dir)):
        d = os.path.join(args.mel_dir, spk)
        if not os.path.isdir(d) or spk not in ids:
            continue
        files = sorted(f for f in os.listdir(d) if f.endswith(".npy"))
        for f in files[: args.per_speaker]:
            mel = np.load(os.path.join(d, f)).astype(np.float32)
            f0 = np.load(os.path.join(args.f0_dir, spk, f))
            n = min(len(mel), args.max_len)
            # (1, 82) like the reference bundle (solver + demo consume it)
            emb = speaker_embedding(spk, ids[spk], args.dim_spk_emb)[None]
            bundle.append(
                [spk, emb, (mel[:n], f0[:n].astype(np.float64), n, f[:-4])]
            )
    with open(args.out, "wb") as fh:
        pickle.dump(bundle, fh)
    print(f"wrote {len(bundle)} utterances ({len(set(b[0] for b in bundle))}"
          f" speakers) to {args.out}")


if __name__ == "__main__":
    main()

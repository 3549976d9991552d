"""Metadata CLI (replaces reference make_metadata.py): walk the mel tree
and write ``train.pkl``."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mel_dir", default="assets/spmel")
    parser.add_argument("--dim_spk_emb", type=int, default=82)
    parser.add_argument(
        "--reference_compat",
        action="store_true",
        help="reproduce the reference's hard-coded p226/other one-hot "
        "slots (make_metadata.py:20-24)",
    )
    args = parser.parse_args(argv)

    from speechsplit_tpu.data.prepare import build_metadata

    meta = build_metadata(
        args.mel_dir,
        dim_spk_emb=args.dim_spk_emb,
        reference_compat=args.reference_compat,
    )
    total = sum(len(m) - 2 for m in meta)
    print(f"wrote metadata: {len(meta)} speakers, {total} utterances")


if __name__ == "__main__":
    main()

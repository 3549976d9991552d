"""Export an Orbax checkpoint to a reference-format torch ``.ckpt``.

Completes the interop loop: the framework imports the reference's
pretrained checkpoints (interop.load_reference_checkpoint), and this
CLI lets TPU-trained weights flow the other way — the produced file is
byte-layout compatible with what the reference training loop saves
(reference solver.py:198-202, ``{'model': state_dict}``) so the
reference ``Solver.restore_model`` (solver.py:84-90) and demo notebook
load it unchanged.

Usage:
  python -m speechsplit_tpu.cli.export_ckpt \
    --ckpt /root/qual/run/models/1000000-G \
    --out /root/qual/1000000-G.ckpt
  python -m speechsplit_tpu.cli.export_ckpt \
    --ckpt /root/qual/run/models/200000-P --model f0_converter \
    --out /root/qual/200000-P.ckpt

Learned-mode (zero-shot) checkpoints are rejected with a clear error:
the reference hard-codes one-hot speaker embeddings
(make_metadata.py:19-25), so a speaker-encoder subtree has no
reference-format home.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True,
                        help="Orbax checkpoint dir ({step}-{tag})")
    parser.add_argument("--model", default="speechsplit",
                        choices=["speechsplit", "f0_converter"])
    parser.add_argument("--out", required=True,
                        help="output .ckpt path (torch format)")
    parser.add_argument("--hparams", default="")
    args = parser.parse_args(argv)

    from speechsplit_tpu.cli.convert import _load_params
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.interop import save_reference_checkpoint

    config = SpeechSplitConfig()
    if args.hparams:
        config = config.parse(args.hparams)
    params = _load_params(args.ckpt, args.model, config)
    save_reference_checkpoint(params, args.out, model=args.model)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

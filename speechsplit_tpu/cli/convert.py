"""Conversion CLI (replaces demo.ipynb cells 0-1).

Loads generator + F0-converter weights (either this framework's Orbax
checkpoints or reference ``.ckpt`` files via the interop importer), runs
the 7 conversion conditions between two utterances of a demo.pkl-style
bundle, writes mel ``.npy`` files and — with ``--synthesize`` — wavs via
the built-in Griffin-Lim vocoder.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_params(path: str, model: str, config):
    from speechsplit_tpu.interop import load_reference_checkpoint

    if path.endswith(".ckpt"):
        return load_reference_checkpoint(path, model)
    import jax

    from speechsplit_tpu.training import checkpoint as ckpt_lib
    from speechsplit_tpu.training.train_step import create_train_state

    # orbax directory: {step}-{tag}
    base = os.path.basename(path.rstrip("/"))
    step = int(base.split("-")[0])
    tag = base.split("-")[1]
    _, abstract = create_train_state(config, jax.random.PRNGKey(0), model)
    state = ckpt_lib.restore_checkpoint(
        os.path.dirname(path), step, abstract, tag
    )
    return state.params


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--generator_ckpt", required=True)
    parser.add_argument("--f0_ckpt", required=True)
    parser.add_argument("--metadata", default="assets/demo.pkl")
    parser.add_argument("--source_index", type=int, default=0)
    parser.add_argument("--target_index", type=int, default=1)
    parser.add_argument("--out_dir", default="results")
    parser.add_argument(
        "--conditions", default="R,F,U,RF,RU,FU,RFU",
        help="comma-separated subset of the 7 conditions",
    )
    parser.add_argument("--synthesize", action="store_true")
    parser.add_argument(
        "--vocoder_ckpt", default="",
        help="neural vocoder checkpoint: a cli.train_vocoder output "
        "dir, a packed .npz, or the literal 'default' for the "
        "pretrained asset shipped in the repo "
        "(assets/vocoder_istft_100k.npz); empty = synthesize with the "
        "built-in Griffin-Lim",
    )
    parser.add_argument(
        "--vocoder_refine", type=int, default=48,
        help="mel-consistency projection iterations on the neural "
        "vocoder's predicted spectrum (0 = raw one-shot head; since "
        "the scatter-free overlap-add, iterations are ~60 us each so "
        "the default buys GL-100-grade mel fidelity for <1 ms — "
        "BENCHMARKS.md 'Vocoder quality')",
    )
    parser.add_argument("--hparams", default="", help="k=v,k=v overrides")
    parser.add_argument(
        "--compress_results", action="store_true",
        help="fetch result mels from the device as bfloat16 (halves "
        "the transfer on slow links; ~0.2 dB rounding, far below the "
        "vocoder's own error)",
    )
    args = parser.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.convert import (
        convert_batched,
        load_demo_metadata,
        utterance_from_metadata,
        with_learned_embedding,
    )
    from speechsplit_tpu.models import F0Converter, SpeechSplit

    config = SpeechSplitConfig().parse(args.hparams)
    g_params = _load_params(args.generator_ckpt, "speechsplit", config)
    p_params = _load_params(args.f0_ckpt, "f0_converter", config)

    metadata = load_demo_metadata(args.metadata)
    src = utterance_from_metadata(config, metadata[args.source_index])
    trg = utterance_from_metadata(config, metadata[args.target_index])

    from speechsplit_tpu.config import resolve_dtype

    dtype = resolve_dtype(config.compute_dtype)
    # learned-mode checkpoints: zero-shot timbre targets from the
    # utterances' own mels (no-op for one-hot configs)
    g_embed = SpeechSplit(config, dtype=dtype)
    src = with_learned_embedding(config, g_embed, g_params, src)
    trg = with_learned_embedding(config, g_embed, g_params, trg)
    # all conditions in one batched device call
    results = convert_batched(
        SpeechSplit(config, dtype=dtype), g_params,
        F0Converter(config, dtype=dtype), p_params,
        [(src, trg)],
        conditions=args.conditions.split(","),
        compress_fetch=args.compress_results,
    )[0]

    os.makedirs(args.out_dir, exist_ok=True)
    wavs = None
    if args.synthesize:
        if args.vocoder_ckpt:
            from speechsplit_tpu.vocoder_neural import load_vocoder

            vocoder = load_vocoder(
                args.vocoder_ckpt, refine_iters=args.vocoder_refine
            )
        else:
            from speechsplit_tpu.vocoder import GriffinLimVocoder

            vocoder = GriffinLimVocoder()
        # pcm16: peak-norm + int16 quantization happen on device — 4x
        # fewer fetch bytes for output we write as PCM16 anyway
        wavs = vocoder.synthesize_batch(
            [mel for _, mel in results], pcm16=True
        )
    for i, (name, mel) in enumerate(results):
        np.save(os.path.join(args.out_dir, name + ".npy"), mel)
        print(f"{name}: mel {mel.shape}")
        if wavs is not None:
            from scipy.io import wavfile

            wavfile.write(
                os.path.join(args.out_dir, name + ".wav"),
                vocoder.sample_rate,
                wavs[i],
            )


if __name__ == "__main__":
    main()

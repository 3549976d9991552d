"""Training CLI (replaces reference main.py).

Same flag surface as the reference argparse (main.py:41-59) plus:
``--model`` selects the generator or the F0 converter (the reference has
no F0-converter training entry point at all), ``--hparams`` takes
"k=v,k=v" config overrides (the HParams.parse shim), and ``--num_devices``
spans a data mesh.
"""

from __future__ import annotations

import argparse
import os


def str2bool(v: str) -> bool:
    return v.lower() in ("true", "1", "yes")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num_iters", type=int, default=1_000_000)
    parser.add_argument("--g_lr", type=float, default=1e-4)
    parser.add_argument("--beta1", type=float, default=0.9)
    parser.add_argument("--beta2", type=float, default=0.999)
    parser.add_argument("--resume_iters", type=int, default=None)
    parser.add_argument("--use_tensorboard", type=str2bool, default=False)
    parser.add_argument("--log_dir", default="run/logs")
    parser.add_argument("--model_save_dir", default="run/models")
    parser.add_argument("--sample_dir", default="run/samples")
    parser.add_argument("--log_step", type=int, default=10)
    parser.add_argument("--sample_step", type=int, default=1000)
    parser.add_argument("--model_save_step", type=int, default=1000)
    parser.add_argument("--validation_path", default="assets/demo.pkl")
    parser.add_argument(
        "--model", default="speechsplit",
        choices=["speechsplit", "f0_converter"],
    )
    parser.add_argument("--hparams", default="", help="k=v,k=v overrides")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--compress_transfers", action="store_true",
        help="send features host->device as bfloat16 (halves feed bytes "
        "when the host link limits sustained throughput)",
    )
    parser.add_argument(
        "--keep_checkpoints", type=int, default=0,
        help="retain only the newest N checkpoints (0 = keep all, "
        "matching the reference)",
    )
    parser.add_argument(
        "--profile_dir", default="",
        help="write a jax.profiler trace of a few steps to this dir",
    )
    parser.add_argument(
        "--lazy_data", action="store_true",
        help="memory-map features instead of caching in RAM "
        "(for VCTK-scale datasets)",
    )
    parser.add_argument(
        "--num_devices", type=int, default=0,
        help="devices in the data mesh (0 = all available)",
    )
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="stage N batches per transfer and run them as one XLA "
        "dispatch (lax.scan over train steps); must divide the log/save/"
        "sample cadences. Identical training trajectory, amortizes the "
        "fixed per-dispatch host cost",
    )
    parser.add_argument(
        "--data_on_device", action="store_true",
        help="upload ALL features to HBM once and collate on device; "
        "the host sends only crop indices per step. Bit-identical "
        "batches to the host loader; removes the per-step feature "
        "transfer entirely (use when the corpus fits in HBM)",
    )
    parser.add_argument(
        "--resident_dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="storage dtype for --data_on_device features (bfloat16 "
        "halves HBM at ~4e-3 feature quantization)",
    )
    parser.add_argument(
        "--wav_dir", default="",
        help="train STRAIGHT from a wav tree: preprocess on device "
        "into the HBM feature store (features never cross the host "
        "link — no .npy trees, no root_dir/feat_dir needed). Requires "
        "--data_on_device. Speaker genders from --spk2gen when present",
    )
    parser.add_argument(
        "--spk2gen", default="assets/spk2gen.pkl",
        help="speaker->gender pickle for --wav_dir (else all 'M')",
    )
    args = parser.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.dataset import SpeakerDataset
    from speechsplit_tpu.data.loader import data_loader
    from speechsplit_tpu.parallel import make_mesh
    from speechsplit_tpu.training.solver import Solver, SolverConfig

    config = SpeechSplitConfig(
        learning_rate=args.g_lr, adam_b1=args.beta1, adam_b2=args.beta2
    ).parse(args.hparams)
    print(config.debug_string())

    for d in (args.log_dir, args.model_save_dir, args.sample_dir):
        os.makedirs(d, exist_ok=True)

    dataset = loader = resident = None
    if args.wav_dir:
        if not args.data_on_device:
            raise SystemExit("--wav_dir requires --data_on_device")
        import pickle

        from speechsplit_tpu.config import resolve_dtype
        from speechsplit_tpu.data.resident import build_resident_from_wavs

        spk2gen = {}
        if os.path.exists(args.spk2gen):
            with open(args.spk2gen, "rb") as handle:
                spk2gen = dict(pickle.load(handle))
        for s in sorted(os.listdir(args.wav_dir)):
            if os.path.isdir(os.path.join(args.wav_dir, s)):
                spk2gen.setdefault(s, "M")
        resident = build_resident_from_wavs(
            args.wav_dir, spk2gen, config,
            store_dtype=resolve_dtype(args.resident_dtype),
            seed=args.seed,
        )
    else:
        dataset = SpeakerDataset(
            config.root_dir, config.feat_dir, mode=config.mode,
            eager=not args.lazy_data,
        )
        loader = data_loader(dataset, config, seed=args.seed)

    devices = jax.devices()
    n = args.num_devices or len(devices)
    mesh = make_mesh((n,), devices=devices[:n]) if n > 1 else None

    run_config = SolverConfig(
        num_iters=args.num_iters,
        resume_iters=args.resume_iters,
        log_dir=args.log_dir,
        model_save_dir=args.model_save_dir,
        sample_dir=args.sample_dir,
        log_step=args.log_step,
        sample_step=args.sample_step,
        model_save_step=args.model_save_step,
        use_tensorboard=args.use_tensorboard,
        seed=args.seed,
        validation_path=args.validation_path,
        model=args.model,
        compress_transfers=args.compress_transfers,
        keep_checkpoints=args.keep_checkpoints,
        profile_dir=args.profile_dir,
        steps_per_dispatch=args.steps_per_dispatch,
        data_on_device=args.data_on_device,
        resident_dtype=args.resident_dtype,
    )
    Solver(
        loader, run_config, config, mesh=mesh, dataset=dataset,
        resident=resident,
    ).train()


if __name__ == "__main__":
    main()

"""Data-path scale rehearsal (VERDICT r2 #7 / BASELINE config 5).

Substantiates the VCTK-scale claims of the resident data path
(data/resident.py) on a corpus of thousands of utterances: preprocess
the whole wav tree through the pipelined device front-end, load the
feature trees memory-mapped (eager=False), pin everything in HBM
(optionally bfloat16), and train the full-size generator for a few
hundred steps with multi-step dispatch — recording throughput and
memory at every stage.

    python -m benchmarks.make_corpus --out_dir /tmp/scale/wavs \
        --num 10000 --duration 1.6 --speakers 16
    python -m benchmarks.scale_rehearsal --wav_dir /tmp/scale/wavs \
        --work /tmp/scale --steps 300
    python -m benchmarks.scale_rehearsal --wav_dir /tmp/scale/wavs \
        --work /tmp/scale --steps 300 --device_direct

``--device_direct`` replaces the archival stages (feature trees on
disk -> mmap -> upload) with resident.build_resident_from_wavs:
features are computed AND stored in HBM by the same device programs,
so nothing but PCM16 audio ever crosses the host link. The archival
mode remains the right pipeline when .npy trees are themselves the
product.

Prints one JSON dict: preprocessing frames/s, dataset-load seconds
(mmap), resident HBM bytes (+ measured device memory stats when the
backend exposes them), sustained steps/s, and a VCTK-44h extrapolation
of the feature footprint.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav_dir", required=True)
    ap.add_argument("--work", required=True,
                    help="working dir for feature trees")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--steps_per_dispatch", type=int, default=10)
    ap.add_argument("--store_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batches_per_dispatch", type=int, default=8)
    ap.add_argument("--skip_preprocess", action="store_true",
                    help="reuse existing feature trees under --work")
    ap.add_argument("--device_direct", action="store_true",
                    help="preprocess STRAIGHT into the HBM store "
                    "(resident.build_resident_from_wavs): features "
                    "never cross the host link; replaces stages 1-3")
    args = ap.parse_args(argv)

    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    import jax

    from speechsplit_tpu.config import SpeechSplitConfig, resolve_dtype
    from speechsplit_tpu.data.dataset import SpeakerDataset
    from speechsplit_tpu.data.prepare import build_metadata, extract_dir
    from speechsplit_tpu.data.resident import build_resident

    # warm the device link before ANY timing: the first host<->device
    # transfer of a fresh process on this tunneled platform costs
    # ~90 s regardless of payload (backend/tunnel session setup) —
    # leaving it inside stage 1 once misattributed 90 of a "102.6 s"
    # device-direct run to the data path (the loop itself was ~13 s)
    import jax.numpy as jnp

    _ = float(jnp.sum(jax.device_put(np.zeros(8, np.float32))))

    result: dict = {}
    mel_dir = os.path.join(args.work, "spmel")
    f0_dir = os.path.join(args.work, "raptf0")
    config = SpeechSplitConfig()
    store = resolve_dtype(args.store_dtype)
    speakers = sorted(
        d for d in os.listdir(args.wav_dir)
        if os.path.isdir(os.path.join(args.wav_dir, d))
    )
    spk2gen = {s: ("M" if i % 2 == 0 else "F")
               for i, s in enumerate(speakers)}

    # ---- device-direct: wavs -> HBM store in one pipeline ------------
    if args.device_direct:
        from speechsplit_tpu.data.resident import build_resident_from_wavs

        t0 = time.time()
        features, speaker_utts = build_resident_from_wavs(
            args.wav_dir, spk2gen, config, store,
            batches_per_dispatch=args.batches_per_dispatch,
        )
        jax.block_until_ready(features.mel)
        n_frames = int(np.sum(np.asarray(features.length)))
        dt = time.time() - t0
        result["device_direct_seconds"] = round(dt, 1)
        result["preprocess_frames"] = n_frames
        result["device_direct_frames_per_sec"] = round(n_frames / dt, 1)
        log(f"device-direct: {n_frames} frames into the HBM store "
            f"in {dt:.1f}s ({args.store_dtype})")
        feat_bytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize for a in features
        )
        result["resident_feature_bytes"] = feat_bytes
        result["dataset_utterances"] = int(
            sum(len(u) for u in speaker_utts)
        )
        _train_stage(args, result, config, features, speaker_utts)
        print(json.dumps(result))
        return

    # ---- stage 1: preprocessing (pipelined, staged dispatches) -------
    if not args.skip_preprocess:
        t0 = time.time()
        extract_dir(
            args.wav_dir, mel_dir, f0_dir, spk2gen,
            batches_per_dispatch=args.batches_per_dispatch,
            compress_fetch=True,
        )
        dt = time.time() - t0
        n_frames = 0
        for root, _d, files in os.walk(mel_dir):
            for f in files:
                if f.endswith(".npy"):
                    n_frames += np.load(
                        os.path.join(root, f), mmap_mode="r"
                    ).shape[0]
        result["preprocess_seconds"] = round(dt, 1)
        result["preprocess_frames"] = n_frames
        result["preprocess_frames_per_sec"] = round(n_frames / dt, 1)
        log(f"preprocess: {n_frames} frames in {dt:.1f}s")
        build_metadata(mel_dir)

    # ---- stage 2: mmap dataset load ----------------------------------
    t0 = time.time()
    with open(os.path.join(mel_dir, "train.pkl"), "rb") as fh:
        metadata = pickle.load(fh)
    dataset = SpeakerDataset(
        mel_dir, f0_dir, metadata=metadata, eager=False,
    )
    n_utts = sum(len(e[2]) for e in dataset.entries)
    result["dataset_load_seconds"] = round(time.time() - t0, 2)
    result["dataset_utterances"] = n_utts
    log(f"dataset: {n_utts} utterances mmap-loaded in "
        f"{result['dataset_load_seconds']}s")

    # ---- stage 3: resident upload ------------------------------------
    t0 = time.time()
    features, speaker_utts = build_resident(dataset, config, store)
    feat_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize for a in features
    )
    jax.block_until_ready(features.mel)
    result["resident_upload_seconds"] = round(time.time() - t0, 1)
    result["resident_feature_bytes"] = feat_bytes
    log(f"resident: {feat_bytes / 1e9:.2f} GB uploaded in "
        f"{result['resident_upload_seconds']}s ({args.store_dtype})")

    _train_stage(args, result, config, features, speaker_utts)
    print(json.dumps(result))


def _train_stage(args, result, config, features, speaker_utts) -> None:
    """Stage 4: sustained resident training + footprint accounting."""
    import numpy as np

    import jax

    from speechsplit_tpu.data.resident import (
        make_resident_train_step,
        plan_batches,
        stack_plans,
    )
    from speechsplit_tpu.training.train_step import create_train_state

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        result["device_bytes_in_use"] = int(stats["bytes_in_use"])
    except Exception:
        pass

    # total audio hours -> VCTK-44h extrapolation of the footprint
    total_frames = int(np.sum(np.asarray(features.length)))
    hours = total_frames * config.hop_length / config.sample_rate / 3600
    result["corpus_hours"] = round(hours, 2)
    if hours > 0:
        result["vctk44h_extrapolated_gb"] = round(
            result["resident_feature_bytes"] / 1e9 * 44.0 / hours, 2
        )

    module, state = create_train_state(config, jax.random.PRNGKey(0))
    step = make_resident_train_step(config, module, features)
    plans = stack_plans(
        plan_batches(
            speaker_utts, np.asarray(features.length), config, seed=0
        ),
        args.steps_per_dispatch,
    )
    key = jax.random.PRNGKey(1)
    # warm (compile)
    state, losses = step(state, next(plans), key)
    _ = float(losses[-1])
    n_disp = max(1, args.steps // args.steps_per_dispatch)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, losses = step(state, next(plans), key)
    last = float(losses[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(last), last
    steps_done = n_disp * args.steps_per_dispatch
    result["train_steps"] = steps_done
    result["train_steps_per_sec"] = round(steps_done / dt, 1)
    result["final_loss"] = round(last, 4)
    log(f"train: {steps_done} steps in {dt:.1f}s "
        f"({result['train_steps_per_sec']} steps/s), loss {last:.4f}")


if __name__ == "__main__":
    main()

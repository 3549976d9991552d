"""Sustained training throughput: the REAL loader -> device -> step loop.

VERDICT r1 #6: the headline steps/s times a device-resident batch; the
honest number must include host batch assembly and the host->device
transfer. This benchmark builds a synthetic on-disk feature corpus,
runs the actual SpeakerDataset -> data_loader -> prefetch -> train_step
pipeline, and reports sustained steps/s for:

  - steps_per_dispatch=1 (per-step dispatch, like the reference loop)
  - steps_per_dispatch=8 (staged super-batches, one dispatch per 8)

Usage: python -m benchmarks.sustained [--iters 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _make_corpus(root: str, n_speakers: int = 8, n_utts: int = 6) -> None:
    """Synthetic features in the on-disk layout the dataset expects."""
    rng = np.random.RandomState(0)
    for s in range(n_speakers):
        spk = f"spk{s:03d}"
        os.makedirs(os.path.join(root, "spmel", spk), exist_ok=True)
        os.makedirs(os.path.join(root, "raptf0", spk), exist_ok=True)
        for u in range(n_utts):
            t = rng.randint(160, 420)
            np.save(
                os.path.join(root, "spmel", spk, f"u{u}.npy"),
                rng.rand(t, 80).astype(np.float32),
            )
            np.save(
                os.path.join(root, "raptf0", spk, f"u{u}.npy"),
                rng.rand(t).astype(np.float64),
            )
    from speechsplit_tpu.data.prepare import build_metadata

    build_metadata(os.path.join(root, "spmel"))


def bench_sustained(steps_per_dispatch: int, iters: int, root: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.data.dataset import SpeakerDataset
    from speechsplit_tpu.data.loader import data_loader
    from speechsplit_tpu.data.prefetch import (
        prefetch_to_device,
        stack_batches,
    )
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_multi_step,
        make_train_step,
    )

    config = SpeechSplitConfig(
        root_dir=os.path.join(root, "spmel"),
        feat_dir=os.path.join(root, "raptf0"),
    )
    dataset = SpeakerDataset(config.root_dir, config.feat_dir)
    module, state = create_train_state(config, jax.random.PRNGKey(0))

    k = abs(steps_per_dispatch)
    if steps_per_dispatch < 0:  # resident: features in HBM, plans only
        from speechsplit_tpu.data import resident as resident_lib

        features, speaker_utts = resident_lib.build_resident(
            dataset, config
        )
        step = resident_lib.make_resident_train_step(
            config, module, features
        )
        plans = resident_lib.plan_batches(
            speaker_utts, np.asarray(features.length), config, seed=0
        )
        feed = prefetch_to_device(
            resident_lib.stack_plans(plans, k) if k > 1 else plans,
            size=2,
        )
    elif k > 1:
        loader = data_loader(dataset, config, seed=0)
        step = make_train_multi_step(config, module)
        feed = prefetch_to_device(stack_batches(loader, k), size=2)
    else:
        loader = data_loader(dataset, config, seed=0)
        step = make_train_step(config, module)
        feed = prefetch_to_device(loader, size=2)
    key = jax.random.PRNGKey(1)

    # warm up: compile + fill prefetch
    for _ in range(3):
        state, loss = step(state, next(feed), key)
    _ = np.asarray(loss)

    n_dispatch = iters // k
    start = time.perf_counter()
    for _ in range(n_dispatch):
        state, loss = step(state, next(feed), key)
    last = float(np.ravel(np.asarray(loss))[-1])  # fence
    elapsed = time.perf_counter() - start
    assert np.isfinite(last), last
    rate = n_dispatch * k / elapsed
    log(
        f"sustained k={k}: {n_dispatch * k} steps in {elapsed:.2f}s "
        f"-> {rate:.1f} steps/s"
    )
    return rate


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args(argv)
    with tempfile.TemporaryDirectory() as root:
        _make_corpus(root)
        r1 = bench_sustained(1, args.iters, root)
        r8 = bench_sustained(8, args.iters, root)
        rr = bench_sustained(-8, args.iters, root)  # resident, k=8
    return {
        "sustained_steps_per_sec_k1": round(r1, 2),
        "sustained_steps_per_sec_k8": round(r8, 2),
        "sustained_steps_per_sec_resident_k8": round(rr, 2),
    }


if __name__ == "__main__":
    print(json.dumps(main(), indent=2))

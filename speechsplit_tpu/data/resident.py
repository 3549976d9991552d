"""Device-resident training data: features live in HBM, crops happen
on-device, the host sends only index scalars.

Why: the sustained training loop is transfer-bound in hosted
environments — each step feeds ~2.5 MB of collated features
(mel+f0+emb), which caps the loop at ~35-45 steps/s through this
environment's device tunnel vs the 151 steps/s step capability
(BENCHMARKS.md). Staging (``stack_batches``) amortizes dispatch cost
but not bytes. This module removes the bytes: all utterance features
upload to HBM once, and each step's "batch" is three ``[B]`` int32
vectors (utterance id, crop length, crop offset — ~200 bytes) that a
fused on-device gather + mask turns into the exact collated Batch.

Parity: :func:`plan_batches` replays the SAME RNG call sequence as the
host loader (sampler epoch -> per-sample utterance draw -> per-sample
crop draws, loader.py/collator.py), so for a given seed the resident
path trains on bit-identical crops to the host path
(tests/test_resident.py asserts this).

Memory: mel+f0 at VCTK scale (~44 h, <=10 s utterances) is ~9 GB in
f32 — within a v5e's 16 GB HBM; ``store_dtype=jnp.bfloat16`` halves it
(features are [0,1] mels and normalized F0, where bf16's 8 relative
bits cost ~4e-3 absolute — the same trade as --compress_transfers).
Larger corpora shard over the data mesh or fall back to the host
loader.

Reference baseline being replaced: the per-step H2D copy of the torch
loop (solver.py:147-150).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.data.dataset import SpeakerDataset
from speechsplit_tpu.data.sampler import RepeatSampler
from speechsplit_tpu.training.train_step import (
    TrainState,
    make_f0_train_step_fn,
    make_train_step_fn,
)

Array = jax.Array

UNVOICED = -1e10


class ResidentFeatures(NamedTuple):
    mel: Array       # [U, T_pad, dim_freq], zero-padded past each length
    f0: Array        # [U, T_pad], UNVOICED-padded
    spk_emb: Array   # [U, dim_spk_emb]
    length: Array    # [U] true frame counts (int32)


class Plan(NamedTuple):
    """One dispatch worth of crop coordinates ([B] or [k, B] each)."""

    utt: Array       # utterance index into ResidentFeatures
    len_crop: Array  # crop length
    offset: Array    # crop start frame


def build_resident(
    dataset: SpeakerDataset,
    config: SpeechSplitConfig,
    store_dtype: Any = jnp.float32,
) -> Tuple[ResidentFeatures, list]:
    """Upload every utterance to HBM once.

    Returns (features, speaker_utts) where speaker_utts[speaker_index]
    lists the flat utterance ids of that speaker — the structure
    :func:`plan_batches` samples over.
    """
    mels, f0s, embs, lens, speaker_utts = [], [], [], [], []
    for speaker_i in range(len(dataset)):
        _name, emb, utts = dataset.entries[speaker_i]
        ids = []
        for mel, f0 in utts:
            ids.append(len(mels))
            mels.append(np.asarray(mel, np.float32))
            f0s.append(np.asarray(f0, np.float32))
            embs.append(np.asarray(emb, np.float32))
            lens.append(len(mel))
        speaker_utts.append(ids)

    # pad so a max_len_pad window fits at any valid offset; build the
    # host staging arrays directly in the store dtype — casting AFTER
    # jnp.asarray uploads the full float32 payload and converts on
    # device, i.e. 2x the host->device bytes for a bfloat16 store
    # (measured: the upload is the whole cost of build_resident on
    # slow links)
    t_pad = max(lens) + config.max_len_pad
    u = len(mels)
    np_store = np.dtype(store_dtype)
    mel_arr = np.zeros((u, t_pad, config.dim_freq), np_store)
    f0_arr = np.full((u, t_pad), UNVOICED, np_store)
    for i, (m, f) in enumerate(zip(mels, f0s)):
        mel_arr[i, : len(m)] = m
        f0_arr[i, : len(f)] = f

    features = ResidentFeatures(
        mel=jax.device_put(mel_arr),
        f0=jax.device_put(f0_arr),
        spk_emb=jax.device_put(jnp.asarray(np.stack(embs))),
        length=jax.device_put(jnp.asarray(lens, jnp.int32)),
    )
    return features, speaker_utts


def build_resident_from_wavs(
    wav_dir: str,
    spk2gen: dict,
    config: SpeechSplitConfig,
    store_dtype: Any = jnp.float32,
    *,
    batch_size: int = 16,
    seed: int = 0,
    batches_per_dispatch: int = 8,
    reference_compat: bool = False,
) -> Tuple[ResidentFeatures, list]:
    """Preprocess a wav tree STRAIGHT into the HBM feature store —
    features never cross the host link.

    The archival flow (prepare.extract_dir -> .npy trees -> dataset ->
    :func:`build_resident`) fetches every feature batch to the host and
    re-uploads the corpus afterwards; on hosted/tunneled TPU links that
    fetch dominates the entire data path (BENCHMARKS.md "scale
    rehearsal"). Here the host streams PCM16 wav batches up once and
    every extraction result is row-scattered into the donated store by
    the same device program that computed it
    (preprocess.extract_into_store) — the only downlink traffic is
    compile metadata.

    Bit-parity: batching, per-dispatch PRNG keys, frame masking and
    store padding all mirror the archival flow exactly, so for a given
    seed and ``store_dtype=bfloat16`` the resulting store is
    bit-identical to extract_dir(compress_fetch=True) -> build_resident
    (tests/test_resident.py). Replaces the reference's make_spect_f0.py
    -> txt/npy -> data_loader round trip (make_spect_f0.py:48-74,
    data_loader.py:30-45) with a zero-roundtrip device pipeline.

    Returns (features, speaker_utts) exactly like :func:`build_resident`.
    """
    from speechsplit_tpu import preprocess
    from speechsplit_tpu.data import prepare

    speakers, entries = prepare._enumerate_entries(wav_dir, spk2gen)

    # utterance ids are speaker-major in sorted-file order — the same
    # flat order the metadata/dataset path produces (prepare.build_
    # metadata walks sorted speakers/files; build_resident flattens
    # dataset entries in that order)
    uid_of: dict = {}
    speaker_utts: list = []
    embs: list = []
    frames: list = []
    by_speaker: dict = {}
    for e in sorted(entries, key=lambda e: (e[0], e[1])):
        by_speaker.setdefault(e[0], []).append(e)
    for idx, speaker in enumerate(speakers):
        emb = prepare.speaker_embedding(
            speaker, idx, config.dim_spk_emb, reference_compat
        )
        ids = []
        for speaker_, fname, _lo, _hi, _size in by_speaker.get(speaker, []):
            uid = len(frames)
            uid_of[(speaker_, fname)] = uid
            ids.append(uid)
            embs.append(emb)
            frames.append(
                prepare.wav_frame_count(os.path.join(wav_dir, speaker, fname))
            )
        speaker_utts.append(ids)

    u = len(frames)
    if u == 0:
        raise ValueError(f"no wavs under {wav_dir}")
    t_pad = max(frames) + config.max_len_pad
    mel_store = jnp.zeros((u, t_pad, config.dim_freq), store_dtype)
    f0_store = jnp.full((u, t_pad), UNVOICED, store_dtype)

    key = jax.random.PRNGKey(seed)

    def put_group(item):
        """Stage one group's arrays onto the device ASYNCHRONOUSLY.

        Passing numpy args straight to the jitted scatter transfers
        them synchronously inside each call, serializing upload with
        program execution — measured 102.6 s for a 0.68 GB / 10k-utt
        corpus vs 19.9 s for the same bytes issued as back-to-back
        device_puts. Explicit puts keep the host link saturated while
        earlier extraction programs run.
        """
        group, k_real = item
        nonlocal key
        key, sub = jax.random.split(key)
        wavs = np.stack([b for _j, b, _l in group])
        lengths = np.stack([l for _j, _b, l in group])
        lo = np.stack(
            [np.asarray([e[2] for e in j], np.float32)
             for j, _b, _l in group]
        )
        hi = np.stack(
            [np.asarray([e[3] for e in j], np.float32)
             for j, _b, _l in group]
        )
        # padding repeats (k >= k_real) scatter to row `u`, which
        # mode="drop" discards — their dither keys differ from the rows
        # they repeat, so letting them land would break bit-parity
        uids = np.stack(
            [
                np.asarray(
                    [
                        uid_of[(spk, f)] if k < k_real else u
                        for spk, f, _lo2, _hi2 in job
                    ],
                    np.int32,
                )
                for k, (job, _b, _l) in enumerate(group)
            ]
        )
        return tuple(
            jax.device_put(x) for x in (wavs, lengths, lo, hi, uids, sub)
        )

    staged = None
    for item in prepare._staged_groups(
        wav_dir, entries,
        batch_size=batch_size,
        batches_per_dispatch=batches_per_dispatch,
    ):
        nxt = put_group(item)  # upload overlaps the running program
        if staged is not None:
            mel_store, f0_store = preprocess.extract_into_store(
                mel_store, f0_store, *staged
            )
        staged = nxt
    if staged is not None:
        mel_store, f0_store = preprocess.extract_into_store(
            mel_store, f0_store, *staged
        )

    features = ResidentFeatures(
        mel=mel_store,
        f0=f0_store,
        spk_emb=jax.device_put(jnp.asarray(np.stack(embs))),
        length=jax.device_put(jnp.asarray(frames, jnp.int32)),
    )
    return features, speaker_utts


def plan_batches(
    speaker_utts: list,
    lengths: np.ndarray,
    config: SpeechSplitConfig,
    *,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Plan]:
    """Infinite iterator of [B] crop plans, RNG-identical to the host
    loader: same sampler epochs, same per-sample draw order
    (loader.py:38-45, collator.py:44-53, dataset.py:90-96)."""
    sampler = RepeatSampler(
        len(speaker_utts), config.n_repeats, shuffle=config.shuffle
    )
    rng = np.random.default_rng(seed)
    b = config.batch_size
    lengths = np.asarray(lengths)
    while True:
        order = sampler.epoch(rng)
        for start in range(0, len(order), b):
            idx = order[start : start + b]
            if drop_last and len(idx) < b:
                break
            utt_ids = []
            for spk in idx:
                ids = speaker_utts[int(spk)]
                pick = ids[rng.integers(len(ids))] if len(ids) > 1 else ids[0]
                utt_ids.append(pick)
            len_crops, offsets = [], []
            for uid in utt_ids:
                t = int(lengths[uid])
                lc = int(
                    rng.integers(config.min_len_seq, config.max_len_seq + 1)
                )
                lc = min(lc, t, config.max_len_pad)
                left = int(rng.integers(0, max(t - lc, 0) + 1))
                len_crops.append(lc)
                offsets.append(left)
            yield Plan(
                utt=np.asarray(utt_ids, np.int32),
                len_crop=np.asarray(len_crops, np.int32),
                offset=np.asarray(offsets, np.int32),
            )


def stack_plans(plans: Iterator[Plan], k: int) -> Iterator[Plan]:
    """Group k plans into one [k, B] super-plan (multi-step dispatch)."""
    group = []
    for p in plans:
        group.append(p)
        if len(group) == k:
            yield jax.tree.map(lambda *xs: np.stack(xs), *group)
            group = []


def collate_on_device(
    config: SpeechSplitConfig, features: ResidentFeatures, plan: Plan
) -> Batch:
    """The collator, fused on device: gather + clip + mask (exact
    collator.py:44-78 semantics)."""
    t_out = config.max_len_pad

    def one(uid, lc, off):
        mel = jax.lax.dynamic_slice(
            features.mel,
            (uid, off, jnp.zeros((), jnp.int32)),
            (1, t_out, config.dim_freq),
        )[0].astype(jnp.float32)
        f0 = jax.lax.dynamic_slice(
            features.f0, (uid, off), (1, t_out)
        )[0].astype(jnp.float32)
        tpos = jnp.arange(t_out)
        keep = tpos < lc
        mel = jnp.where(keep[:, None], jnp.clip(mel, 0.0, 1.0), 0.0)
        f0 = jnp.where(keep, f0, UNVOICED)
        return mel, f0

    mel, f0 = jax.vmap(one)(plan.utt, plan.len_crop, plan.offset)
    return Batch(
        mel=mel,
        spk_emb=features.spk_emb[plan.utt].astype(jnp.float32),
        f0=f0[..., None],
        len_org=plan.len_crop,
    )


def make_resident_train_step(
    config: SpeechSplitConfig,
    module: Any,
    features: ResidentFeatures,
    mesh: Optional[Mesh] = None,
    model: str = "speechsplit",
) -> Callable[[TrainState, Plan, Array], Tuple[TrainState, Array]]:
    """Fused gather+collate+train step(s) driven by index plans.

    Accepts a [B] Plan (one step) or a [k, B] Plan (k scanned steps,
    losses [k]) — the leading rank decides. Only the plan crosses the
    host boundary per dispatch.

    The feature store is threaded through as an explicit jit ARGUMENT,
    not a closure capture: jit inlines closed-over device arrays into
    the lowered module as literal constants, and at corpus scale that
    means serializing/hashing hundreds of MB of HLO per compile — the
    10k-utterance scale rehearsal spent 15+ min lowering a 0.55 GB
    constant before this was restructured. As an argument the store is
    a zero-copy runtime parameter of constant shape.
    """
    step_fn = (
        make_train_step_fn(config, module)
        if model == "speechsplit"
        else make_f0_train_step_fn(config, module)
    )

    def one_step(
        feats: ResidentFeatures, state: TrainState, plan: Plan, key: Array
    ):
        batch = collate_on_device(config, feats, plan)
        return step_fn(state, batch, key)

    def dispatch(
        feats: ResidentFeatures, state: TrainState, plan: Plan, key: Array
    ):
        # with a mesh, plans must be [k, B] (stack_plans, k >= 1): the
        # in_shardings below partition axis 1, and jit's rank validation
        # rejects 1-D plans before tracing
        if plan.utt.ndim == 1:
            return one_step(feats, state, plan, key)

        def body(carry, plan_i):
            return one_step(feats, carry, plan_i, key)

        return jax.lax.scan(body, state, plan)

    if mesh is None:
        jitted = jax.jit(dispatch, donate_argnums=(1,))
        return lambda state, plan, key: jitted(features, state, plan, key)
    repl = NamedSharding(mesh, PartitionSpec())
    data = NamedSharding(mesh, PartitionSpec(None, "data"))
    plan_shardings = Plan(utt=data, len_crop=data, offset=data)
    feat_shardings = ResidentFeatures(
        mel=repl, f0=repl, spk_emb=repl, length=repl
    )
    # replicate the store across the mesh ONCE here — passing the
    # original single-device arrays into the jit would re-pay the
    # full-corpus broadcast on EVERY dispatch (in_shardings reshards
    # per call and discards the resharded copy afterwards)
    features = jax.tree.map(
        lambda a, s: jax.device_put(a, s), features, feat_shardings
    )
    jitted = jax.jit(
        dispatch,
        in_shardings=(feat_shardings, repl, plan_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(1,),
    )
    return lambda state, plan, key: jitted(features, state, plan, key)

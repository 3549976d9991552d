"""Dataset preparation: wavs -> .npy feature pairs + metadata.

The host side of preprocessing (file walking, wav decode, .npy writing,
metadata pickling); the math happens in batched device calls to
:func:`speechsplit_tpu.preprocess.extract_features`.

Mirrors the observable behavior of the reference's make_spect_f0.py +
make_metadata.py: per-speaker directories of wavs become parallel
``spmel/<spk>/<utt>.npy`` (mel ``[T, 80]``) and ``raptf0/<spk>/<utt>.npy``
(normalized log-F0 ``[T]``) trees plus a ``train.pkl``-style metadata list
``[[speaker, spk_emb(82,), relpath, ...], ...]`` (make_metadata.py:10-33).

Speaker embeddings: by default each speaker gets a distinct one-hot slot
by sorted order. ``reference_compat=True`` reproduces the reference's
hard-coded scheme (p226 -> slot 1, everyone else -> slot 7;
make_metadata.py:20-24) for checkpoint compatibility.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, List, Sequence

import jax
import numpy as np
from scipy.io import wavfile

from speechsplit_tpu.preprocess import (
    GENDER_F0_RANGE,
    extract_features,
    frame_count,
    pad_batch,
)


def read_wav(path: str, expect_rate: int = 16000) -> np.ndarray:
    """Decode a wav file to float32 in [-1, 1] (reference asserts 16 kHz,
    make_spect_f0.py:51)."""
    rate, data = wavfile.read(path)
    if rate != expect_rate:
        raise ValueError(f"{path}: sample rate {rate} != {expect_rate}")
    if data.ndim > 1:
        data = data.mean(axis=1)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    return data.astype(np.float32)


def extract_dir(
    wav_dir: str,
    mel_dir: str,
    f0_dir: str,
    spk2gen: Dict[str, str],
    *,
    batch_size: int = 16,
    seed: int = 0,
) -> List[str]:
    """Process every ``wav_dir/<speaker>/*.wav`` into feature trees.

    Returns the sorted list of speakers processed. Utterances are batched
    (padded to a common length per batch) so the device pipeline runs a
    handful of large fused kernels instead of one launch per file.
    """
    speakers = sorted(
        d for d in os.listdir(wav_dir)
        if os.path.isdir(os.path.join(wav_dir, d))
    )
    key = jax.random.PRNGKey(seed)
    for speaker in speakers:
        gender = spk2gen[speaker]
        lo, hi = GENDER_F0_RANGE[gender]
        os.makedirs(os.path.join(mel_dir, speaker), exist_ok=True)
        os.makedirs(os.path.join(f0_dir, speaker), exist_ok=True)
        files = sorted(
            f for f in os.listdir(os.path.join(wav_dir, speaker))
            if f.endswith(".wav")
        )
        for start in range(0, len(files), batch_size):
            chunk = files[start : start + batch_size]
            wavs = [
                read_wav(os.path.join(wav_dir, speaker, f)) for f in chunk
            ]
            key, sub = jax.random.split(key)
            batch, lengths = pad_batch(wavs)
            mel, f0 = extract_features(
                batch,
                lengths,
                np.full(len(chunk), lo, np.float32),
                np.full(len(chunk), hi, np.float32),
                sub,
            )
            mel = np.asarray(mel)
            f0 = np.asarray(f0)
            for i, fname in enumerate(chunk):
                t = frame_count(int(lengths[i]))
                stem = fname[:-4]
                np.save(
                    os.path.join(mel_dir, speaker, stem),
                    mel[i, :t].astype(np.float32),
                    allow_pickle=False,
                )
                np.save(
                    os.path.join(f0_dir, speaker, stem),
                    f0[i, :t].astype(np.float32),
                    allow_pickle=False,
                )
    return speakers


def speaker_embedding(
    speaker: str,
    index: int,
    dim: int = 82,
    reference_compat: bool = False,
) -> np.ndarray:
    emb = np.zeros((dim,), np.float32)
    if reference_compat:
        # ref: make_metadata.py:20-24 (hard-coded for the demo speakers)
        emb[1 if speaker == "p226" else 7] = 1.0
    else:
        emb[index % dim] = 1.0
    return emb


def build_metadata(
    mel_dir: str,
    *,
    dim_spk_emb: int = 82,
    reference_compat: bool = False,
    out_name: str = "train.pkl",
) -> list:
    """Walk the mel tree and write ``train.pkl`` (make_metadata.py)."""
    speakers = sorted(
        d for d in os.listdir(mel_dir)
        if os.path.isdir(os.path.join(mel_dir, d))
    )
    meta = []
    for idx, speaker in enumerate(speakers):
        entry: list = [
            speaker,
            speaker_embedding(
                speaker, idx, dim_spk_emb, reference_compat
            ),
        ]
        for fname in sorted(
            f for f in os.listdir(os.path.join(mel_dir, speaker))
            if f.endswith(".npy")
        ):
            entry.append(os.path.join(speaker, fname))
        meta.append(entry)
    with open(os.path.join(mel_dir, out_name), "wb") as handle:
        pickle.dump(meta, handle)
    return meta

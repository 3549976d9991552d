"""In-RAM feature store keyed by speaker.

Mirrors the reference ``Utterances`` dataset semantics (data_loader.py:
14-91): metadata is ``train.pkl``; every utterance's mel and F0 arrays are
eagerly cached in RAM; ``__len__`` is the number of *speakers* and
``__getitem__`` returns one (mel, spk_emb, f0) utterance for that speaker.
The reference fans file loading out over multiprocessing workers sharing a
Manager list (data_loader.py:28-38); numpy .npy reads are I/O-bound, so a
thread pool does the same job here without pickling overhead.

The reference picks each speaker's utterance deterministically (index 0 of
its per-speaker list); with multiple utterances per speaker we sample one
per visit under a numpy Generator, which the repeat-sampler turns into the
same "speakers x repeats" epoch structure.
"""

from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence, Tuple

import numpy as np


def load_metadata(root_dir: str, name: str = "train.pkl") -> list:
    with open(os.path.join(root_dir, name), "rb") as handle:
        return pickle.load(handle)


class LazyArray:
    """A file-backed utterance slice that opens its ``.npy`` on access.

    ``eager=False`` previously held a live ``np.memmap`` (one open file
    descriptor) per feature file, capping corpus size at the process fd
    limit — ~500 utterances under a 1024 ulimit, found by the 10k
    scale rehearsal. This handle stores only (path, start, stop); every
    access opens the file, copies the requested frames, and lets the
    descriptor close — concurrently-open fds are bounded by the number
    of arrays being materialized (one collator batch), not corpus size.
    Page cache still makes repeat crops cheap.
    """

    __slots__ = ("path", "start", "stop")

    def __init__(self, path: str, start: int, stop: int):
        self.path, self.start, self.stop = path, start, stop

    def __len__(self) -> int:
        return self.stop - self.start

    def _view(self) -> np.ndarray:
        return np.load(self.path, mmap_mode="r")[self.start : self.stop]

    def __getitem__(self, index) -> np.ndarray:
        # np.array(copy=True) detaches the result from the memmap so
        # its fd closes as soon as the temporary view is collected
        return np.array(self._view()[index], copy=True)

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        out = np.array(self._view(), copy=True)
        return out.astype(dtype) if dtype is not None else out


def _npy_frame_count(path: str) -> int:
    """First-axis length from the ``.npy`` header (no data read; the
    transient memmap's fd closes with the temporary)."""
    return int(np.load(path, mmap_mode="r").shape[0])


class SpeakerDataset:
    """Eager feature cache: one entry per speaker."""

    def __init__(
        self,
        root_dir: str,
        feat_dir: str,
        *,
        metadata: list | None = None,
        num_workers: int = 8,
        mode: str = "train",
        split: int = 0,
        eager: bool = True,
    ):
        """``mode``/``split`` reproduce the reference's frame-level
        train/test partition (data_loader.py:23,64-69): 'train' keeps
        frames [split:] of every utterance, 'test' keeps [:split].
        The reference default split=0 makes the test set empty — kept
        as the documented default rather than silently changed.

        ``eager=False`` keeps features as :class:`LazyArray` handles
        instead of RAM copies — required at VCTK scale (the reference
        eagerly loads everything, data_loader.py:55-73, which caps
        dataset size at host RAM). Only the ``.npy`` headers are read
        at init; each access opens, copies the requested frames, and
        closes, so open fds stay bounded by batch size (not corpus
        size) and host RAM holds only what's in flight.
        """
        if mode not in ("train", "test"):
            raise ValueError(mode)
        self.root_dir = root_dir
        self.feat_dir = feat_dir
        meta = metadata if metadata is not None else load_metadata(root_dir)

        def load_entry(entry):
            speaker, emb = entry[0], np.asarray(entry[1], np.float32)
            utts = []
            for rel in entry[2:]:
                mel_path = os.path.join(root_dir, rel)
                f0_path = os.path.join(feat_dir, rel)
                if eager:
                    mel = np.load(mel_path)
                    f0 = np.load(f0_path)
                    assert len(mel) == len(f0), rel
                    if mode == "train":
                        mel, f0 = mel[split:], f0[split:]
                    else:
                        mel, f0 = mel[:split], f0[:split]
                    utts.append((mel, f0))
                else:
                    t = _npy_frame_count(mel_path)
                    assert t == _npy_frame_count(f0_path), rel
                    start, stop = (split, t) if mode == "train" else (0, split)
                    utts.append(
                        (
                            LazyArray(mel_path, start, stop),
                            LazyArray(f0_path, start, stop),
                        )
                    )
            return speaker, emb, utts

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            self.entries: List[Tuple[str, np.ndarray, list]] = list(
                pool.map(load_entry, meta)
            )

    def __len__(self) -> int:
        return len(self.entries)

    def speakers(self) -> Sequence[str]:
        return [e[0] for e in self.entries]

    def get(
        self, index: int, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (mel [T,80], spk_emb [82], f0 [T]) for one utterance."""
        speaker, emb, utts = self.entries[index]
        utt = utts[rng.integers(len(utts))] if len(utts) > 1 else utts[0]
        return utt[0], emb, utt[1]

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

        ``eager=False`` keeps features as memory-mapped ``.npy`` views
        instead of RAM copies — required at VCTK scale (the reference
        eagerly loads everything, data_loader.py:55-73, which caps
        dataset size at host RAM). The collator's random crop reads
        only the cropped frames, so page cache does the rest.
        """
        if mode not in ("train", "test"):
            raise ValueError(mode)
        self.root_dir = root_dir
        self.feat_dir = feat_dir
        meta = metadata if metadata is not None else load_metadata(root_dir)
        mmap = None if eager else "r"

        def load_entry(entry):
            speaker, emb = entry[0], np.asarray(entry[1], np.float32)
            utts = []
            for rel in entry[2:]:
                mel = np.load(os.path.join(root_dir, rel), mmap_mode=mmap)
                f0 = np.load(os.path.join(feat_dir, rel), mmap_mode=mmap)
                assert len(mel) == len(f0), rel
                if mode == "train":
                    mel, f0 = mel[split:], f0[split:]
                else:
                    mel, f0 = mel[:split], f0[:split]
                utts.append((mel, f0))
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

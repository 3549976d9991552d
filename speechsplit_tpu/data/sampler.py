"""Epoch index sampling: each speaker visited ``n_repeats`` times.

Reference: MultiSampler (data_loader.py:133-151, ``samplier=8``). Fixes
the reference's latent ``__len__``-before-``__iter__`` crash by computing
the length statically.
"""

from __future__ import annotations

import numpy as np


class RepeatSampler:
    def __init__(
        self, num_samples: int, n_repeats: int, shuffle: bool = True
    ):
        self.num_samples = num_samples
        self.n_repeats = n_repeats
        self.shuffle = shuffle

    def __len__(self) -> int:
        return self.num_samples * self.n_repeats

    def epoch(self, rng: np.random.Generator) -> np.ndarray:
        idx = np.tile(np.arange(self.num_samples), self.n_repeats)
        if self.shuffle:
            rng.shuffle(idx)
        return idx

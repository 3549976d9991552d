"""Batch iterator wiring dataset + collator + sampler.

Replaces the reference's torch DataLoader composition (data_loader.py:
156-175: batch 16, drop_last, repeat-sampler, worker seeding) with a
plain generator of numpy batches; collation at this model's geometry is
microseconds of numpy, so the heavy lifting is device prefetch
(:mod:`speechsplit_tpu.data.prefetch`), not worker processes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch, Collator
from speechsplit_tpu.data.dataset import SpeakerDataset
from speechsplit_tpu.data.sampler import RepeatSampler


def data_loader(
    dataset: SpeakerDataset,
    config: SpeechSplitConfig,
    *,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Batch]:
    """Infinite iterator of collated batches (epochs roll over silently,
    matching the reference's restart-on-StopIteration, solver.py:141-145
    — minus the bare ``except`` that swallowed real errors)."""
    collator = Collator(config)
    sampler = RepeatSampler(
        len(dataset), config.n_repeats, shuffle=config.shuffle
    )
    rng = np.random.default_rng(seed)
    batch_size = config.batch_size
    while True:
        order = sampler.epoch(rng)
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            samples = [dataset.get(int(i), rng) for i in idx]
            yield collator(samples, rng)

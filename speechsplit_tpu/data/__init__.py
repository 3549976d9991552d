"""Host-side data pipeline: feature store, collation, device prefetch."""

from speechsplit_tpu.data.dataset import SpeakerDataset, load_metadata
from speechsplit_tpu.data.collator import Collator
from speechsplit_tpu.data.sampler import RepeatSampler
from speechsplit_tpu.data.loader import data_loader
from speechsplit_tpu.data.prefetch import prefetch_to_device

__all__ = [
    "SpeakerDataset",
    "load_metadata",
    "Collator",
    "RepeatSampler",
    "data_loader",
    "prefetch_to_device",
]

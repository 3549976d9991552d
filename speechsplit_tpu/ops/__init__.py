"""TPU-native DSP and augmentation ops."""

from speechsplit_tpu.ops.interp import random_resample
from speechsplit_tpu.ops.quantize import (
    quantize_f0,
    quantize_f0_onehot,
    speaker_normalization,
)
from speechsplit_tpu.ops.masks import get_mask_from_lengths, pad_time_axis

__all__ = [
    "random_resample",
    "quantize_f0",
    "quantize_f0_onehot",
    "speaker_normalization",
    "get_mask_from_lengths",
    "pad_time_axis",
]

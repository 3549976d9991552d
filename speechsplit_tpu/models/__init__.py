"""Model layer for speechsplit_tpu.

Functional flax.linen modules; all sequence tensors are ``[B, T, C]``
(batch, time, channels) — the TPU-friendly NWC layout. No transposes to
channel-first anywhere in the compute path (the reference shuttles between
``[B,T,C]`` and ``[B,C,T]`` for torch Conv1d; reference model.py:299,304).
"""

from speechsplit_tpu.models.layers import LSTM, Conv1d, GroupNorm, Linear
from speechsplit_tpu.models.encoders import (
    ContentPitchEncoder,
    F0Encoder,
    RhythmEncoder,
)
from speechsplit_tpu.models.decoders import F0Decoder, MelDecoder
from speechsplit_tpu.models.generator import F0Converter, SpeechSplit

__all__ = [
    "LSTM",
    "Conv1d",
    "GroupNorm",
    "Linear",
    "RhythmEncoder",
    "F0Encoder",
    "ContentPitchEncoder",
    "MelDecoder",
    "F0Decoder",
    "SpeechSplit",
    "F0Converter",
]

"""Decoders: mel reconstruction and F0-contour prediction.

Reference: Decoder_3 model.py:233-255, Decoder_4 model.py:259-279.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from speechsplit_tpu.config import SpeechSplitConfig, resolve_dtype
from speechsplit_tpu.models.layers import LSTM, Linear

Array = jax.Array


class MelDecoder(nn.Module):
    """3-layer BiLSTM + linear projection to mel bins.

    Input is the concatenation [content, rhythm, pitch, speaker]
    (2*dim_neck + 2*dim_neck_2 + 2*dim_neck_3 + dim_spk_emb = 164 wide at
    defaults); ~80% of the model's FLOPs live here (ref: model.py:233-255).
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        outputs = LSTM(
            cfg.dim_dec_mel, num_layers=3, bidirectional=True,
            dtype=self.dtype, name="lstm",
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )(x)
        return Linear(cfg.dim_freq, dtype=self.dtype, name="projection")(
            outputs
        )


class F0Decoder(nn.Module):
    """2-layer BiLSTM + linear projection to quantized-F0 logits.

    (ref: model.py:259-279; input 2*dim_neck_2 + 2*dim_neck_3 = 66 wide.)
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        outputs = LSTM(
            cfg.dim_dec_f0, num_layers=2, bidirectional=True,
            dtype=self.dtype, name="lstm",
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )(x)
        return Linear(cfg.dim_f0, dtype=self.dtype, name="projection")(
            outputs
        )

"""Top-level models: the SpeechSplit generator and the F0 converter.

Reference: Generator_3 model.py:283-320 (19,437,800 params at defaults)
and Generator_6 model.py:324-351 (3,485,849 params).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.models.decoders import F0Decoder, MelDecoder
from speechsplit_tpu.models.encoders import (
    ContentPitchEncoder,
    F0Encoder,
    RhythmEncoder,
)
from speechsplit_tpu.models.layers import upsample_codes

Array = jax.Array


class SpeechSplit(nn.Module):
    """Triple-information-bottleneck voice-conversion model.

    Forward (ref: model.py:297-313): encode the resample-augmented
    mel+one-hot-F0 stack into content and pitch codes; encode the
    *un-resampled* mel into rhythm codes; upsample every code stream back
    to frame rate by repeat-interleave; concatenate with the broadcast
    speaker embedding; decode to mel.

    Inputs (all ``[B, T, .]``, NWC — no transposes needed):
      x_f0:  [B, T, dim_freq + dim_f0]  mel ++ one-hot F0
      x_org: [B, T, dim_freq]           un-augmented mel (rhythm path)
      c_trg: [B, dim_spk_emb]           speaker embedding
    Returns: [B, T, dim_freq] reconstructed/converted mel.
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder_content_pitch = ContentPitchEncoder(
            cfg, dtype=self.dtype
        )
        self.encoder_rhythm = RhythmEncoder(cfg, dtype=self.dtype)
        self.decoder = MelDecoder(cfg, dtype=self.dtype)

    def __call__(
        self, x_f0: Array, x_org: Array, c_trg: Array, train: bool = False
    ) -> Array:
        cfg = self.config
        codes_content, codes_pitch = self.encoder_content_pitch(
            x_f0, train=train
        )
        content = upsample_codes(codes_content, cfg.freq)
        pitch = upsample_codes(codes_pitch, cfg.freq_3)

        codes_rhythm = self.encoder_rhythm(x_org, None)
        rhythm = upsample_codes(codes_rhythm, cfg.freq_2)

        t = x_f0.shape[1]
        spk = jnp.broadcast_to(
            c_trg[:, None, :], (c_trg.shape[0], t, c_trg.shape[-1])
        )
        decoder_in = jnp.concatenate([content, rhythm, pitch, spk], axis=-1)
        return self.decoder(decoder_in)

    def rhythm(self, x_org: Array) -> Array:
        """Rhythm-code extraction endpoint (ref: model.py:316-320)."""
        return self.encoder_rhythm(x_org, None)


class F0Converter(nn.Module):
    """F0-contour converter between speakers.

    Rhythm codes of the source mel + pitch codes of the target F0 contour
    are upsampled, concatenated and decoded to 257-bin quantized-F0 logits
    (ref: model.py:324-351).

    Inputs:
      x_org:  [B, T, dim_freq]  source mel
      f0_trg: [B, T, dim_f0]    target one-hot F0 contour
    Returns: [B, T, dim_f0] logits.
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder_rhythm = RhythmEncoder(cfg, dtype=self.dtype)
        self.encoder_f0 = F0Encoder(cfg, dtype=self.dtype)
        self.decoder = F0Decoder(cfg, dtype=self.dtype)

    def __call__(
        self, x_org: Array, f0_trg: Array, train: bool = False
    ) -> Array:
        cfg = self.config
        codes_rhythm = self.encoder_rhythm(x_org, None)
        rhythm = upsample_codes(codes_rhythm, cfg.freq_2)

        codes_f0 = self.encoder_f0(f0_trg, train=train)
        pitch = upsample_codes(codes_f0, cfg.freq_3)

        decoder_in = jnp.concatenate([rhythm, pitch], axis=-1)
        return self.decoder(decoder_in)

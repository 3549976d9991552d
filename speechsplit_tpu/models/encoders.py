"""The three bottleneck encoders of the triple-information-bottleneck model.

All operate on ``[B, T, C]`` inputs (no channel-first transposes). The
random-resampling augmentation draws PRNG keys from the linen rng stream
``"resample"`` and is active only when ``train=True``
(reference eval-identity: model.py:382-383).

Reference architecture being re-designed (not translated):
- RhythmEncoder       <- Encoder_t,  model.py:46-89
- F0Encoder           <- Encoder_6,  model.py:93-140
- ContentPitchEncoder <- Encoder_7,  model.py:144-229
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.models.layers import (
    LSTM,
    Conv1d,
    GroupNorm,
    downsample_codes,
)
from speechsplit_tpu.ops.interp import random_resample

Array = jax.Array


class RhythmEncoder(nn.Module):
    """Rhythm encoder: the only path that sees un-resampled mel.

    conv(dim_freq -> dim_enc_2, k5) + GroupNorm + ReLU, BiLSTM(dim_neck_2),
    stride-freq_2 code sampling => [B, T/freq_2, 2*dim_neck_2]
    (ref: model.py:46-89; with defaults the code is 2-dim — the rhythm
    bottleneck).
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        cfg = self.config
        x = Conv1d(
            cfg.dim_enc_2, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype, name="conv_0",
        )(x)
        x = GroupNorm(cfg.dim_enc_2 // cfg.chs_grp, name="norm_0")(x)
        x = jax.nn.relu(x)
        outputs = LSTM(
            cfg.dim_neck_2, num_layers=1, bidirectional=True,
            dtype=self.dtype, name="lstm",
        )(x)
        if mask is not None:
            outputs = outputs * mask
        return downsample_codes(outputs, cfg.dim_neck_2, cfg.freq_2)


class F0Encoder(nn.Module):
    """Pitch-contour encoder for the F0 converter.

    3 x [conv(dim_f0 -> dim_enc_3, k5) + GroupNorm + ReLU + random
    resample], BiLSTM(dim_neck_3), stride-freq_3 sampling
    (ref: model.py:93-140; resampling after *every* conv, model.py:125-129,
    with the full padded length as len_seq, model.py:105).
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        batch = x.shape[0]
        full_len = jnp.full((batch,), cfg.max_len_pad, jnp.int32)
        for i in range(3):
            x = Conv1d(
                cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp, name=f"norm_{i}")(x)
            x = jax.nn.relu(x)
            if train:
                x = random_resample(
                    x, full_len, self.make_rng("resample"),
                    min_len_seg=cfg.min_len_seg,
                    max_len_seg=cfg.max_len_seg,
                    max_len_seq=cfg.max_len_seq,
                    max_len_pad=cfg.max_len_pad,
                )
        outputs = LSTM(
            cfg.dim_neck_3, num_layers=1, bidirectional=True,
            dtype=self.dtype, name="lstm",
        )(x)
        return downsample_codes(outputs, cfg.dim_neck_3, cfg.freq_3)


class ContentPitchEncoder(nn.Module):
    """Synchronized content + pitch encoder.

    Two parallel conv stacks (mel -> dim_enc, one-hot F0 -> dim_enc_3);
    after each conv pair the streams are concatenated and *jointly*
    resampled so content and pitch stay time-aligned, then re-split
    (ref: model.py:194-211). Content goes through a 2-layer BiLSTM to a
    dim_neck-wide bottleneck, pitch through a 1-layer BiLSTM to dim_neck_3
    (ref: model.py:214-227).

    Input: ``[B, T, dim_freq + dim_f0]``; returns
    ``(codes_content [B, T/freq, 2*dim_neck],
       codes_pitch   [B, T/freq_3, 2*dim_neck_3])``.
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_f0: Array, train: bool = False):
        cfg = self.config
        batch = x_f0.shape[0]
        full_len = jnp.full((batch,), cfg.max_len_pad, jnp.int32)

        x = x_f0[:, :, : cfg.dim_freq]
        f0 = x_f0[:, :, cfg.dim_freq :]

        for i in range(3):
            x = Conv1d(
                cfg.dim_enc, kernel_size=5, w_init_gain="relu",
                dtype=self.dtype, name=f"conv_mel_{i}",
            )(x)
            x = GroupNorm(cfg.dim_enc // cfg.chs_grp, name=f"norm_mel_{i}")(x)
            x = jax.nn.relu(x)
            f0 = Conv1d(
                cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
                dtype=self.dtype, name=f"conv_f0_{i}",
            )(f0)
            f0 = GroupNorm(
                cfg.dim_enc_3 // cfg.chs_grp, name=f"norm_f0_{i}"
            )(f0)
            f0 = jax.nn.relu(f0)
            if train:
                joint = jnp.concatenate([x, f0], axis=-1)
                joint = random_resample(
                    joint, full_len, self.make_rng("resample"),
                    min_len_seg=cfg.min_len_seg,
                    max_len_seg=cfg.max_len_seg,
                    max_len_seq=cfg.max_len_seq,
                    max_len_pad=cfg.max_len_pad,
                )
                x = joint[:, :, : cfg.dim_enc]
                f0 = joint[:, :, cfg.dim_enc :]

        content = LSTM(
            cfg.dim_neck, num_layers=2, bidirectional=True,
            dtype=self.dtype, name="lstm_content",
        )(x)
        pitch = LSTM(
            cfg.dim_neck_3, num_layers=1, bidirectional=True,
            dtype=self.dtype, name="lstm_pitch",
        )(f0)

        codes_content = downsample_codes(content, cfg.dim_neck, cfg.freq)
        codes_pitch = downsample_codes(pitch, cfg.dim_neck_3, cfg.freq_3)
        return codes_content, codes_pitch

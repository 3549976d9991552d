"""The three bottleneck encoders of the triple-information-bottleneck model.

All operate on ``[B, T, C]`` inputs (no channel-first transposes). The
random-resampling augmentation draws PRNG keys from the linen rng stream
``"resample"`` and is active only when ``train=True``
(reference eval-identity: model.py:382-383).

Each encoder exposes two surfaces:
- ``__call__`` — the self-contained path (conv stack + own recurrence +
  code downsampling), used on CPU and at inference batch sizes below
  the kernel threshold;
- ``pre`` — just the conv/augmentation stack, so the generator can run
  all encoders' *independent* recurrences in ONE fused multi-stream
  Pallas kernel (ops/pallas_multilstm.py: narrow recurrences are
  latency-bound, so fusing them is nearly free) and then apply the same
  downsampling. Both surfaces declare identical parameter trees.

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

from speechsplit_tpu.config import SpeechSplitConfig, resolve_dtype
from speechsplit_tpu.models.layers import (
    LSTM,
    Conv1d,
    GroupNorm,
    Linear,
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

    def setup(self):
        cfg = self.config
        self.conv_0 = Conv1d(
            cfg.dim_enc_2, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.norm_0 = GroupNorm(cfg.dim_enc_2 // cfg.chs_grp)
        self.lstm = LSTM(
            cfg.dim_neck_2, num_layers=1, bidirectional=True,
            dtype=self.dtype,
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )

    def pre(self, x: Array) -> Array:
        """Conv stack only (everything before the recurrence)."""
        return jax.nn.relu(self.norm_0(self.conv_0(x)))

    def codes(self, outputs: Array, mask: Optional[Array] = None) -> Array:
        if mask is not None:
            outputs = outputs * mask
        return downsample_codes(
            outputs, self.config.dim_neck_2, self.config.freq_2
        )

    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        return self.codes(self.lstm(self.pre(x)), mask)


class F0Encoder(nn.Module):
    """Pitch-contour encoder for the F0 converter.

    3 x [conv(dim_f0 -> dim_enc_3, k5) + GroupNorm + ReLU + random
    resample], BiLSTM(dim_neck_3), stride-freq_3 sampling
    (ref: model.py:93-140; resampling after *every* conv, model.py:125-129,
    with the full padded length as len_seq, model.py:105).
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv_0 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_1 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_2 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.norm_0 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.norm_1 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.norm_2 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.lstm = LSTM(
            cfg.dim_neck_3, num_layers=1, bidirectional=True,
            dtype=self.dtype,
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )

    def pre(
        self,
        x: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ) -> Array:
        cfg = self.config
        batch = x.shape[0]
        full_len = jnp.full((batch,), cfg.max_len_pad, jnp.int32)
        convs = (self.conv_0, self.conv_1, self.conv_2)
        norms = (self.norm_0, self.norm_1, self.norm_2)
        for conv, norm in zip(convs, norms):
            x = jax.nn.relu(norm(conv(x)))
            if train:
                x = random_resample(
                    x, full_len, self.make_rng("resample"),
                    min_len_seg=cfg.min_len_seg,
                    max_len_seg=cfg.max_len_seg,
                    max_len_seq=cfg.max_len_seq,
                    max_len_pad=cfg.max_len_pad,
                    example_ids=example_ids,
                )
        return x

    def codes(self, outputs: Array) -> Array:
        return downsample_codes(
            outputs, self.config.dim_neck_3, self.config.freq_3
        )

    def __call__(
        self,
        x: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ) -> Array:
        return self.codes(
            self.lstm(self.pre(x, train=train, example_ids=example_ids))
        )


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

    def setup(self):
        cfg = self.config
        self.conv_mel_0 = Conv1d(
            cfg.dim_enc, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_mel_1 = Conv1d(
            cfg.dim_enc, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_mel_2 = Conv1d(
            cfg.dim_enc, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.norm_mel_0 = GroupNorm(cfg.dim_enc // cfg.chs_grp)
        self.norm_mel_1 = GroupNorm(cfg.dim_enc // cfg.chs_grp)
        self.norm_mel_2 = GroupNorm(cfg.dim_enc // cfg.chs_grp)
        self.conv_f0_0 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_f0_1 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.conv_f0_2 = Conv1d(
            cfg.dim_enc_3, kernel_size=5, w_init_gain="relu",
            dtype=self.dtype,
        )
        self.norm_f0_0 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.norm_f0_1 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.norm_f0_2 = GroupNorm(cfg.dim_enc_3 // cfg.chs_grp)
        self.lstm_content = LSTM(
            cfg.dim_neck, num_layers=2, bidirectional=True,
            dtype=self.dtype,
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )
        self.lstm_pitch = LSTM(
            cfg.dim_neck_3, num_layers=1, bidirectional=True,
            dtype=self.dtype,
            residual_dtype=resolve_dtype(cfg.residual_dtype),
        )

    def pre(
        self,
        x_f0: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ):
        """Conv/augmentation stacks; returns the (content, pitch) streams."""
        cfg = self.config
        batch = x_f0.shape[0]
        full_len = jnp.full((batch,), cfg.max_len_pad, jnp.int32)

        x = x_f0[:, :, : cfg.dim_freq]
        f0 = x_f0[:, :, cfg.dim_freq :]

        convs_mel = (self.conv_mel_0, self.conv_mel_1, self.conv_mel_2)
        norms_mel = (self.norm_mel_0, self.norm_mel_1, self.norm_mel_2)
        convs_f0 = (self.conv_f0_0, self.conv_f0_1, self.conv_f0_2)
        norms_f0 = (self.norm_f0_0, self.norm_f0_1, self.norm_f0_2)
        for i in range(3):
            x = jax.nn.relu(norms_mel[i](convs_mel[i](x)))
            f0 = jax.nn.relu(norms_f0[i](convs_f0[i](f0)))
            if train:
                joint = jnp.concatenate([x, f0], axis=-1)
                joint = random_resample(
                    joint, full_len, self.make_rng("resample"),
                    min_len_seg=cfg.min_len_seg,
                    max_len_seg=cfg.max_len_seg,
                    max_len_seq=cfg.max_len_seq,
                    max_len_pad=cfg.max_len_pad,
                    example_ids=example_ids,
                )
                x = joint[:, :, : cfg.dim_enc]
                f0 = joint[:, :, cfg.dim_enc :]
        return x, f0

    def codes(self, content: Array, pitch: Array):
        cfg = self.config
        return (
            downsample_codes(content, cfg.dim_neck, cfg.freq),
            downsample_codes(pitch, cfg.dim_neck_3, cfg.freq_3),
        )

    def __call__(
        self,
        x_f0: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ):
        x, f0 = self.pre(x_f0, train=train, example_ids=example_ids)
        return self.codes(self.lstm_content(x), self.lstm_pitch(f0))


class SpeakerEncoder(nn.Module):
    """Utterance-level speaker (timbre) encoder for zero-shot conversion.

    The reference conditions the decoder on a per-speaker ONE-HOT and
    its own make_metadata.py:19 notes the upgrade path: "may use
    generalized speaker embedding for zero-shot conversion". This
    module is that option, enabled by ``config.spk_emb_mode="learned"``:
    a conv stack over the un-augmented mel followed by masked mean+std
    pooling and a linear head, L2-normalized to the unit sphere
    (one-hots are unit-norm too, so the decoder sees same-scale
    conditioning either way). Trained jointly with the generator on
    reconstruction — at conversion time any utterance of an UNSEEN
    speaker yields a usable timbre code (no metadata slot needed),
    which the reference's fixed 82-slot one-hot cannot do.

    Every statistic (group normalization AND pooling) is masked by the
    input's energy mask: the collator zeroes frames past each crop's
    true length (collator.py), so the embedding of an utterance is
    EXACTLY invariant to how much zero padding follows it
    (tests/test_speaker_encoder.py pins this) — unlike the torch-
    parity GroupNorm used elsewhere, which normalizes over the full
    padded window. Genuinely all-zero (silent) frames carry no timbre
    and lose nothing by being dropped.

    All-MXU design: three k5 convs at ``dim_spk_enc`` channels + one
    dense — no recurrence (an utterance-level code needs no sequential
    state), so the module adds ~0.8M params and negligible step time.
    """

    config: SpeechSplitConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        cfg = self.config
        groups = cfg.dim_spk_enc // cfg.chs_grp
        # energy mask from the INPUT mel (zeroed past the crop length)
        mask = (
            jnp.max(mel.astype(jnp.float32), axis=-1, keepdims=True) > 0.0
        ).astype(jnp.float32)                      # [B, T, 1]
        frames = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        h = mel
        for i in range(3):
            h = Conv1d(
                cfg.dim_spk_enc, kernel_size=5, w_init_gain="relu",
                dtype=self.dtype, name=f"conv_{i}",
            )(h)
            # masked group normalization (stats over valid frames only)
            b, t, c = h.shape
            hg = h.astype(jnp.float32).reshape(b, t, groups, -1)
            m = mask[..., None]
            denom = frames[..., None] * hg.shape[-1]
            mean = jnp.sum(hg * m, axis=(1, 3), keepdims=True) / denom
            var = (
                jnp.sum(jnp.square(hg - mean) * m, axis=(1, 3),
                        keepdims=True)
                / denom
            )
            hg = (hg - mean) * jax.lax.rsqrt(var + 1e-5) * m
            scale = self.param(
                f"scale_{i}", nn.initializers.ones, (c,)
            )
            bias = self.param(
                f"bias_{i}", nn.initializers.zeros, (c,)
            )
            h = jax.nn.relu(
                (hg.reshape(b, t, c) * scale + bias) * mask
            )
        h = h.astype(jnp.float32)
        mean = jnp.sum(h * mask, axis=1) / frames[:, 0]
        var = (
            jnp.sum(jnp.square(h - mean[:, None, :]) * mask, axis=1)
            / frames[:, 0]
        )
        stats = jnp.concatenate(
            [mean, jnp.sqrt(jnp.maximum(var, 1e-8))], axis=-1
        )
        emb = Linear(
            cfg.dim_spk_emb, dtype=self.dtype, name="proj"
        )(stats).astype(jnp.float32)
        return emb * jax.lax.rsqrt(
            jnp.sum(jnp.square(emb), axis=-1, keepdims=True) + 1e-8
        )

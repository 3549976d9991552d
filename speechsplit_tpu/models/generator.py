"""Top-level models: the SpeechSplit generator and the F0 converter.

Reference: Generator_3 model.py:283-320 (19,437,800 params at defaults)
and Generator_6 model.py:324-351 (3,485,849 params).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from speechsplit_tpu.config import SpeechSplitConfig, resolve_dtype
from speechsplit_tpu.models.decoders import F0Decoder, MelDecoder
from speechsplit_tpu.models.encoders import (
    ContentPitchEncoder,
    F0Encoder,
    RhythmEncoder,
    SpeakerEncoder,
)
from speechsplit_tpu.models.layers import combine_bidir, upsample_codes

Array = jax.Array


def _fuse_encoder_group(batch: int, t: int, hidden_sizes) -> bool:
    """Should the independent encoder recurrences run as ONE fused
    multi-stream Pallas kernel? Static per trace (backend + shapes).

    The encoder LSTMs are narrow (H = 1/8/32 at defaults) and therefore
    latency-bound — each costs ~0.08 ms at T=192 no matter its width —
    so running them as separate kernels serializes pure latency. The
    fused kernel interleaves all their cell chains in one grid
    (ops/pallas_multilstm.py); measured on v5e, the 3-stream group's
    forward costs 84 us vs 3 x 80 us separate.
    """
    from speechsplit_tpu.ops import pallas_lstm, pallas_multilstm

    return pallas_lstm.supported(batch, max(hidden_sizes)) and (
        pallas_multilstm.fits(t, batch, hidden_sizes)
    )


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
        if cfg.spk_emb_mode == "learned":
            # zero-shot timbre conditioning (config.spk_emb_mode); the
            # param tree only gains this branch in learned mode, so
            # onehot checkpoints are byte-identical to before
            self.speaker_encoder = SpeakerEncoder(cfg, dtype=self.dtype)

    def embed_speaker(self, mel: Array) -> Array:
        """Utterance -> unit-norm speaker embedding (learned mode only).

        Conversion-time entry point: embed ANY utterance of the target
        speaker (seen or unseen) and pass the result as ``c_trg``:
        ``module.apply(vars, mel, method="embed_speaker")``.
        """
        return self.speaker_encoder(mel)

    def __call__(
        self,
        x_f0: Array,
        x_org: Array,
        c_trg: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ) -> Array:
        """``example_ids`` names each row's global-batch position for the
        placement-invariant augmentation stream (see
        :func:`speechsplit_tpu.ops.interp.random_resample`); train-mode
        only, default ``arange(B)``."""
        cfg = self.config
        if c_trg.ndim == 3:
            # a reference MEL was passed instead of an embedding:
            # derive the timbre code from it (learned mode). Rank
            # dispatch is static under jit. Training passes the
            # batch's own x_org here (self-conditioning); conversion
            # passes the TARGET speaker's utterance — which need not
            # be the rhythm source x_org.
            if cfg.spk_emb_mode != "learned":
                raise ValueError(
                    "mel-valued c_trg requires spk_emb_mode='learned'"
                )
            c_trg = self.speaker_encoder(c_trg)
        batch, t = x_f0.shape[0], x_f0.shape[1]
        if _fuse_encoder_group(
            batch, t, (cfg.dim_neck, cfg.dim_neck_3, cfg.dim_neck_2)
        ):
            from speechsplit_tpu.ops.pallas_multilstm import (
                multi_bilstm_sequence,
            )

            # conv stacks of all three encoders, then their three
            # INDEPENDENT recurrences (content layer 0, pitch, rhythm)
            # fused into one kernel grid; content layer 1 (which needs
            # layer 0's output) runs after as a normal merged-bidir call.
            xc, xp = self.encoder_content_pitch.pre(
                x_f0, train=train, example_ids=example_ids
            )
            xr = self.encoder_rhythm.pre(x_org)
            s_c = self.encoder_content_pitch.lstm_content(
                xc, mode="streams", start_layer=0
            )
            s_p = self.encoder_content_pitch.lstm_pitch(
                xp, mode="streams", start_layer=0
            )
            s_r = self.encoder_rhythm.lstm(xr, mode="streams")
            outs = multi_bilstm_sequence(
                3,
                resolve_dtype(cfg.residual_dtype),
                s_c[0], s_c[1], s_p[0], s_p[1], s_r[0], s_r[1],
                s_c[2], s_c[3], s_p[2], s_p[3], s_r[2], s_r[3],
            )
            h_content = self.encoder_content_pitch.lstm_content(
                combine_bidir(outs[0], outs[1]), start_layer=1
            )
            codes_content, codes_pitch = self.encoder_content_pitch.codes(
                h_content, combine_bidir(outs[2], outs[3])
            )
            codes_rhythm = self.encoder_rhythm.codes(
                combine_bidir(outs[4], outs[5]), None
            )
        else:
            codes_content, codes_pitch = self.encoder_content_pitch(
                x_f0, train=train, example_ids=example_ids
            )
            codes_rhythm = self.encoder_rhythm(x_org, None)

        content = upsample_codes(codes_content, cfg.freq)
        pitch = upsample_codes(codes_pitch, cfg.freq_3)
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
        self,
        x_org: Array,
        f0_trg: Array,
        train: bool = False,
        example_ids: Optional[Array] = None,
    ) -> Array:
        cfg = self.config
        batch, t = x_org.shape[0], x_org.shape[1]
        if _fuse_encoder_group(
            batch, t, (cfg.dim_neck_3, cfg.dim_neck_2)
        ):
            from speechsplit_tpu.ops.pallas_multilstm import (
                multi_bilstm_sequence,
            )

            xf = self.encoder_f0.pre(
                f0_trg, train=train, example_ids=example_ids
            )
            xr = self.encoder_rhythm.pre(x_org)
            s_f = self.encoder_f0.lstm(xf, mode="streams")
            s_r = self.encoder_rhythm.lstm(xr, mode="streams")
            outs = multi_bilstm_sequence(
                2,
                resolve_dtype(cfg.residual_dtype),
                s_f[0], s_f[1], s_r[0], s_r[1],
                s_f[2], s_f[3], s_r[2], s_r[3],
            )
            codes_f0 = self.encoder_f0.codes(
                combine_bidir(outs[0], outs[1])
            )
            codes_rhythm = self.encoder_rhythm.codes(
                combine_bidir(outs[2], outs[3]), None
            )
        else:
            codes_rhythm = self.encoder_rhythm(x_org, None)
            codes_f0 = self.encoder_f0(
                f0_trg, train=train, example_ids=example_ids
            )

        rhythm = upsample_codes(codes_rhythm, cfg.freq_2)
        pitch = upsample_codes(codes_f0, cfg.freq_3)

        decoder_in = jnp.concatenate([rhythm, pitch], axis=-1)
        return self.decoder(decoder_in)

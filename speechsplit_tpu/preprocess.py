"""Batched feature extraction: wav -> (mel, normalized log-F0) on device.

Rebuilds the reference's preprocessing chain (make_spect_f0.py) as a
batched TPU pipeline instead of a serial per-file host loop:

  reference (per file, host):            here (per batch, device):
    scipy filtfilt high-pass               FFT zero-phase high-pass
    *0.96 + seeded dither                  *0.96 + PRNG dither
    pySTFT -> mel -> dB -> [0,1]           one jitted mel front-end
    pysptk RAPT -> log-F0                  NCCF+Viterbi tracker
    per-utterance mean/std norm            masked mean/std on device

Speaker gender selects the F0 search range (M: 50-250 Hz, F: 100-600 Hz —
make_spect_f0.py:40-45). Frame alignment mel<->F0 holds by construction
(both produce N//hop + 1 frames), so the reference's append-a-sample hack
for N % 256 == 0 (make_spect_f0.py:52-53) is unnecessary here.

Host-side file walking, wav decoding and .npy writing live in
:mod:`speechsplit_tpu.data.prepare`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.ops.filters import zero_phase_highpass
from speechsplit_tpu.ops.pitch import UNVOICED_LOG_F0, track_pitch
from speechsplit_tpu.ops.stft import mel_spectrogram

Array = jax.Array

GENDER_F0_RANGE = {"M": (50.0, 250.0), "F": (100.0, 600.0)}


@functools.partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "n_fft", "hop", "n_mels", "order",
        "fmin", "fmax", "cutoff", "dither", "gain",
    ),
)
def extract_features(
    wavs: Array,
    lengths: Array,
    f0_lo: Array,
    f0_hi: Array,
    dither_key: Array,
    *,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
    cutoff: float = 30.0,
    order: int = 5,
    dither: float = 1e-6,
    gain: float = 0.96,
) -> Tuple[Array, Array]:
    """One fused pass over a padded batch of waveforms.

    Args:
      wavs: ``[B, N]`` float32 in [-1, 1], zero-padded.
      lengths: ``[B]`` true sample counts.
      f0_lo, f0_hi: ``[B]`` per-utterance pitch search bounds (Hz).
      dither_key: PRNG key for the dither noise (the reference seeds a
        numpy RandomState per speaker, make_spect_f0.py:47,55; here the
        caller derives one key per utterance batch).

    Returns:
      mel: ``[B, T, n_mels]`` normalized to [0, 1] (frames past each
        utterance's end are garbage — mask with ``frame_count``).
      f0_norm: ``[B, T]`` speaker-normalized log-F0 in [0, 1], with 0 at
        unvoiced frames... actually the reference keeps the raw -1e10
        sentinel at unvoiced frames after normalization (utils.py:35-42
        touches voiced entries only); so do we.
    """
    batch, _ = wavs.shape

    # high-pass + gain + dither (make_spect_f0.py:54-55)
    y = zero_phase_highpass(
        wavs, lengths, cutoff=cutoff, fs=float(sample_rate), order=order
    )
    noise = (
        jax.random.uniform(dither_key, wavs.shape) - 0.5
    ) * 2.0 * dither
    y = y * gain + noise

    mel = mel_spectrogram(
        y,
        sample_rate=sample_rate,
        n_fft=n_fft,
        hop=hop,
        n_mels=n_mels,
        fmin=fmin,
        fmax=fmax,
    )

    logf0 = track_pitch(
        y, lengths, f0_lo, f0_hi, sample_rate=sample_rate, hop=hop
    )

    # per-utterance speaker normalization over voiced frames
    voiced = logf0 > -1e9
    count = jnp.maximum(voiced.sum(axis=1, keepdims=True), 1)
    mean = jnp.sum(jnp.where(voiced, logf0, 0.0), axis=1, keepdims=True) / count
    var = (
        jnp.sum(
            jnp.where(voiced, jnp.square(logf0 - mean), 0.0), axis=1,
            keepdims=True,
        )
        / count
    )
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    norm = jnp.clip((logf0 - mean) / std / 4.0, -1.0, 1.0)
    norm = (norm + 1.0) / 2.0
    f0_norm = jnp.where(voiced, norm, UNVOICED_LOG_F0)

    return mel, f0_norm


def frame_count(length: int, hop: int = 256) -> int:
    """Frames produced for a signal of ``length`` samples."""
    return length // hop + 1


def pad_batch(wavs: list[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of 1-D waveforms to a common multiple-of-hop length."""
    lengths = np.array([len(w) for w in wavs], np.int32)
    n = int(lengths.max())
    n = ((n + 255) // 256) * 256  # keep frame math uniform
    out = np.zeros((len(wavs), n), np.float32)
    for i, w in enumerate(wavs):
        out[i, : len(w)] = w
    return out, lengths

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


@functools.lru_cache(maxsize=8)
def _stft_bin_gain(
    cutoff: float, fs: float, order: int, n_fft: int
) -> np.ndarray:
    """|H(w)|^2 of the zero-phase high-pass at STFT bin frequencies."""
    from scipy import signal as sp_signal

    from speechsplit_tpu.ops.filters import butter_highpass

    b, a = butter_highpass(cutoff, fs, order)
    freqs = np.fft.rfftfreq(n_fft) * 2.0 * np.pi
    _, h = sp_signal.freqz(b, a, worN=freqs)
    return (h * np.conj(h)).real.astype(np.float32)


def _extract_core(
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
    highpass_mode: str = "stft",
    pitch_params=None,
) -> Tuple[Array, Array]:
    """One fused pass over a padded batch of waveforms.

    Args:
      wavs: ``[B, N]`` float32 in [-1, 1], zero-padded.
      lengths: ``[B]`` true sample counts.
      f0_lo, f0_hi: ``[B]`` per-utterance pitch search bounds (Hz).
      dither_key: PRNG key for the dither noise (the reference seeds a
        numpy RandomState per speaker, make_spect_f0.py:47,55; here the
        caller derives one key per utterance batch).
      highpass_mode: how the 30 Hz zero-phase high-pass is realized.
        "stft" (production): the filter's |H|^2 multiplies STFT bins
        before the mel projection (zero extra cost — TPU 1D FFTs are
        slow, and the filter only acts below the 90 Hz mel floor), and
        the pitch tracker's mean-subtracted NCCF provides the rumble
        immunity the time-domain filter existed for. "time" (exact):
        the frequency-domain filtfilt equivalent on the waveform
        (~4x slower end to end; matches the reference wav-domain
        semantics; mel outputs of the two modes agree to ~1e-4 MAE,
        tests/test_preprocess_modes.py).

    Returns:
      mel: ``[B, T, n_mels]`` normalized to [0, 1] (frames past each
        utterance's end are garbage — mask with ``frame_count``).
      f0_norm: ``[B, T]`` speaker-normalized log-F0 in [0, 1], with the
        raw -1e10 sentinel kept at unvoiced frames (the reference's
        normalization touches voiced entries only, utils.py:35-42).
    """
    batch, _ = wavs.shape
    if wavs.dtype == jnp.int16:
        # PCM16 feed: callers may upload raw int16 samples (half the
        # host->device bytes — the upload dominates end-to-end
        # preprocessing on slow links) and convert here. Bit-identical
        # to a host-side conversion: every int16/32768 is exactly
        # representable in float32.
        wavs = wavs.astype(jnp.float32) / 32768.0

    # gain + dither (make_spect_f0.py:55); high-pass per mode
    noise = (
        jax.random.uniform(dither_key, wavs.shape) - 0.5
    ) * 2.0 * dither
    if highpass_mode == "time":
        y = zero_phase_highpass(
            wavs, lengths, cutoff=cutoff, fs=float(sample_rate),
            order=order,
        )
        y = y * gain + noise
        bin_gain = None
    elif highpass_mode == "stft":
        y = wavs * gain + noise
        bin_gain = jnp.asarray(
            _stft_bin_gain(cutoff, float(sample_rate), order, n_fft)
        )
    else:
        raise ValueError(highpass_mode)

    mel = mel_spectrogram(
        y,
        sample_rate=sample_rate,
        n_fft=n_fft,
        hop=hop,
        n_mels=n_mels,
        fmin=fmin,
        fmax=fmax,
        bin_gain=bin_gain,
    )

    if pitch_params is None:
        from speechsplit_tpu.ops.pitch import PitchParams

        pitch_params = PitchParams()
    logf0 = track_pitch(
        y, lengths, f0_lo, f0_hi, sample_rate=sample_rate, hop=hop,
        params=pitch_params,
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


extract_features = jax.jit(
    _extract_core,
    static_argnames=(
        "sample_rate", "n_fft", "hop", "n_mels", "order",
        "fmin", "fmax", "cutoff", "dither", "gain", "highpass_mode",
        "pitch_params",
    ),
)
extract_features.__doc__ = _extract_core.__doc__


@functools.partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "n_fft", "hop", "n_mels", "order",
        "fmin", "fmax", "cutoff", "dither", "gain", "highpass_mode",
        "pitch_params", "compress",
    ),
)
def extract_features_scan(
    wavs: Array,
    lengths: Array,
    f0_lo: Array,
    f0_hi: Array,
    dither_key: Array,
    *,
    compress: bool = False,
    **static,
) -> Tuple[Array, Array]:
    """K batches of feature extraction in ONE device program.

    Like :func:`extract_features` but over a staged super-batch
    ``wavs [K, B, N]`` / ``lengths, f0_lo, f0_hi [K, B]`` — a
    ``lax.scan`` advances the K batches inside one XLA program, so a
    dispatch's fixed host cost (~30+ ms through this environment's
    device tunnel; BENCHMARKS.md "Device profile") is paid once per K
    batches instead of once per batch, and the scan hoists
    loop-invariant setup. Per-batch numerics are IDENTICAL to
    extract_features with ``jax.random.fold_in(dither_key, k)`` as the
    per-batch key (pinned by tests/test_preprocess_modes.py).

    ``compress=True`` returns bfloat16 mel/f0 (halves the result-fetch
    bytes on slow host links; ~1e-3 rounding on the [0,1] mel scale —
    the same trade as the conversion CLI's --compress_results).

    Returns (mel [K, B, T, M], f0 [K, B, T]).
    """

    def body(_, xs):
        wav_k, len_k, lo_k, hi_k, key_k = xs
        mel, f0 = _extract_core(
            wav_k, len_k, lo_k, hi_k, key_k, **static
        )
        if compress:
            # keep the unvoiced sentinel exactly representable
            f0 = jnp.where(
                f0 < -1e9, jnp.bfloat16(-1e10), f0.astype(jnp.bfloat16)
            )
            mel = mel.astype(jnp.bfloat16)
        return 0.0, (mel, f0)

    k = wavs.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(dither_key, i))(
        jnp.arange(k)
    )
    _, (mel, f0) = jax.lax.scan(
        body, 0.0, (wavs, lengths, f0_lo, f0_hi, keys)
    )
    return mel, f0


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "sample_rate", "n_fft", "hop", "n_mels", "order",
        "fmin", "fmax", "cutoff", "dither", "gain", "highpass_mode",
    ),
)
def extract_into_store(
    mel_store: Array,
    f0_store: Array,
    wavs: Array,
    lengths: Array,
    f0_lo: Array,
    f0_hi: Array,
    uids: Array,
    dither_key: Array,
    **static,
) -> Tuple[Array, Array]:
    """K staged batches extracted and scattered straight into a
    device-resident feature store — features never leave the device.

    The archival pipeline (prepare.extract_dir) fetches every result
    batch to the host to write ``.npy`` trees; when the features are
    only needed for training (data/resident.py) that fetch is pure
    waste — on hosted/tunneled TPU links it is the single largest cost
    of the whole data path (BENCHMARKS.md "scale rehearsal": 288 s of
    a 316 s preprocessing run was result fetch). This program replaces
    fetch + re-upload with an in-graph scatter: scan over the K batches
    (identical numerics/keys to :func:`extract_features_scan`), mask
    each utterance past its true frame count (zero mel / unvoiced-
    sentinel F0 — exactly the padding build_resident applies on the
    host), cast to the store dtype, and row-scatter at
    ``[uid, 0:T_batch]``. Both stores are donated, so the update is
    in-place in HBM across calls.

    Args:
      mel_store: ``[U, T_pad, n_mels]`` store-dtype buffer (donated).
      f0_store: ``[U, T_pad]`` store-dtype buffer (donated).
      wavs / lengths / f0_lo / f0_hi / dither_key: as
        :func:`extract_features_scan` (``[K, B, N]`` / ``[K, B]``).
      uids: ``[K, B]`` int32 row ids into the store. Rows with
        ``uid >= U`` are DROPPED (scatter mode="drop") — callers pad
        staged groups to full depth with repeated batches (see
        prepare.extract_dir) and mark the padding rows with ``uid = U``
        so their (different-dither) duplicates never land.

    Returns the updated (mel_store, f0_store).
    """
    hop = static.get("hop", 256)

    def body(stores, xs):
        mel_s, f0_s = stores
        wav_k, len_k, lo_k, hi_k, uid_k, key_k = xs
        mel, f0 = _extract_core(wav_k, len_k, lo_k, hi_k, key_k, **static)
        t = mel.shape[1]
        frames = len_k // hop + 1
        keep = jnp.arange(t)[None, :] < frames[:, None]
        mel = jnp.where(keep[..., None], mel, 0.0).astype(mel_s.dtype)
        f0 = jnp.where(keep, f0, UNVOICED_LOG_F0).astype(f0_s.dtype)
        mel_s = mel_s.at[uid_k, :t].set(mel, mode="drop")
        f0_s = f0_s.at[uid_k, :t].set(f0, mode="drop")
        return (mel_s, f0_s), 0.0

    k = wavs.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(dither_key, i))(
        jnp.arange(k)
    )
    (mel_store, f0_store), _ = jax.lax.scan(
        body,
        (mel_store, f0_store),
        (wavs, lengths, f0_lo, f0_hi, uids, keys),
    )
    return mel_store, f0_store


def frame_count(length: int, hop: int = 256) -> int:
    """Frames produced for a signal of ``length`` samples."""
    return length // hop + 1


def pad_batch(
    wavs: list[np.ndarray], bucket: int = 32768
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of 1-D waveforms to a common bucketed length.

    Rounding the padded length up to a multiple of ``bucket`` (~2 s at
    16 kHz) keeps the number of distinct compiled shapes small across a
    variable-length corpus — each distinct batch shape costs a fresh
    XLA compilation of the whole feature pipeline. Outputs are exact:
    true lengths are returned and everything downstream masks by them.
    """
    lengths = np.array([len(w) for w in wavs], np.int32)
    n = int(lengths.max())
    n = ((n + bucket - 1) // bucket) * bucket
    # preserve an all-PCM16 batch: the extractors convert on device
    # (same exact numerics, half the upload bytes)
    dtype = (
        np.int16
        if all(w.dtype == np.int16 for w in wavs)
        else np.float32
    )
    out = np.zeros((len(wavs), n), dtype)
    for i, w in enumerate(wavs):
        if dtype == np.float32 and w.dtype == np.int16:
            # mixed batch fell back to float32: scale the PCM16 rows
            # here — the device extractor only rescales whole-int16
            # batches, so raw +-32768 samples would otherwise flow
            # through as float amplitudes
            out[i, : len(w)] = w / np.float32(32768.0)
        else:
            out[i, : len(w)] = w
    return out, lengths

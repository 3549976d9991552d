"""Batched on-device STFT + mel front-end.

Reference pipeline being rebuilt (make_spect_f0.py:15-16,58-61 and
utils.py:18-31): reflect-padded magnitude STFT (1024-pt FFT, hop 256,
periodic Hann), Slaney-scale mel filterbank (80 bins, 90–7600 Hz),
``20*log10(max(1e-5, .)) - 16`` dB compression, then ``(dB+100)/100``
into [0, 1].

TPU-first design: framing is gather-free (hop-aligned reshape+concat
windows, ``strided_windows``), the window multiply fuses
with the rfft, and the mel projection is a single ``[F, n_fft/2+1] @
[n_fft/2+1, n_mels]`` matmul on the MXU. Everything is batched over
utterances; no per-file Python loop (the reference preprocesses serially,
make_spect_f0.py:48-74).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', n, fftbins=True)``)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float32
    )


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney auditory-toolbox mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    mels = f / f_sp
    above = f >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    freqs = m * f_sp
    above = m >= min_log_mel
    return np.where(
        above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_filterbank(
    sample_rate: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> np.ndarray:
    """Triangular mel filterbank, Slaney scale + Slaney area-normalization.

    Matches the semantics of the filterbank the reference builds
    (make_spect_f0.py:15). Returns ``[n_fft//2 + 1, n_mels]`` float32 —
    already transposed for a frames @ basis matmul.
    """
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = _mel_to_hz_slaney(
        np.linspace(
            _hz_to_mel_slaney(np.array(fmin))[()],
            _hz_to_mel_slaney(np.array(fmax))[()],
            n_mels + 2,
        )
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]  # [n_mels+2, F]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, F]
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [F, n_mels]


def strided_windows(x: Array, n_frames: int, hop: int, span: int) -> Array:
    """Gather-free overlapping windows: out[..., t, j] = x[..., t*hop + j].

    TPU gathers are scalar-issue (~12 ns/element): the old
    ``x[starts[:, None] + arange(span)]`` framing cost 0.47 ms/batch in
    the preprocessing profile, and the same pattern on the NCCF prefix
    sums two more gathers (BENCHMARKS.md round-3 preprocessing
    profile). Because the window starts are hop-aligned, the windows
    are concatenations of ceil(span/hop) consecutive hop-sized blocks,
    so a reshape + static slices + one concat produces them with zero
    gathers. Values are bit-identical to the gather form; positions
    past ``len(x)`` read zeros (callers must not depend on them, same
    contract as the zero-padded gather form).
    """
    nblk = -(-span // hop)
    need = (n_frames + nblk) * hop
    n = x.shape[-1]
    if need > n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - n)])
    else:
        x = x[..., :need]
    xr = x.reshape(*x.shape[:-1], n_frames + nblk, hop)
    parts = [xr[..., i : i + n_frames, :] for i in range(nblk)]
    return jnp.concatenate(parts, axis=-1)[..., :span]


def frame_signal(x: Array, n_fft: int, hop: int) -> Array:
    """Reflect-pad by n_fft//2 and slice into overlapping frames.

    x: [..., N] -> frames [..., n_frames, n_fft] with
    n_frames = N // hop + 1 (reference framing math, utils.py:20-26).
    """
    pad = n_fft // 2
    x = jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
        mode="reflect",
    )
    n = x.shape[-1]
    n_frames = (n - (n_fft - hop)) // hop
    return strided_windows(x, n_frames, hop, n_fft)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def magnitude_stft(x: Array, n_fft: int = 1024, hop: int = 256) -> Array:
    """|STFT| of [..., N] -> [..., n_frames, n_fft//2+1] (utils.py:18-31)."""
    frames = frame_signal(x, n_fft, hop)
    window = jnp.asarray(hann_window(n_fft))
    return jnp.abs(jnp.fft.rfft(frames * window, n=n_fft, axis=-1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop", "n_mels", "sample_rate", "fmin", "fmax",
        "ref_level_db",
    ),
)
def mel_spectrogram(
    x: Array,
    *,
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
    ref_level_db: float = 16.0,
    bin_gain: Array | None = None,
) -> Array:
    """Full mel front-end: wav [..., N] -> normalized mel [..., T, n_mels].

    dB compression and [0,1] normalization follow make_spect_f0.py:58-61:
    ``S = (20*log10(max(1e-5, |STFT| @ mel)) - 16 + 100) / 100``.

    ``bin_gain`` ([n_fft//2+1]) multiplies each STFT bin before the mel
    projection — used to apply the 30 Hz zero-phase high-pass spectrally
    at zero cost (it folds into the mel basis matmul); see
    preprocess.extract_features.
    """
    spec = magnitude_stft(x, n_fft, hop)
    basis = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    )
    if bin_gain is not None:
        basis = bin_gain[:, None] * basis
    mel = jnp.dot(spec, basis, preferred_element_type=jnp.float32)
    min_level = math.exp(-100.0 / 20.0 * math.log(10.0))
    db = 20.0 * jnp.log10(jnp.maximum(min_level, mel)) - ref_level_db
    return (db + 100.0) / 100.0

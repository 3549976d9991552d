"""Mel -> waveform synthesis.

The reference delegates waveform synthesis to an external autoregressive
WaveNet package (demo.ipynb cell-1, wavenet_vocoder==0.1.1 per
README.md:32-44) and ships no vocoder of its own. This module provides:

1. the same interface boundary (``Vocoder``: normalized mel [T, 80] ->
   waveform @16 kHz), so any neural vocoder can plug in; and
2. a built-in, dependency-free ``GriffinLimVocoder``: pseudo-inverse mel
   projection (cf. FreeV, arXiv:2406.08196 — pseudo-inverse mel as a
   free initialization) + batched Griffin-Lim phase recovery, fully
   jitted. Quality is below a neural vocoder's but it turns converted
   mels into audible wavs on-device with zero external weights — unlike
   the reference, which cannot synthesize at all without a 1M-step
   WaveNet checkpoint downloaded out of band.

The dB/normalization conventions inverted here are exactly the front-end's
(make_spect_f0.py:58-61): mel_amp = 10^((S*100 - 100 + 16)/20).
"""

from __future__ import annotations

import functools
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from speechsplit_tpu.ops.stft import hann_window, mel_filterbank

Array = jax.Array


class Vocoder(Protocol):
    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """normalized mel [T, 80] -> waveform [N] float32 @ sample_rate."""


def _overlap_add(frames: Array, hop: int) -> Array:
    """Scatter-free overlap-add: [..., T, n_fft] -> [..., n_fft+(T-1)*hop].

    TPU scatters are scalar-issue (the old ``buf.at[idx].add`` over
    T*n_fft elements was the dominant cost of every iSTFT, and
    Griffin-Lim runs one per iteration). With hop | n_fft each frame
    is n_fft//hop hop-sized blocks and block i of frame t lands at
    output block t+i, so the whole scatter is nblk shifted pads summed
    together — static ops only. Float-identical to the scatter up to
    addition order at overlapped samples.
    """
    t, n_fft = frames.shape[-2:]
    assert n_fft % hop == 0, (n_fft, hop)
    nblk = n_fft // hop
    chunks = frames.reshape(*frames.shape[:-1], nblk, hop)
    pad0 = [(0, 0)] * (frames.ndim - 2)
    parts = [
        jnp.pad(chunks[..., i, :], pad0 + [(i, nblk - 1 - i), (0, 0)])
        for i in range(nblk)
    ]
    out = functools.reduce(jnp.add, parts)
    return out.reshape(*frames.shape[:-2], (t + nblk - 1) * hop)


def _istft(spec: Array, n_fft: int, hop: int) -> Array:
    """Inverse STFT with Hann overlap-add (synthesis-window normalized).

    spec: [..., T, n_fft//2+1] complex -> [..., (T-1)*hop] (center-trimmed
    to mirror the forward transform's reflect padding).
    """
    window = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    t = frames.shape[-2]

    sig = _overlap_add(frames, hop)
    wsum = _overlap_add(jnp.tile(window**2, (t, 1)), hop)
    sig = sig / jnp.maximum(wsum, 1e-8)
    pad = n_fft // 2
    return sig[..., pad : pad + (t - 1) * hop]


def _stft_complex(x: Array, n_fft: int, hop: int) -> Array:
    from speechsplit_tpu.ops.stft import frame_signal

    window = jnp.asarray(hann_window(n_fft))
    frames = frame_signal(x, n_fft, hop)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "n_iter", "momentum")
)
def griffin_lim(
    magnitude: Array,
    key: Array,
    n_fft: int = 1024,
    hop: int = 256,
    n_iter: int = 60,
    momentum: float = 0.99,
) -> Array:
    """Phase recovery from |STFT| [..., T, F] via fast Griffin-Lim
    (momentum acceleration per Perraudin et al. 2013)."""
    phase = (
        jax.random.uniform(key, magnitude.shape) * 2.0 * jnp.pi
    )
    spec = magnitude * jnp.exp(1j * phase)

    def project(spec):
        x = _istft(spec, n_fft, hop)
        rebuilt = _stft_complex(x, n_fft, hop)
        rebuilt = rebuilt[..., : magnitude.shape[-2], :]
        new_phase = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-8)
        return magnitude * new_phase

    def body(_, carry):
        spec, prev = carry
        proj = project(spec)
        accel = proj + momentum * (proj - prev)
        return accel, proj

    spec, proj = jax.lax.fori_loop(
        0, n_iter, body, (spec, spec)
    )
    return _istft(proj, n_fft, hop)


def mel_consistency_project(
    spec0: Array,
    mel_amp: Array,
    basis: Array,
    n_fft: int,
    hop: int,
    n_iter: int,
    momentum: float = 0.99,
) -> Array:
    """Iterate the mel-consistency projection from a given complex spec.

    Each iteration renders the spectrum to a waveform, re-analyzes it,
    and multiplicatively re-scales the rebuilt magnitudes so their mel
    projection matches ``mel_amp`` (phase is whatever the signal round
    trip produced — a Griffin-Lim step and a mel-domain magnitude
    projection in one). With momentum acceleration (Perraudin et al.
    2013). spec0 [B, T, F] complex, mel_amp [B, T, M], basis [F, M];
    returns the projected spectrum [B, T, F] complex.

    Shared by :func:`mel_griffin_lim` (random-phase init, ~50 iters)
    and the neural vocoder's refinement mode (model-predicted phase
    init, 1-4 iters — vocoder_neural.NeuralVocoder(refine_iters=...)).
    """
    weight = jnp.maximum(jnp.sum(basis, axis=1), 1e-8)[None, None, :]
    t_frames = mel_amp.shape[-2]

    def project(spec):
        x = _istft(spec, n_fft, hop)
        rebuilt = _stft_complex(x, n_fft, hop)[..., :t_frames, :]
        mag_r = jnp.maximum(jnp.abs(rebuilt), 1e-8)
        mel_now = jnp.maximum(mag_r @ basis, 1e-8)  # [B, T, M]
        ratio = mel_amp / mel_now
        corr = (ratio @ basis.T) / weight  # weighted mean ratio per bin
        return mag_r * corr * (rebuilt / mag_r)

    def body(_, carry):
        spec, prev = carry
        proj = project(spec)
        return proj + momentum * (proj - prev), proj

    _, proj = jax.lax.fori_loop(0, n_iter, body, (spec0, spec0))
    return proj


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "n_iter", "momentum")
)
def mel_griffin_lim(
    mel_amp: Array,
    basis: Array,
    inv_basis: Array,
    key: Array,
    n_fft: int = 1024,
    hop: int = 256,
    n_iter: int = 60,
    momentum: float = 0.99,
) -> Array:
    """Mel-consistency-projected fast Griffin-Lim.

    Plain Griffin-Lim over a pseudo-inverse-mel magnitude keeps whatever
    spectral smearing the pinv introduced (~5 dB mean mel error). Here
    every iteration re-scales the rebuilt magnitudes so their mel
    projection matches the target (a multiplicative mel-domain
    projection), which cuts the resynthesis mel error several-fold.

    mel_amp: [B, T, M] linear-amplitude mel targets; basis [F, M];
    inv_basis [M, F]. Returns waveforms [B, N].
    """
    mag0 = jnp.maximum(mel_amp @ inv_basis, 1e-8)  # [B, T, F]
    phase = jax.random.uniform(key, mag0.shape) * 2.0 * jnp.pi
    spec0 = mag0 * jnp.exp(1j * phase)
    proj = mel_consistency_project(
        spec0, mel_amp, basis, n_fft, hop, n_iter, momentum
    )
    return _istft(proj, n_fft, hop)


@jax.jit
def _peak_norm_pcm16(wavs: Array, n_samples: Array) -> Array:
    """Per-utterance peak-normalize to 0.9 and quantize to int16 ON
    DEVICE: [B, N] f32 + [B] true sample counts -> [B, N] int16.

    The float path does the identical normalization on host
    (``w / peak * 0.9``) and the CLIs then write
    ``(w * 32767).astype(int16)``; doing both on device quarters the
    waveform fetch bytes (the dominant end-to-end cost — BENCHMARKS.md
    "Vocoder batched synthesis"). One deliberate difference: this path
    ROUNDS to the nearest code where numpy's astype truncates toward
    zero — up to half an LSB better, never worse.
    """
    idx = jnp.arange(wavs.shape[1])[None, :]
    mask = idx < n_samples[:, None]
    peak = jnp.max(jnp.abs(wavs) * mask, axis=1)
    scale = 0.9 * 32767.0 / jnp.maximum(peak, 1e-5)
    q = jnp.clip(jnp.round(wavs * scale[:, None]), -32768.0, 32767.0)
    return q.astype(jnp.int16)


class GriffinLimVocoder:
    """Pseudo-inverse-mel + Griffin-Lim synthesis (see module docstring)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 1024,
        hop: int = 256,
        n_mels: int = 80,
        fmin: float = 90.0,
        fmax: float = 7600.0,
        ref_level_db: float = 16.0,
        n_iter: int = 100,  # iterations are ~60 us since the
        # scatter-free overlap-add — 100 costs ~2.7 ms over 50 and
        # reaches 0.182 dB mel error (BENCHMARKS.md 'Vocoder quality')
        seed: int = 0,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop = hop
        self.ref_level_db = ref_level_db
        self.n_iter = n_iter
        self.key = jax.random.PRNGKey(seed)
        basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
        self.basis = jnp.asarray(basis)  # [F, n_mels]
        # pinv: [n_mels, F], clipped non-negative (init only; the loop
        # enforces mel consistency directly)
        self.inv_basis = jnp.asarray(
            np.maximum(np.linalg.pinv(basis), 0.0), jnp.float32
        )

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        return self.synthesize_batch([np.asarray(mel)])[0]

    def synthesize_batch(
        self, mels: "list[np.ndarray]", pcm16: bool = False
    ) -> "list[np.ndarray]":
        """Synthesize many mels in one device call (padded to a common
        BUCKETED length, trimmed per input). Per-call cost is dominated
        by the iterative STFT loop, so batching ~linearly increases
        throughput; bucketing the padded length to 32-frame (~0.5 s)
        boundaries caps the number of distinct compiled programs across
        a corpus of arbitrary utterance lengths (one compile per bucket
        instead of per length). Padding frames are zero = the
        normalized scale's silence floor; outputs are trimmed to each
        input's true sample count.

        ``pcm16=True`` peak-normalizes and quantizes ON DEVICE and
        returns int16 arrays — 4x fewer fetch bytes, for callers that
        write PCM16 wavs anyway (cli/convert, cli/serve)."""
        t_max = -(-max(len(m) for m in mels) // 32) * 32
        batch = np.zeros((len(mels), t_max, mels[0].shape[1]), np.float32)
        for i, m in enumerate(mels):
            batch[i, : len(m)] = m
        db = jnp.asarray(batch) * 100.0 - 100.0 + self.ref_level_db
        amp = jnp.power(10.0, db / 20.0)  # [B, T, 80]
        wavs = mel_griffin_lim(
            amp, self.basis, self.inv_basis, self.key,
            self.n_fft, self.hop, self.n_iter,
        )
        lens = np.array([(len(m) - 1) * self.hop for m in mels])
        if pcm16:
            q = np.asarray(_peak_norm_pcm16(wavs, jnp.asarray(lens)))
            return [q[i, :n] for i, n in enumerate(lens)]
        wavs = np.asarray(wavs, np.float32)
        out = []
        for i, n in enumerate(lens):
            w = wavs[i, :n]
            peak = max(float(np.abs(w).max()), 1e-5)
            out.append((w / peak * 0.9).astype(np.float32))
        return out

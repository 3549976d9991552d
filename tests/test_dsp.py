"""DSP front-end parity against scipy/numpy oracles.

The STFT oracle is an independent naive numpy implementation of the
documented behavior (reflect pad, periodic Hann, rfft magnitude); the
filter oracle is scipy.signal.filtfilt itself.
"""

import numpy as np
import pytest
from scipy import signal as sp_signal

import jax
import jax.numpy as jnp

from speechsplit_tpu.ops.filters import (
    butter_highpass,
    filtfilt,
    highpass_filtfilt,
)
from speechsplit_tpu.ops.quantize import (
    quantize_f0,
    quantize_f0_onehot,
    speaker_normalization,
)
from speechsplit_tpu.ops.stft import (
    hann_window,
    magnitude_stft,
    mel_filterbank,
    mel_spectrogram,
)


def _naive_stft(x, n_fft=1024, hop=256):
    x = np.pad(x, n_fft // 2, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = (len(x) - (n_fft - hop)) // hop
    out = np.empty((n_frames, n_fft // 2 + 1))
    for m in range(n_frames):
        seg = x[m * hop : m * hop + n_fft] * win
        out[m] = np.abs(np.fft.rfft(seg))
    return out


def test_magnitude_stft_matches_naive(rng):
    x = rng.randn(16000 + 57).astype(np.float32)
    expected = _naive_stft(x)
    got = np.asarray(magnitude_stft(jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-4)


def test_strided_windows_matches_gather(rng):
    """The gather-free framing must be bit-identical to the index form
    x[starts[:, None] + arange(span)], including span > hop overlap,
    span == hop, batch dims, and zero-reads past the signal end."""
    from speechsplit_tpu.ops.stft import strided_windows

    for shape, hop, span, t in [
        ((2, 5000), 256, 1024, 17),
        ((5000,), 256, 440, 18),
        ((3, 2, 1000), 100, 100, 9),
        ((700,), 256, 295, 3),
    ]:
        x = rng.randn(*shape).astype(np.float32)
        got = np.asarray(
            strided_windows(jnp.asarray(x), t, hop, span)
        )
        pad = max(0, (t - 1) * hop + span - shape[-1])
        xp = np.concatenate(
            [x, np.zeros(shape[:-1] + (pad,), np.float32)], axis=-1
        )
        idx = np.arange(t)[:, None] * hop + np.arange(span)[None, :]
        np.testing.assert_array_equal(got, xp[..., idx])


def test_stft_frame_count_matches_reference_hop_math(rng):
    # the reference asserts len(mel) == len(f0) with f0 frames = N//hop+1
    # for the length-adjusted signal (make_spect_f0.py:52-53,69)
    for n in [16000, 16001, 40960 + 1]:
        x = rng.randn(n).astype(np.float32)
        got = np.asarray(magnitude_stft(jnp.asarray(x)))
        assert got.shape[0] == n // 256 + 1


def test_hann_window_periodic():
    w = hann_window(1024)
    expected = sp_signal.get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_mel_filterbank_structure():
    fb = mel_filterbank()  # [513, 80]
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every filter has support and triangles overlap adjacent bins
    assert (fb.sum(axis=0) > 0).all()
    # filters cover only 90-7600 Hz
    freqs = np.linspace(0, 8000, 513)
    active = fb.sum(axis=1) > 0
    assert freqs[active].min() >= 90 - 16
    assert freqs[active].max() <= 7600 + 16
    # Slaney normalization: each filter integrates to ~2/width in Hz
    # => peak values shrink with center frequency
    peaks = fb.max(axis=0)
    assert peaks[0] > peaks[-1]


def test_mel_spectrogram_range_and_shape(rng):
    x = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    mels = np.asarray(mel_spectrogram(jnp.asarray(x)))
    assert mels.shape == (2, 16000 // 256 + 1, 80)
    # normalized dB in roughly [0, 1] for sane signals
    assert mels.min() >= -0.2 and mels.max() <= 1.2


def test_filtfilt_matches_scipy(rng):
    b, a = butter_highpass(30, 16000, order=5)
    x = rng.randn(4096).astype(np.float64) * 0.5
    expected = sp_signal.filtfilt(b, a, x)
    with jax.enable_x64(True):
        got = np.asarray(filtfilt(b, a, jnp.asarray(x, jnp.float64)))
    # the 30 Hz/16 kHz high-pass recurrence is ill-conditioned; identical
    # math in a different summation order drifts ~1e-7 in float64
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sosfiltfilt_matches_scipy_float64(rng):
    from speechsplit_tpu.ops.filters import butter_highpass_sos, sosfiltfilt

    sos = butter_highpass_sos(30, 16000, order=5)
    x = rng.randn(4096).astype(np.float64) * 0.5
    expected = sp_signal.sosfiltfilt(sos, x)
    with jax.enable_x64(True):
        got = np.asarray(sosfiltfilt(sos, jnp.asarray(x, jnp.float64)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_zero_phase_highpass_matches_padded_filtfilt(rng):
    """The TPU FFT path must match scipy filtfilt with adequate padding.

    (scipy's *default* padlen=18 is far too short for a 30 Hz high-pass
    and leaves edge transients; the reference inherits that. We compare
    against the well-padded gold standard.)
    """
    from speechsplit_tpu.ops.filters import zero_phase_highpass

    b, a = butter_highpass(30, 16000, order=5)
    lengths = [30000, 50000]
    n_pad = 50000
    xs = [(rng.randn(L) * 0.3).astype(np.float32) for L in lengths]
    x = np.zeros((2, n_pad), np.float32)
    for i, s in enumerate(xs):
        x[i, : len(s)] = s

    got = np.asarray(
        zero_phase_highpass(jnp.asarray(x), jnp.asarray(lengths))
    )
    for i, s in enumerate(xs):
        expected = sp_signal.filtfilt(
            b, a, s.astype(np.float64), padlen=8192
        )
        assert np.abs(got[i, : lengths[i]] - expected).max() < 2e-4
        # padding region stays zero
        if lengths[i] < n_pad:
            assert np.abs(got[i, lengths[i] :]).max() == 0.0


def test_quantize_f0_matches_reference_semantics(rng):
    # independent oracle: straightforward numpy per utils.py:46-58 contract
    x = np.concatenate(
        [rng.uniform(0, 1, 50), np.full(10, -1e10), [0.0, 1.0]]
    ).astype(np.float32)
    ids = np.asarray(quantize_f0(jnp.asarray(x)))
    uv = x <= 0
    assert (ids[uv] == 0).all()
    voiced = ~uv
    np.testing.assert_array_equal(
        ids[voiced], np.round(x[voiced] * 255) + 1
    )
    onehot = np.asarray(quantize_f0_onehot(jnp.asarray(x)))
    assert onehot.shape == (62, 257)
    np.testing.assert_array_equal(onehot.argmax(-1), ids)
    np.testing.assert_array_equal(onehot.sum(-1), 1.0)


def test_speaker_normalization(rng):
    f0 = rng.uniform(3, 6, 100)
    voiced = rng.rand(100) > 0.3
    f0 = np.where(voiced, f0, -1e10)
    mean = f0[voiced].mean()
    std = f0[voiced].std()
    out = np.asarray(
        speaker_normalization(
            jnp.asarray(f0), jnp.asarray(voiced), mean, std
        )
    )
    assert (out[voiced] >= 0).all() and (out[voiced] <= 1).all()
    np.testing.assert_array_equal(out[~voiced], f0[~voiced])

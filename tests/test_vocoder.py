"""Vocoder tests: mel inversion recovers intelligible spectra."""

import numpy as np

import jax.numpy as jnp

from speechsplit_tpu.ops.stft import mel_spectrogram
from speechsplit_tpu.vocoder import GriffinLimVocoder

FS = 16000


def test_griffin_lim_roundtrip_tone():
    t = np.arange(FS) / FS
    f0 = 440.0
    wav = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None])))[0]

    voc = GriffinLimVocoder(n_iter=40)
    out = voc(mel)
    assert out.ndim == 1 and len(out) > FS * 0.9
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0

    # the dominant frequency of the resynthesis must match the tone
    spec = np.abs(np.fft.rfft(out[2048:-2048] * np.hanning(len(out) - 4096)))
    freq = np.fft.rfftfreq(len(out) - 4096, 1 / FS)
    peak = freq[np.argmax(spec)]
    assert abs(peak - f0) < 15.0, peak


def test_vocoder_interface_on_random_mel(rng):
    mel = rng.rand(100, 80).astype(np.float32)
    voc = GriffinLimVocoder(n_iter=5)
    out = voc(mel)
    assert out.ndim == 1
    assert np.isfinite(out).all()

"""Native (C++) pitch tracker: accuracy + cross-validation against the
on-device JAX tracker (same algorithm, independent implementation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speechsplit_tpu.ops.pitch import track_pitch
from speechsplit_tpu.ops import pitch_native

FS = 16000
HOP = 256

pytestmark = pytest.mark.skipif(
    not pitch_native.available(), reason="g++/native build unavailable"
)


def _voiced_tone(f0, n, harmonics=4, seed=0):
    t = np.arange(n) / FS
    r = np.random.RandomState(seed)
    sig = sum(
        np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, harmonics + 1)
    ) + 0.005 * r.randn(n)
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


def test_native_steady_tone():
    x = _voiced_tone(150.0, FS)
    out = pitch_native.track_pitch_native(x)
    assert out.shape == (FS // HOP + 1,)
    interior = out[2:-4]
    voiced = interior > -1e9
    assert voiced.mean() > 0.9
    f_est = np.exp(interior[voiced])
    assert abs(np.median(f_est) - 150.0) < 5.0


def test_native_noise_unvoiced():
    rng = np.random.RandomState(0)
    x = (rng.randn(FS) * 0.3).astype(np.float32)
    out = pitch_native.track_pitch_native(x)
    assert (out == -1e10).mean() > 0.8


def test_native_matches_device_tracker():
    """Two independent implementations of the same algorithm must agree
    on voicing and (within a few cents) on pitch."""
    for f0, seed in [(110.0, 1), (200.0, 2), (320.0, 3)]:
        x = _voiced_tone(f0, FS, seed=seed)
        native = pitch_native.track_pitch_native(x)
        device = np.asarray(
            track_pitch(
                jnp.asarray(x[None]),
                jnp.asarray([len(x)]),
                jnp.asarray([50.0], jnp.float32),
                jnp.asarray([600.0], jnp.float32),
            )
        )[0]
        assert native.shape == device.shape
        interior = slice(2, -4)
        nv = native[interior] > -1e9
        dv = device[interior] > -1e9
        # voicing decisions agree on nearly all frames
        assert (nv == dv).mean() > 0.95
        both = nv & dv
        cents = 1200 * np.abs(
            (native[interior][both] - device[interior][both]) / np.log(2)
        )
        assert np.median(cents) < 10.0

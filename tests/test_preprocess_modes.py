"""The two high-pass realizations must agree at the feature level, and
the tracker must be rumble-immune (what the filter existed for)."""

import numpy as np

import jax
import jax.numpy as jnp

from speechsplit_tpu.ops.pitch import track_pitch
from speechsplit_tpu.preprocess import extract_features

FS = 16000


def _speechlike(rng, n, f0=140.0, rumble=0.0):
    t = np.arange(n) / FS
    sig = sum(
        np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, 5)
    ) * 0.3
    sig = sig + 0.02 * rng.randn(n)
    if rumble:
        sig = sig + rumble * (
            np.sin(2 * np.pi * 8.0 * t) + np.sin(2 * np.pi * 22.0 * t)
        )
    return sig.astype(np.float32)


def test_stft_mode_matches_time_mode_mel(rng):
    n = 2 * FS
    wavs = np.stack(
        [
            _speechlike(rng, n, 120.0, rumble=0.3),
            _speechlike(rng, n, 210.0, rumble=0.0),
        ]
    )
    lengths = jnp.asarray([n, n])
    lo = jnp.asarray([50.0, 50.0])
    hi = jnp.asarray([600.0, 600.0])
    key = jax.random.PRNGKey(0)

    mel_stft, f0_stft = extract_features(
        jnp.asarray(wavs), lengths, lo, hi, key, highpass_mode="stft"
    )
    mel_time, f0_time = extract_features(
        jnp.asarray(wavs), lengths, lo, hi, key, highpass_mode="time"
    )
    mae = np.abs(np.asarray(mel_stft) - np.asarray(mel_time)).mean()
    assert mae < 2e-3, mae

    # voicing decisions agree
    v_stft = np.asarray(f0_stft) > -1e9
    v_time = np.asarray(f0_time) > -1e9
    assert (v_stft == v_time).mean() > 0.9


def test_tracker_rumble_immune(rng):
    """Mean-subtracted NCCF: strong sub-30 Hz content must not break
    pitch tracking of an UNFILTERED signal."""
    n = FS
    clean = _speechlike(rng, n, 150.0, rumble=0.0)[None]
    dirty = _speechlike(rng, n, 150.0, rumble=0.5)[None]
    args = (
        jnp.asarray([n]),
        jnp.asarray([50.0]),
        jnp.asarray([600.0]),
    )
    out_clean = np.asarray(track_pitch(jnp.asarray(clean), *args))[0]
    out_dirty = np.asarray(track_pitch(jnp.asarray(dirty), *args))[0]
    for out in (out_clean, out_dirty):
        interior = out[2:-4]
        voiced = interior > -1e9
        assert voiced.mean() > 0.9
        f_est = np.exp(interior[voiced])
        assert abs(np.median(f_est) - 150.0) < 5.0

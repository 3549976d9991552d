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


def test_scan_matches_per_batch(rng):
    """extract_features_scan must reproduce extract_features exactly
    per staged batch (same math, per-batch keys = fold_in(key, k)),
    and its bf16 compress mode must keep the unvoiced sentinel and
    ~1e-3 mel accuracy."""
    from speechsplit_tpu.preprocess import extract_features_scan

    n = FS
    k_batches, b = 3, 2
    wavs = np.stack(
        [
            np.stack(
                [
                    _speechlike(rng, n, 110.0 + 40 * (k + i))
                    for i in range(b)
                ]
            )
            for k in range(k_batches)
        ]
    )
    lengths = np.full((k_batches, b), n, np.int32)
    lo = np.full((k_batches, b), 50.0, np.float32)
    hi = np.full((k_batches, b), 600.0, np.float32)
    key = jax.random.PRNGKey(7)

    mel_s, f0_s = extract_features_scan(
        jnp.asarray(wavs), jnp.asarray(lengths), jnp.asarray(lo),
        jnp.asarray(hi), key,
    )
    for k in range(k_batches):
        mel_k, f0_k = extract_features(
            jnp.asarray(wavs[k]), jnp.asarray(lengths[k]),
            jnp.asarray(lo[k]), jnp.asarray(hi[k]),
            jax.random.fold_in(key, k),
        )
        np.testing.assert_allclose(
            np.asarray(mel_s[k]), np.asarray(mel_k), rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(f0_s[k]), np.asarray(f0_k)
        )

    mel_c, f0_c = extract_features_scan(
        jnp.asarray(wavs), jnp.asarray(lengths), jnp.asarray(lo),
        jnp.asarray(hi), key, compress=True,
    )
    assert mel_c.dtype == jnp.bfloat16
    v_full = np.asarray(f0_s) > -1e9
    v_comp = np.asarray(f0_c).astype(np.float32) > -1e9
    np.testing.assert_array_equal(v_full, v_comp)
    err = np.abs(
        np.asarray(mel_c).astype(np.float32) - np.asarray(mel_s)
    ).max()
    assert err < 4e-3, err


def test_pcm16_feed_bit_identical(rng):
    """Uploading raw int16 PCM (half the host->device bytes) and
    converting in-graph must be BIT-identical to the host-converted
    float32 feed: every int16/32768 is exact in float32."""
    n = FS
    w16 = (
        np.clip(_speechlike(rng, n, 150.0), -0.999, 0.999) * 32768.0
    ).astype(np.int16)
    w32 = (w16 / 32768.0).astype(np.float32)
    lengths = jnp.asarray([n])
    lo, hi = jnp.asarray([50.0]), jnp.asarray([600.0])
    key = jax.random.PRNGKey(7)
    mel16, f016 = extract_features(
        jnp.asarray(w16)[None], lengths, lo, hi, key
    )
    mel32, f032 = extract_features(
        jnp.asarray(w32)[None], lengths, lo, hi, key
    )
    np.testing.assert_array_equal(np.asarray(mel16), np.asarray(mel32))
    np.testing.assert_array_equal(np.asarray(f016), np.asarray(f032))


def test_pad_batch_preserves_pcm16():
    from speechsplit_tpu.preprocess import pad_batch

    i = [np.ones(100, np.int16), np.ones(160, np.int16)]
    batch, lengths = pad_batch(i)
    assert batch.dtype == np.int16
    assert list(lengths) == [100, 160]
    # a mixed batch falls back to float32 AND scales the PCM16 rows —
    # the device extractor only rescales whole-int16 batches, so raw
    # +-32768 samples must never reach a float batch
    mixed, _ = pad_batch(
        [np.full(10, 16384, np.int16), np.full(10, 0.25, np.float32)]
    )
    assert mixed.dtype == np.float32
    np.testing.assert_allclose(mixed[0, :10], 0.5)
    np.testing.assert_allclose(mixed[1, :10], 0.25)

"""Accuracy tests for the batched NCCF+Viterbi pitch tracker.

No RAPT oracle is available (pysptk is not installed), so the tracker is
validated on synthetic signals with known ground truth: steady tones,
vibrato, glides, voiced/unvoiced alternation, and the gender search
ranges used by the reference (make_spect_f0.py:40-45).
"""

import numpy as np

import jax.numpy as jnp

from speechsplit_tpu.ops.pitch import UNVOICED_LOG_F0, track_pitch

FS = 16000
HOP = 256


def _voiced_tone(f0, n, fs=FS, harmonics=4):
    t = np.arange(n) / fs
    sig = np.zeros(n)
    for h in range(1, harmonics + 1):
        sig += np.sin(2 * np.pi * f0 * h * t) / h
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


def _extract(x_batch, lengths, lo, hi):
    out = track_pitch(
        jnp.asarray(x_batch),
        jnp.asarray(lengths),
        jnp.asarray(lo, jnp.float32),
        jnp.asarray(hi, jnp.float32),
    )
    return np.asarray(out)


def test_steady_tones_tracked_accurately():
    n = FS  # 1 s
    f0s = [100.0, 150.0, 220.0, 330.0]
    x = np.stack([_voiced_tone(f, n) for f in f0s])
    logf0 = _extract(
        x, [n] * 4, [50.0] * 4, [600.0] * 4
    )
    assert logf0.shape == (4, n // HOP + 1)
    for i, f in enumerate(f0s):
        # ignore edge frames where the analysis window runs off the signal
        interior = logf0[i, 2:-4]
        voiced = interior > -1e9
        assert voiced.mean() > 0.9, f"tone {f} mostly unvoiced"
        err_cents = 1200 * np.abs(
            interior[voiced] / np.log(2) - np.log2(f)
        )
        assert np.median(err_cents) < 20, f"tone {f}: {np.median(err_cents)}"


def test_silence_and_noise_unvoiced():
    rng = np.random.RandomState(0)
    silence = np.zeros((1, FS), np.float32)
    noise = (rng.randn(1, FS) * 0.3).astype(np.float32)
    out_sil = _extract(silence, [FS], [50.0], [600.0])
    out_noise = _extract(noise, [FS], [50.0], [600.0])
    assert (out_sil == UNVOICED_LOG_F0).mean() > 0.95
    assert (out_noise == UNVOICED_LOG_F0).mean() > 0.8


def test_voiced_unvoiced_alternation():
    rng = np.random.RandomState(1)
    tone = _voiced_tone(160.0, FS // 2)
    noise = (rng.randn(FS // 2) * 0.02).astype(np.float32)
    x = np.concatenate([tone, noise, tone])[None, :]
    out = _extract(x, [x.shape[1]], [50.0], [600.0])[0]
    t_frames = FS // 2 // HOP
    # margins around transitions
    assert (out[2 : t_frames - 2] > -1e9).mean() > 0.85
    assert (
        out[t_frames + 2 : 2 * t_frames - 2] == UNVOICED_LOG_F0
    ).mean() > 0.8
    assert (out[2 * t_frames + 2 : 3 * t_frames - 4] > -1e9).mean() > 0.85


def test_glide_tracks_smoothly():
    n = FS
    t = np.arange(n) / FS
    f_inst = 120.0 * (2.0 ** (t / 2.0))  # one octave over 2 s
    phase = 2 * np.pi * np.cumsum(f_inst) / FS
    x = (0.5 * np.sin(phase)).astype(np.float32)[None, :]
    out = _extract(x, [n], [50.0], [600.0])[0]
    interior = out[2:-4]
    voiced = interior > -1e9
    assert voiced.mean() > 0.9
    # tracked contour stays within 50 cents of the true glide
    frames = np.arange(len(out))[2:-4][voiced]
    true_f = 120.0 * (2.0 ** (frames * HOP / FS / 2.0))
    err_cents = 1200 * np.abs(
        interior[voiced] / np.log(2) - np.log2(true_f)
    )
    assert np.median(err_cents) < 30


def test_gender_range_masks_octave_errors():
    # a 120 Hz tone must not be reported inside a female search range as
    # its 240 Hz octave error when lo=100 allows the true pitch
    n = FS
    x = _voiced_tone(120.0, n)[None, :]
    male = _extract(x, [n], [50.0], [250.0])[0]
    interior = male[2:-4]
    voiced = interior > -1e9
    assert voiced.mean() > 0.9
    f_est = np.exp(interior[voiced])
    assert np.abs(np.median(f_est) - 120.0) < 5.0


def test_top_k_by_max_matches_lax_top_k():
    """_top_k_by_max replaces the XLA sort lowering; it must match
    jax.lax.top_k bit-for-bit, including tie order (lowest index first)
    and rows with fewer peaks than k (all-(-2.0) ties)."""
    import jax

    from speechsplit_tpu.ops.pitch import _top_k_by_max

    rng = np.random.RandomState(7)
    x = rng.rand(64, 295).astype(np.float32)
    # inject the -2.0 plateau the candidate mask produces, incl. full
    # non-peak rows
    x[x < 0.6] = -2.0
    x[5] = -2.0
    vals, idx = _top_k_by_max(jnp.asarray(x), 12)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(x), 12)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_parallel_viterbi_matches_scan():
    """The associative-scan decoder must agree with the serial scan
    decoder (exact up to float-reassociation tie flips, which random
    continuous inputs make vanishingly rare)."""
    from speechsplit_tpu.ops.pitch import (
        PitchParams,
        _viterbi_parallel,
        _viterbi_scan,
    )

    rng = np.random.RandomState(3)
    kmax = 320
    for t in (1, 2, 3, 50, 251):
        lag = jnp.asarray(
            rng.uniform(26.0, 320.0, size=(t, 12)).astype(np.float32)
        )
        score = jnp.asarray(
            rng.uniform(-0.2, 1.0, size=(t, 12)).astype(np.float32)
        )
        p = PitchParams()
        lag_p, voiced_p = _viterbi_parallel(lag, score, kmax, p)
        lag_s, voiced_s = _viterbi_scan(lag, score, kmax, p)
        agree = np.asarray(voiced_p) == np.asarray(voiced_s)
        assert agree.mean() >= 0.99, (t, agree.mean())
        both = np.asarray(voiced_p) & np.asarray(voiced_s)
        np.testing.assert_array_equal(
            np.asarray(lag_p)[agree & both], np.asarray(lag_s)[agree & both]
        )


def test_block_viterbi_matches_scan():
    """The radix-k block decoder must agree with the serial scan
    decoder for every radix, including T==1, T-1 an exact block
    multiple, and T-1 needing identity padding (same reassociation
    caveat as the parallel decoder)."""
    from speechsplit_tpu.ops.pitch import (
        PitchParams,
        _viterbi_block,
        _viterbi_scan,
    )

    rng = np.random.RandomState(11)
    kmax = 320
    for t in (1, 2, 3, 5, 8, 9, 50, 251):
        lag = jnp.asarray(
            rng.uniform(26.0, 320.0, size=(t, 12)).astype(np.float32)
        )
        score = jnp.asarray(
            rng.uniform(-0.2, 1.0, size=(t, 12)).astype(np.float32)
        )
        lag_s, voiced_s = _viterbi_scan(lag, score, kmax, PitchParams())
        for radix in (2, 4, 7, 16):
            p = PitchParams(block_viterbi=radix)
            lag_b, voiced_b = _viterbi_block(lag, score, kmax, p)
            agree = np.asarray(voiced_b) == np.asarray(voiced_s)
            assert agree.mean() >= 0.99, (t, radix, agree.mean())
            both = np.asarray(voiced_b) & np.asarray(voiced_s)
            np.testing.assert_array_equal(
                np.asarray(lag_b)[agree & both],
                np.asarray(lag_s)[agree & both],
            )


def test_track_pitch_block_equals_scan_end_to_end():
    """Full tracker output on real-ish signals, block vs serial
    Viterbi: identical log-F0 up to tie flips (candidate stage is
    shared and exact)."""
    from speechsplit_tpu.ops.pitch import PitchParams

    n = FS
    x = np.stack([_voiced_tone(140.0, n), _voiced_tone(260.0, n)])
    args = (
        jnp.asarray(x),
        jnp.asarray([n, n]),
        jnp.asarray([50.0, 50.0], jnp.float32),
        jnp.asarray([600.0, 600.0], jnp.float32),
    )
    out_b = np.asarray(
        track_pitch(*args, params=PitchParams(block_viterbi=8))
    )
    out_s = np.asarray(track_pitch(*args, params=PitchParams()))
    assert (out_b == out_s).mean() > 0.995
    both = (out_b > -1e9) & (out_s > -1e9)
    np.testing.assert_array_equal(out_b[both], out_s[both])


def test_track_pitch_parallel_equals_scan_end_to_end():
    """Full tracker output on real-ish signals, parallel vs serial
    Viterbi: identical log-F0 (candidate stage is shared and exact)."""
    from speechsplit_tpu.ops.pitch import PitchParams

    n = FS
    x = np.stack(
        [_voiced_tone(140.0, n), _voiced_tone(260.0, n)]
    )
    args = (
        jnp.asarray(x),
        jnp.asarray([n, n]),
        jnp.asarray([50.0, 50.0], jnp.float32),
        jnp.asarray([600.0, 600.0], jnp.float32),
    )
    out_p = np.asarray(
        track_pitch(*args, params=PitchParams(parallel_viterbi=True))
    )
    out_s = np.asarray(
        track_pitch(*args, params=PitchParams(parallel_viterbi=False))
    )
    assert (out_p == out_s).mean() > 0.995
    # voiced/unvoiced flips (tie reassociation) must be the only diffs
    both = (out_p > -1e9) & (out_s > -1e9)
    np.testing.assert_array_equal(out_p[both], out_s[both])


def test_frames_past_length_are_unvoiced():
    x = np.zeros((2, FS), np.float32)
    x[0] = _voiced_tone(150.0, FS)
    x[1, : FS // 2] = _voiced_tone(150.0, FS // 2)
    out = _extract(x, [FS, FS // 2], [50.0] * 2, [600.0] * 2)
    cut = (FS // 2) // HOP + 1
    assert (out[1, cut:] == UNVOICED_LOG_F0).all()


def test_nccf_conv_parity():
    """The depthwise-conv NCCF numerator equals the FFT form up to
    float reassociation, and the end-to-end tracker makes identical
    voicing/F0 decisions on a real-ish stimulus either way."""
    import jax

    from speechsplit_tpu.ops.pitch import PitchParams, _nccf
    from tests.speech_stimuli import default_utterance

    stim = default_utterance(3, 120.0)
    x = jnp.asarray(stim.wav[: 16000 * 2])
    n_frames, hop, window = 60, 256, 120
    kmin, kmax = 16000 // 600, 16000 // 50
    span_pad = (n_frames - 1) * hop + window + kmax
    xp = jnp.pad(x, (0, max(0, span_pad - x.shape[0])))

    fft = _nccf(xp, n_frames, hop, window, kmin, kmax, by_conv=False)
    conv = _nccf(xp, n_frames, hop, window, kmin, kmax, by_conv=True)
    np.testing.assert_allclose(
        np.asarray(fft), np.asarray(conv), atol=2e-3
    )

    wav = jnp.asarray(stim.wav)[None]
    lengths = jnp.asarray([stim.wav.shape[0]])
    lo, hi = jnp.asarray([50.0]), jnp.asarray([600.0])
    base = track_pitch(wav, lengths, lo, hi)
    by_conv = track_pitch(
        wav, lengths, lo, hi, params=PitchParams(nccf_by_conv=True)
    )
    a, b = np.asarray(base)[0], np.asarray(by_conv)[0]
    agree = np.mean((a > -1e9) == (b > -1e9))
    assert agree > 0.98, agree
    both = (a > -1e9) & (b > -1e9)
    np.testing.assert_allclose(a[both], b[both], atol=5e-3)

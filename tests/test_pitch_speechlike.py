"""Non-circular pitch-tracker validation on speech-like stimuli.

VERDICT r1 #5: the trackers were previously validated only against pure
tones and against each other (both implement the same algorithm). Here
the oracle is the *synthesis*: jittered/shimmered glottal pulse trains
through formant resonators with aspiration noise, fricative segments and
silence (tests/speech_stimuli.py). Ground-truth F0 is the actual pulse
period laid down by the synthesizer — no tracker in the loop.

Scored metrics (standard pitch-eval definitions):
- voicing decision F-score,
- gross pitch error rate (voiced-agreed frames off by >20%),
- median fine pitch error in cents.

Reference parity target: the reference's RAPT usage
(make_spect_f0.py:64) with gender ranges [50,250]/[100,600] Hz
(make_spect_f0.py:40-45).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speechsplit_tpu.ops.pitch import UNVOICED_LOG_F0, track_pitch

from speech_stimuli import FS, HOP, default_utterance

# (seed, base F0, search lo, search hi) — male and female registers
CASES = [
    (0, 110.0, 50.0, 250.0),
    (1, 130.0, 50.0, 250.0),
    (2, 210.0, 100.0, 600.0),
    (3, 240.0, 100.0, 600.0),
]


def _score(est_logf0, gt_f0, gt_voiced, scoreable):
    est_voiced = est_logf0 > -1e9
    sc = scoreable
    tp = float(np.sum(est_voiced & gt_voiced & sc))
    fp = float(np.sum(est_voiced & ~gt_voiced & sc))
    fn = float(np.sum(~est_voiced & gt_voiced & sc))
    f_score = 2 * tp / max(2 * tp + fp + fn, 1e-9)

    both = est_voiced & gt_voiced & sc
    est_f0 = np.exp(est_logf0[both])
    true_f0 = gt_f0[both]
    rel_err = np.abs(est_f0 - true_f0) / true_f0
    gross = float(np.mean(rel_err > 0.2)) if both.any() else 1.0
    fine = rel_err[rel_err <= 0.2]
    cents = (
        np.median(1200 * np.abs(np.log2(est_f0 / true_f0))[rel_err <= 0.2])
        if len(fine)
        else np.inf
    )
    return f_score, gross, cents


def _gt(stim):
    return stim.frame_ground_truth(HOP)


@pytest.mark.parametrize("seed,base,lo,hi", CASES)
def test_device_tracker_on_speechlike(seed, base, lo, hi):
    stim = default_utterance(seed, base)
    gt_f0, gt_voiced, scoreable = _gt(stim)
    n = len(stim.wav)
    est = np.asarray(
        track_pitch(
            jnp.asarray(stim.wav)[None, :],
            jnp.asarray([n]),
            jnp.asarray([lo], jnp.float32),
            jnp.asarray([hi], jnp.float32),
        )
    )[0]
    f_score, gross, cents = _score(est, gt_f0, gt_voiced, scoreable)
    assert f_score > 0.88, f"voicing F-score {f_score:.3f}"
    assert gross < 0.05, f"gross pitch error rate {gross:.3f}"
    assert cents < 35, f"median fine error {cents:.1f} cents"


def test_native_tracker_on_speechlike():
    from speechsplit_tpu.ops import pitch_native

    if not pitch_native.available():
        pytest.skip("native tracker unavailable (no g++?)")
    for seed, base, lo, hi in CASES:
        stim = default_utterance(seed, base)
        gt_f0, gt_voiced, scoreable = _gt(stim)
        est = pitch_native.track_pitch_native(
            stim.wav, lo=lo, hi=hi
        )
        f_score, gross, cents = _score(est, gt_f0, gt_voiced, scoreable)
        assert f_score > 0.88, f"seed {seed}: F-score {f_score:.3f}"
        assert gross < 0.05, f"seed {seed}: gross rate {gross:.3f}"
        assert cents < 35, f"seed {seed}: {cents:.1f} cents"


def test_trackers_robust_to_stimulus_degradation():
    """Heavier jitter + worse SNR: accuracy thresholds relax but the
    tracker must not fall apart (octave errors stay rare)."""
    from speech_stimuli import synth_utterance

    stim = synth_utterance(
        7,
        [
            ("voiced", 0.8, lambda r: 140.0 * (1.2 - 0.3 * r)),
            ("silence", 0.2, None),
            ("voiced", 0.6, lambda r: 150.0 + 30.0 * np.sin(np.pi * r)),
        ],
        jitter_pct=2.5,
        shimmer_db=2.0,
        snr_db=10.0,
    )
    gt_f0, gt_voiced, scoreable = _gt(stim)
    n = len(stim.wav)
    est = np.asarray(
        track_pitch(
            jnp.asarray(stim.wav)[None, :],
            jnp.asarray([n]),
            jnp.asarray([50.0], jnp.float32),
            jnp.asarray([600.0], jnp.float32),
        )
    )[0]
    f_score, gross, cents = _score(est, gt_f0, gt_voiced, scoreable)
    assert f_score > 0.8, f_score
    assert gross < 0.10, gross
    assert cents < 50, cents

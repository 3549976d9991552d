"""Speech-like test stimuli with synthesis-derived ground truth.

De-circularizes pitch-tracker validation (VERDICT r1 #5 / PARITY.md #2):
instead of comparing our two implementations of the same algorithm
against each other, these stimuli carry ground truth from the *synthesis*
process itself — per-period instantaneous F0 of a jittered glottal pulse
train driven through formant resonators, with shimmer, aspiration noise,
fricative (unvoiced) segments, and silence. This is the classic
impulse-excited formant-synthesis model; no pitch tracker is involved in
producing the labels.

Ground-truth conventions match the tracker contract
(ops/pitch.py::track_pitch): one frame per ``hop`` samples, frame t
anchored at sample ``t*hop``.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np
from scipy import signal as sp_signal

FS = 16000
HOP = 256

# (frequency Hz, bandwidth Hz) — neutral-vowel-ish formants
FORMANTS = ((500.0, 80.0), (1500.0, 100.0), (2500.0, 140.0))


def _formant_filter(x: np.ndarray, fs: int = FS) -> np.ndarray:
    """Cascade of 2nd-order resonators (all-pole formant synthesis)."""
    y = x.astype(np.float64)
    for f, bw in FORMANTS:
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * f / fs
        a = [1.0, -2.0 * r * np.cos(theta), r * r]
        y = sp_signal.lfilter([1.0 - r], a, y)
    return y


def _rosenberg_pulse(period: int) -> np.ndarray:
    """Differentiated Rosenberg glottal pulse of one period's length."""
    n_open = max(2, int(0.4 * period))
    n_close = max(1, int(0.16 * period))
    t_o = np.arange(n_open) / n_open
    opening = 0.5 * (1.0 - np.cos(np.pi * t_o))
    t_c = np.arange(n_close) / n_close
    closing = np.cos(0.5 * np.pi * t_c)
    g = np.concatenate(
        [opening, closing, np.zeros(max(0, period - n_open - n_close))]
    )
    return np.diff(g, prepend=0.0)


class Stimulus:
    def __init__(self, n_samples: int):
        self.wav = np.zeros(n_samples, np.float64)
        # instantaneous F0 per sample (0 where unvoiced/silent)
        self.f0_per_sample = np.zeros(n_samples, np.float64)
        # True where the sample belongs to a voiced segment
        self.voiced_per_sample = np.zeros(n_samples, bool)
        # True in a margin zone around segment transitions (excluded
        # from scoring: every tracker smears decisions near boundaries)
        self.transition = np.zeros(n_samples, bool)

    def frame_ground_truth(
        self, hop: int = HOP, margin_frames: int = 3
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-frame (f0, voiced, scoreable) at the tracker's frame grid.

        Frame t is labeled from the samples its correlation window spans
        (``t*hop .. t*hop+window``); a frame is scoreable only when that
        whole span is uniformly voiced or uniformly unvoiced and clear of
        transition margins.
        """
        n = len(self.wav)
        n_frames = n // hop + 1
        window = 120  # must cover PitchParams.window
        f0 = np.zeros(n_frames)
        voiced = np.zeros(n_frames, bool)
        scoreable = np.zeros(n_frames, bool)
        for t in range(n_frames):
            a = t * hop
            b = min(a + window, n)
            if b <= a:
                continue
            seg_v = self.voiced_per_sample[a:b]
            seg_t = self.transition[a:b]
            if seg_t.any():
                continue
            if seg_v.all():
                vals = self.f0_per_sample[a:b]
                vals = vals[vals > 0]
                if len(vals) == 0:
                    continue
                f0[t] = np.median(vals)
                voiced[t] = True
                scoreable[t] = True
            elif (~seg_v).all():
                scoreable[t] = True
        # tracker edge frames (analysis window off the end) never score
        scoreable[: margin_frames] = False
        scoreable[-(margin_frames + 2):] = False
        return f0, voiced, scoreable


def synth_utterance(
    seed: int,
    segments: List[Tuple[str, float, Callable[[np.ndarray], np.ndarray]]],
    fs: int = FS,
    jitter_pct: float = 1.0,
    shimmer_db: float = 1.0,
    snr_db: float = 20.0,
) -> Stimulus:
    """Synthesize an utterance from (kind, duration_s, contour) segments.

    kind: 'voiced' (contour maps segment-relative time [0,1] -> F0 Hz),
    'fricative' (high-passed noise), or 'silence'.
    """
    rng = np.random.RandomState(seed)
    n_total = int(sum(d for _, d, _ in segments) * fs)
    stim = Stimulus(n_total)
    excitation = np.zeros(n_total)

    pos = 0
    for kind, dur, contour in segments:
        seg_len = int(dur * fs)
        a, b = pos, min(pos + seg_len, n_total)
        if kind == "voiced":
            p = a
            while p < b:
                rel = (p - a) / seg_len
                f_target = float(contour(np.asarray(rel)))
                f_actual = f_target * (
                    1.0 + jitter_pct / 100.0 * rng.randn()
                )
                f_actual = np.clip(f_actual, 40.0, 620.0)
                period = max(8, int(round(fs / f_actual)))
                amp = 10.0 ** (
                    shimmer_db * rng.randn() / 20.0
                )
                pulse = _rosenberg_pulse(period) * amp
                end = min(p + period, b)
                excitation[p:end] += pulse[: end - p]
                stim.f0_per_sample[p:end] = fs / period
                stim.voiced_per_sample[p:end] = True
                p += period
        elif kind == "fricative":
            noise = rng.randn(b - a)
            sos = sp_signal.butter(4, 3500, "highpass", fs=fs, output="sos")
            excitation[a:b] += 0.12 * sp_signal.sosfilt(sos, noise)
        elif kind == "silence":
            pass
        else:
            raise ValueError(kind)
        # mark transition margins (±12 ms) around segment boundaries
        m = int(0.012 * fs)
        stim.transition[max(0, a - m): min(n_total, a + m)] = True
        stim.transition[max(0, b - m): min(n_total, b + m)] = True
        pos += seg_len

    voiced_speech = _formant_filter(excitation)
    # aspiration noise on voiced parts + floor noise everywhere (SNR)
    sig_rms = np.sqrt(np.mean(voiced_speech**2) + 1e-12)
    noise = rng.randn(n_total) * sig_rms * 10.0 ** (-snr_db / 20.0)
    wav = voiced_speech + noise
    stim.wav = (wav / (np.abs(wav).max() + 1e-9) * 0.6).astype(np.float32)
    return stim


def default_utterance(seed: int, base_f0: float) -> Stimulus:
    """A sentence-like utterance: two voiced runs with natural contours
    separated by a fricative and closed by silence."""
    decline = lambda r: base_f0 * (1.25 - 0.35 * r)
    rise_fall = lambda r: base_f0 * (0.95 + 0.25 * np.sin(np.pi * r))
    return synth_utterance(
        seed,
        [
            ("voiced", 0.55, decline),
            ("fricative", 0.22, None),
            ("voiced", 0.65, rise_fall),
            ("silence", 0.18, None),
            ("voiced", 0.45, decline),
        ],
    )

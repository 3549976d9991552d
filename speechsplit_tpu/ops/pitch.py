"""Batched RAPT-style pitch tracking on TPU.

The reference extracts F0 with the C implementation of RAPT (Talkin 1995)
via ``pysptk.sptk.rapt(wav*32768, fs, hop=256, min, max, otype=2)`` —
one utterance at a time on the host (make_spect_f0.py:64). This module
is a from-scratch, TPU-native tracker with the same interface contract:

    log-F0 per frame, one frame per STFT hop (N//hop + 1 frames),
    unvoiced frames = -1e10, search range [lo, hi] Hz per speaker gender
    (make_spect_f0.py:40-45).

Algorithm (NCCF + Viterbi, the core of RAPT):
1. NCCF: normalized cross-correlation of each analysis frame against
   itself at lags [fs/hi, fs/lo]. Computed for ALL frames of ALL
   utterances at once via batched rfft (the correlation) plus cumulative
   energy sums (the normalization) — no per-frame host loop.
2. Candidate generation: local NCCF maxima, top-K by value, with
   parabolic lag refinement.
3. Viterbi over frames: K voiced states + 1 unvoiced state, RAPT-flavored
   costs (lag-weighted peak quality, octave-jump penalty, voicing
   transition cost), as a forward ``lax.scan`` with static [K+1] state and
   a backward backtrace scan. vmapped over utterances.

This is not bit-identical to RAPT (different candidate pruning and no
two-pass decimation), but tracks the same definition of F0 and the same
voicing semantics; accuracy is validated on synthetic signals in
tests/test_pitch.py. Everything is shape-static and jit/vmap friendly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

UNVOICED_LOG_F0 = -1e10  # sentinel shared with the reference pipeline


class PitchParams(NamedTuple):
    """Tracker constants (RAPT-standard flavors)."""

    window: int = 120          # correlation window, 7.5 ms @ 16 kHz
    num_cands: int = 12        # voiced candidates per frame
    cand_thresh: float = 0.3   # min NCCF for a candidate to count
    lag_weight: float = 0.3    # prefer shorter lags (higher F0)
    freq_weight: float = 0.25  # octave-jump transition penalty
    voice_bias: float = 0.0    # bias toward voiced decisions
    trans_cost: float = 0.3    # voiced<->unvoiced switch cost


def _nccf(
    x: Array, n_frames: int, hop: int, window: int, kmin: int, kmax: int
) -> Array:
    """Mean-subtracted NCCF for all frames at once.

    x: [N] (zero-padded so that (n_frames-1)*hop + window + kmax <= N).
    Returns [n_frames, kmax - kmin + 1].

    Window means are removed from both correlation legs (via prefix sums
    — no extra FFT work): sum (a-ā)(b-b̄) = sum ab - W·ā·b̄. This makes
    the tracker immune to DC/rumble, so the production preprocessing
    path can skip the expensive time-domain high-pass entirely (the mel
    path applies it spectrally; see preprocess.extract_features).
    """
    n_lags = kmax - kmin + 1
    span = window + kmax  # samples each frame's correlation touches
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(span)[None, :]
    frames = x[idx]  # [T, span]

    # cross-correlation numerator via rfft (linear correlation: pad to
    # >= span + window)
    nfft = 1 << (span + window - 1).bit_length()
    short = jnp.where(jnp.arange(span)[None, :] < window, frames, 0.0)
    spec_l = jnp.fft.rfft(frames, n=nfft, axis=-1)
    spec_s = jnp.fft.rfft(short, n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(spec_s) * spec_l, n=nfft, axis=-1)
    num = corr[:, kmin : kmax + 1]  # [T, L] sum x[n] x[n+k]

    # window sums / energies via prefix sums
    energy_prefix = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(x * x)]
    )
    sum_prefix = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(x)]
    )
    lags = jnp.arange(kmin, kmax + 1)[None, :]  # [1, L]
    seg_start = starts[:, None] + lags  # [T, L]
    s_k = sum_prefix[seg_start + window] - sum_prefix[seg_start]
    s_0 = (sum_prefix[starts + window] - sum_prefix[starts])[:, None]
    e_k = energy_prefix[seg_start + window] - energy_prefix[seg_start]
    e_0 = (
        energy_prefix[starts + window] - energy_prefix[starts]
    )[:, None]

    w = jnp.asarray(float(window), x.dtype)
    num_c = num - s_0 * s_k / w
    e_0c = jnp.maximum(e_0 - s_0 * s_0 / w, 0.0)
    e_kc = jnp.maximum(e_k - s_k * s_k / w, 0.0)
    return num_c * jax.lax.rsqrt(e_0c * e_kc + 1e-12)


def _candidates(nccf: Array, kmin: int, params: PitchParams):
    """Pick top-K local maxima per frame with parabolic refinement.

    nccf: [T, L]. Returns (lag [T, K] float, score [T, K]).
    """
    t, n_lags = nccf.shape
    left = jnp.pad(nccf[:, :-1], ((0, 0), (1, 0)), constant_values=-2.0)
    right = jnp.pad(nccf[:, 1:], ((0, 0), (0, 1)), constant_values=-2.0)
    is_peak = (nccf >= left) & (nccf > right)
    masked = jnp.where(is_peak, nccf, -2.0)
    score, pos = jax.lax.top_k(masked, params.num_cands)  # [T, K]

    # parabolic interpolation around each peak for sub-sample lag
    pos_c = jnp.clip(pos, 1, n_lags - 2)
    ym = jnp.take_along_axis(nccf, pos_c - 1, axis=1)
    y0 = jnp.take_along_axis(nccf, pos_c, axis=1)
    yp = jnp.take_along_axis(nccf, pos_c + 1, axis=1)
    denom = ym - 2.0 * y0 + yp
    delta = jnp.where(
        jnp.abs(denom) > 1e-9, 0.5 * (ym - yp) / denom, 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = pos.astype(jnp.float32) + jnp.where(pos == pos_c, delta, 0.0)
    return lag + kmin, score


def _viterbi(lag: Array, score: Array, kmax: int, params: PitchParams):
    """Viterbi over frames with K voiced states + 1 unvoiced state.

    lag, score: [T, K]. Returns (best_lag [T], voiced [T]).
    """
    t, k = lag.shape
    usable = score > params.cand_thresh

    # local costs: voiced = 1 - score*(1 - lag_weight*lag/kmax);
    # unusable candidates are barred. unvoiced = voice_bias + best score.
    lag_term = 1.0 - params.lag_weight * lag / kmax
    local_v = jnp.where(usable, 1.0 - score * lag_term, 1e6)  # [T, K]
    local_u = params.voice_bias + jnp.maximum(score.max(axis=1), 0.0)

    log_lag = jnp.log(jnp.maximum(lag, 1.0))  # [T, K]

    def step(carry, inputs):
        prev_cost = carry  # [K+1]
        lv, lu, ll, prev_ll = inputs
        # voiced -> voiced: octave-jump penalty between lags
        trans_vv = params.freq_weight * jnp.abs(
            ll[None, :] - prev_ll[:, None]
        )  # [K_prev, K_cur]
        cost_from_v = prev_cost[:k, None] + trans_vv
        cost_from_u = prev_cost[k] + params.trans_cost
        best_v_prev = jnp.min(cost_from_v, axis=0)
        arg_v_prev = jnp.argmin(cost_from_v, axis=0)
        new_v = lv + jnp.minimum(best_v_prev, cost_from_u)
        arg_v = jnp.where(
            best_v_prev <= cost_from_u, arg_v_prev, k
        )  # [K]

        to_u_from_v = jnp.min(prev_cost[:k]) + params.trans_cost
        arg_u_from_v = jnp.argmin(prev_cost[:k])
        new_u = lu + jnp.minimum(to_u_from_v, prev_cost[k])
        arg_u = jnp.where(to_u_from_v <= prev_cost[k], arg_u_from_v, k)

        new_cost = jnp.concatenate([new_v, new_u[None]])
        back = jnp.concatenate([arg_v, arg_u[None]])
        return new_cost, back

    init = jnp.concatenate([local_v[0], local_u[0][None]])
    final_cost, backptrs = jax.lax.scan(
        step,
        init,
        (local_v[1:], local_u[1:], log_lag[1:], log_lag[:-1]),
    )
    end_state = jnp.argmin(final_cost)

    # backtrace: backptrs[t] maps the state at frame t+1 to frame t
    def backstep(state, back):
        return back[state], state

    first_state, later_states = jax.lax.scan(
        backstep, end_state, backptrs, reverse=True
    )
    states = jnp.concatenate([first_state[None], later_states])

    voiced = states < k
    state_c = jnp.clip(states, 0, k - 1)
    best_lag = jnp.take_along_axis(
        lag, state_c[:, None], axis=1
    )[:, 0]
    # a frame chosen voiced must actually have had a usable candidate
    has_cand = jnp.take_along_axis(usable, state_c[:, None], axis=1)[:, 0]
    return best_lag, voiced & has_cand


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "hop", "n_frames", "params"),
)
def track_pitch(
    x: Array,
    lengths: Array,
    lo: Array,
    hi: Array,
    *,
    sample_rate: int = 16000,
    hop: int = 256,
    n_frames: int | None = None,
    params: PitchParams = PitchParams(),
) -> Array:
    """Batched log-F0 extraction.

    Args:
      x: ``[B, N]`` zero-padded waveforms.
      lengths: ``[B]`` true sample counts.
      lo, hi: ``[B]`` per-utterance F0 search bounds in Hz (the gender
        ranges of make_spect_f0.py:40-45). The *static* lag search span
        uses the widest supported range (50–600 Hz); per-utterance bounds
        mask candidates dynamically so one compiled kernel serves both
        genders.
    Returns:
      ``[B, T]`` natural-log F0 with UNVOICED_LOG_F0 at unvoiced frames
      and at frames past each utterance's length; T = N//hop + 1.
    """
    batch, n_samples = x.shape
    if n_frames is None:
        n_frames = n_samples // hop + 1
    kmin = sample_rate // 600  # widest static range
    kmax = sample_rate // 50

    span = params.window + kmax
    x_pad = jnp.pad(x, ((0, 0), (0, (n_frames - 1) * hop + span)))

    def single(xi, lo_i, hi_i):
        nccf = _nccf(xi, n_frames, hop, params.window, kmin, kmax)
        lag, score = _candidates(nccf, kmin, params)
        # dynamic per-utterance range mask
        lag_lo = sample_rate / hi_i
        lag_hi = sample_rate / lo_i
        in_range = (lag >= lag_lo) & (lag <= lag_hi)
        score = jnp.where(in_range, score, -2.0)
        best_lag, voiced = _viterbi(lag, score, kmax, params)
        f0 = sample_rate / jnp.maximum(best_lag, 1.0)
        return jnp.where(voiced, jnp.log(f0), UNVOICED_LOG_F0)

    logf0 = jax.vmap(single)(x_pad, lo.astype(jnp.float32), hi.astype(jnp.float32))
    frame_valid = (
        jnp.arange(n_frames)[None, :] * hop < lengths[:, None]
    )
    return jnp.where(frame_valid, logf0, UNVOICED_LOG_F0)

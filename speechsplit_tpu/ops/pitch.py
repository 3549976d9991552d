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

from speechsplit_tpu.ops.stft import strided_windows

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
    # parallel (associative-scan) Viterbi: log2(T) min-plus levels
    # instead of a T-step serial lax.scan — same decoder up to float
    # reassociation (see _viterbi_parallel). MEASURED LOSS at this
    # geometry (in-scan, honest full-output timing: 6.87 ms/batch
    # serial vs 8.11 parallel — the [T,S,S,S] min-plus materialization
    # with S=13 wasting 115/128 VPU lanes costs more than the serial
    # scan's T-step latency), so the default stays the serial scan;
    # the parallel decoder remains parity-tested for geometries with
    # more states/longer chains (BENCHMARKS.md "Pitch tracker A/B").
    parallel_viterbi: bool = False
    # block (radix-k) Viterbi: combine each k consecutive transitions
    # into one composite min-plus matrix (vectorized across blocks),
    # serially scan only T/k composites, then reconstruct per-frame
    # costs/backpointers pointwise — the middle ground between the
    # serial scan (T-step latency) and the full associative scan
    # (log2 T levels of [T, S, S, S] work, a measured loss above).
    # 0/1 = serial decoder (default pending the hardware A/B —
    # benchmarks/pitch_viterbi_ab.py; see BENCHMARKS.md).
    block_viterbi: int = 0
    # candidate top-k via XLA sort (True, default) or k max/argmax
    # passes (False); bit-identical either way (_top_k_by_max).
    # Also a measured loss: 6.87 (sort) vs 7.12 ms (12 serial argmax
    # passes) — XLA's TPU sort beats the max-scan at [T, ~295] rows.
    topk_by_sort: bool = True
    # NCCF correlation numerator as a per-frame depthwise conv
    # (feature_group_count = n_frames, ~142M MACs at the production
    # batch) instead of three 1024-point FFTs. Same values up to float
    # reassociation (tests/test_pitch.py::test_nccf_conv_parity).
    # Default OFF pending the honest in-scan hardware A/B
    # (benchmarks/nccf_ab.py — r1's conv lesson: isolated conv
    # micro-benches mislead; only in-scan timing counts).
    nccf_by_conv: bool = False


def _nccf(
    x: Array,
    n_frames: int,
    hop: int,
    window: int,
    kmin: int,
    kmax: int,
    by_conv: bool = False,
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
    # hop-aligned windows via reshape+concat, not gather (TPU gathers
    # are scalar-issue; see stft.strided_windows)
    frames = strided_windows(x, n_frames, hop, span)  # [T, span]

    if by_conv:
        # cross-correlation numerator as a per-frame depthwise conv:
        # each frame is its own group, its filter is its own first
        # `window` samples, and a VALID conv against the full span
        # produces sum_n x[n] x[n+k] at output position k directly
        # (span = window + kmax, so positions cover every lag).
        # PitchParams.nccf_by_conv documents the A/B status.
        out = jax.lax.conv_general_dilated(
            frames[None],                 # [1, T, span]  (channels = T)
            frames[:, None, :window],     # [T, 1, window] per-frame filter
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=n_frames,
        )
        num = out[0, :, kmin : kmax + 1]  # [T, L] sum x[n] x[n+k]
    else:
        # cross-correlation numerator via rfft (linear correlation: pad
        # to >= span + window)
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
    # segment sums at seg_start[t, l] = starts[t] + kmin + l (+window):
    # for each frame these are L CONSECUTIVE prefix entries, so the
    # same strided-window reshape replaces four [T, L] gathers
    def seg(prefix, base):
        return strided_windows(prefix[base:], n_frames, hop, n_lags)

    s_k = seg(sum_prefix, kmin + window) - seg(sum_prefix, kmin)
    s_0 = (sum_prefix[starts + window] - sum_prefix[starts])[:, None]
    e_k = seg(energy_prefix, kmin + window) - seg(energy_prefix, kmin)
    e_0 = (
        energy_prefix[starts + window] - energy_prefix[starts]
    )[:, None]

    w = jnp.asarray(float(window), x.dtype)
    num_c = num - s_0 * s_k / w
    e_0c = jnp.maximum(e_0 - s_0 * s_0 / w, 0.0)
    e_kc = jnp.maximum(e_k - s_k * s_k / w, 0.0)
    return num_c * jax.lax.rsqrt(e_0c * e_kc + 1e-12)


def _top_k_by_max(x: Array, k: int):
    """Exact top-k of each row by k repeated max/argmax passes.

    Bit-identical to ``jax.lax.top_k`` (descending values; ties broken
    toward the lower index — argmax returns the first maximum, as does
    top_k's stable sort) without the XLA ``sort`` lowering: k
    max-reduce passes over [T, L], ~50x fewer ops than the sort for
    k=12, L~295. MEASURED LOSS anyway (6.87 -> 7.12 ms/batch in-scan):
    the 12 serially-dependent argmax passes cost more in issue latency
    than the sort's extra ops cost in VPU time, so ``topk_by_sort``
    defaults True and this stays as the measured alternative.
    Enforced against the top_k oracle in tests/test_pitch.py.
    """
    t, length = x.shape
    iota = jnp.arange(length)[None, :]

    def pick(carry, _):
        cur = carry
        pos = jnp.argmax(cur, axis=-1)  # first max per row: [T]
        val = jnp.take_along_axis(cur, pos[:, None], axis=-1)[:, 0]
        cur = jnp.where(iota == pos[:, None], -jnp.inf, cur)
        return cur, (val, pos.astype(jnp.int32))

    _, (vals, idx) = jax.lax.scan(pick, x, None, length=k)
    return vals.T, idx.T  # [T, k] each, descending like top_k


def _candidates(nccf: Array, kmin: int, params: PitchParams):
    """Pick top-K local maxima per frame with parabolic refinement.

    nccf: [T, L]. Returns (lag [T, K] float, score [T, K]).
    """
    t, n_lags = nccf.shape
    left = jnp.pad(nccf[:, :-1], ((0, 0), (1, 0)), constant_values=-2.0)
    right = jnp.pad(nccf[:, 1:], ((0, 0), (0, 1)), constant_values=-2.0)
    is_peak = (nccf >= left) & (nccf > right)
    masked = jnp.where(is_peak, nccf, -2.0)
    if params.topk_by_sort:
        score, pos = jax.lax.top_k(masked, params.num_cands)  # [T, K]
    else:
        score, pos = _top_k_by_max(masked, params.num_cands)

    # parabolic interpolation around each peak for sub-sample lag.
    # The neighbor lookups are one-hot dots, not take_along_axis: three
    # [T, K] gathers from [T, L] cost 0.58 ms EACH on TPU (scalar-issue
    # loads; round-3 preprocessing profile), while a single-nonzero
    # one-hot contraction is exact (one 1.0*x term plus 0.0 terms) and
    # runs on the vector units. `left`/`right` are the shifted copies
    # already built for peak detection, so ym/yp index at pos_c itself.
    pos_c = jnp.clip(pos, 1, n_lags - 2)
    onehot = (
        pos_c[:, None, :, None] == jnp.arange(n_lags)[None, None, None, :]
    )  # [T, 1, K, L] bool
    neighbors = jnp.stack([left, nccf, right], axis=1)  # [T, 3, L]
    picked = jnp.sum(
        jnp.where(onehot, neighbors[:, :, None, :], 0.0), axis=-1
    )  # [T, 3, K] — select+reduce fuses; exactly one term survives,
    # so the result is bit-identical to the gather (no MXU rounding)
    ym, y0, yp = picked[:, 0], picked[:, 1], picked[:, 2]
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

    Dispatches to the serial ``lax.scan`` decoder by default (the
    measured winner at this geometry — see PitchParams); the parallel
    associative-scan decoder (``params.parallel_viterbi=True``) is
    equal up to float reassociation (tests/test_pitch.py pins them
    against each other on random candidate fields).
    """
    if params.parallel_viterbi:
        return _viterbi_parallel(lag, score, kmax, params)
    if params.block_viterbi > 1:
        return _viterbi_block(lag, score, kmax, params)
    return _viterbi_scan(lag, score, kmax, params)


def _transition_stack(local_v, local_u, log_lag, params: PitchParams):
    """Min-plus transition stack M[t] for t = 1..T-1 ([T-1, S, S], with
    the arrival local cost folded into the destination column) plus the
    [T, S] local-cost table — shared by the parallel and block
    decoders; matches the serial decoder's costs exactly."""
    t, k = log_lag.shape
    s = k + 1
    trans_vv = params.freq_weight * jnp.abs(
        log_lag[1:, None, :] - log_lag[:-1, :, None]
    )  # [T-1, K_prev, K_cur]
    m = jnp.full((t - 1, s, s), params.trans_cost, log_lag.dtype)
    m = m.at[:, :k, :k].set(trans_vv)
    m = m.at[:, k, k].set(0.0)  # unvoiced -> unvoiced is free
    local = jnp.concatenate([local_v, local_u[:, None]], axis=1)  # [T, S]
    return m + local[1:, None, :], local


def _states_to_output(states, lag, usable, k):
    """Shared tail of every decoder: states [T] -> (best_lag, voiced)."""
    voiced = states < k
    state_c = jnp.clip(states, 0, k - 1)
    best_lag = jnp.take_along_axis(lag, state_c[:, None], axis=1)[:, 0]
    has_cand = jnp.take_along_axis(usable, state_c[:, None], axis=1)[:, 0]
    return best_lag, voiced & has_cand


def _viterbi_block(
    lag: Array, score: Array, kmax: int, params: PitchParams
):
    """Radix-``block_viterbi`` block Viterbi.

    The serial decoder's cost is pure sequential-issue latency: 2 x T
    scan steps (forward DP + backtrace) of tiny [S, S] work. The full
    associative scan removes the latency but materializes log2(T)
    levels of [T, S, S, S] min-plus — a measured LOSS at S=13
    (PitchParams.parallel_viterbi). This decoder takes the middle: each
    group of k transitions is pre-combined into ONE composite min-plus
    matrix (k-1 levels of [T/k, S, S, S] work, vectorized across
    blocks), the serial scans walk only ceil(T/k) composites, and the
    per-frame costs / backpointers / states are reconstructed pointwise
    from within-block prefix composites — all frames at once. Sequential
    steps drop k-fold; total FLOPs grow ~2x (bounded, unlike the full
    scan's log T blowup).

    Equal to the serial decoder up to float reassociation of path-cost
    sums (same caveat as the parallel decoder; ties break identically:
    argmin -> first minimum -> voiced block first).
    """
    t, k = lag.shape
    usable, local_v, local_u, log_lag = _local_costs(
        lag, score, kmax, params
    )
    s = k + 1
    radix = int(params.block_viterbi)
    if t == 1:
        states = jnp.argmin(
            jnp.concatenate([local_v[0], local_u[0][None]])
        )[None]
        return _states_to_output(states, lag, usable, k)

    m, local = _transition_stack(local_v, local_u, log_lag, params)

    # pad the T-1 transitions to a whole number of blocks with min-plus
    # identities (0 diagonal, "infinite" off-diagonal — large enough to
    # lose every argmin against any real path cost, small enough that
    # composite sums stay finite in f32)
    n_blocks = -(-(t - 1) // radix)
    pad = n_blocks * radix - (t - 1)
    ident = jnp.where(jnp.eye(s, dtype=bool), 0.0, 1e12).astype(m.dtype)
    m_pad = jnp.concatenate(
        [m, jnp.broadcast_to(ident, (pad, s, s))], axis=0
    ).reshape(n_blocks, radix, s, s)

    def min_plus(a, b):
        return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    # within-block PREFIX composites P[b, j] = M[b,0] (x) ... (x) M[b,j]
    # (j serial levels, each vectorized over all blocks)
    prefs = [m_pad[:, 0]]
    for j in range(1, radix):
        prefs.append(min_plus(prefs[-1], m_pad[:, j]))
    prefix = jnp.stack(prefs, axis=1)  # [n_blocks, radix, S, S]

    # serial scan over block composites -> block-END cost vectors
    def fstep(v, comp):
        v2 = jnp.min(v[:, None] + comp, axis=0)
        return v2, v2

    v0 = local[0]
    _, block_ends = jax.lax.scan(fstep, v0, prefix[:, -1])
    entries = jnp.concatenate([v0[None], block_ends[:-1]])  # [n_blocks, S]

    # per-frame costs, all blocks at once: cost[1 + b*radix + j] =
    # min_p entries[b, p] + P[b, j, p, s]
    inner = jnp.min(
        entries[:, None, :, None] + prefix, axis=2
    )  # [n_blocks, radix, S]
    cost = jnp.concatenate(
        [v0[None], inner.reshape(n_blocks * radix, s)[: t - 1]]
    )  # [T, S]

    # backpointers pointwise from the UNpadded transition stack
    back = jnp.argmin(cost[:-1, :, None] + m, axis=1)  # [T-1, S]
    end_state = jnp.argmin(cost[-1])

    # backtrace, block-composed: within each block build SUFFIX
    # compositions Sfx[b, j] = g_j o g_{j+1} o ... o g_{radix-1}
    # (g_t = back[t]: state at frame t+1 -> state at frame t), pad with
    # identity maps past T-1
    id_map = jnp.arange(s, dtype=back.dtype)
    back_pad = jnp.concatenate(
        [back, jnp.broadcast_to(id_map, (pad, s))]
    ).reshape(n_blocks, radix, s)
    sufs = [back_pad[:, radix - 1]]
    for j in range(radix - 2, -1, -1):
        sufs.append(jnp.take_along_axis(back_pad[:, j], sufs[-1], axis=-1))
    suffix = jnp.stack(sufs[::-1], axis=1)  # [n_blocks, radix, S]

    # serial scan over block maps: boundary state at frame (b+1)*radix
    def bstep(state, h):
        return h[state], state

    _, boundaries = jax.lax.scan(
        bstep, end_state, suffix[:, 0], reverse=True
    )  # boundaries[b] = state at frame (b+1)*radix (end_state past T-1)

    # inner states pointwise: state[b*radix + j] = Sfx[b, j][boundary_b]
    inner_states = jnp.take_along_axis(
        suffix, boundaries[:, None, None], axis=-1
    )[..., 0]  # [n_blocks, radix]; flat index i = state at frame i
    # frame T-1: covered by the identity padding (which maps it to
    # end_state) unless T-1 is an exact block multiple — append
    # end_state explicitly so both cases trim correctly
    states = jnp.concatenate(
        [inner_states.reshape(-1), end_state[None]]
    )[:t]
    return _states_to_output(states, lag, usable, k)


def _local_costs(lag: Array, score: Array, kmax: int, params: PitchParams):
    """Shared per-frame candidate costs for both Viterbi decoders.

    Returns (usable [T, K], local_v [T, K], local_u [T], log_lag [T, K]).
    """
    usable = score > params.cand_thresh
    lag_term = 1.0 - params.lag_weight * lag / kmax
    local_v = jnp.where(usable, 1.0 - score * lag_term, 1e6)  # [T, K]
    local_u = params.voice_bias + jnp.maximum(score.max(axis=1), 0.0)
    log_lag = jnp.log(jnp.maximum(lag, 1.0))  # [T, K]
    return usable, local_v, local_u, log_lag


def _viterbi_parallel(
    lag: Array, score: Array, kmax: int, params: PitchParams
):
    """Parallel Viterbi: two ``associative_scan``s instead of T serial steps.

    The serial decoder (``_viterbi_scan``) is latency-bound on TPU: a
    T-step ``lax.scan`` whose per-step work is a [K, K] min-plus — the
    device profile charged it ~0.4 ms/dispatch, all sequential-issue
    latency. The forward DP is a min-plus matrix chain, which is
    associative, so the whole recurrence runs in ceil(log2 T) levels:

        cost[t] = v0 (x) M[1] (x) ... (x) M[t]        (min-plus)
        M[t][p, s] = trans[t][p, s] + local[t][s]

    with prefix products from ``jax.lax.associative_scan`` over the
    [T-1, S, S] transition stack (S = K+1 states; K voiced + 1
    unvoiced). Backpointers then need no recurrence at all — they are
    a pointwise argmin over p of cost[t-1][p] + M[t][p, s] — and the
    backtrace state[t] = back[t+1][state[t+1]] is function composition
    over a S-element domain, also associative, so a second (reverse)
    associative scan of gather-compositions yields every state in
    log2 T levels.

    Equal to the serial decoder up to float reassociation of the cost
    sums (which can flip exact argmin ties); tie-breaking order is
    preserved (argmin takes the first minimum = lowest voiced index,
    and the voiced block precedes the unvoiced state, matching the
    serial decoder's ``<=`` preference for voiced-on-tie).
    """
    t, k = lag.shape
    usable, local_v, local_u, log_lag = _local_costs(
        lag, score, kmax, params
    )
    s = k + 1  # states per frame: K voiced + unvoiced
    if t == 1:  # degenerate clip: no transitions to scan over
        states = jnp.argmin(
            jnp.concatenate([local_v[0], local_u[0][None]])
        )[None]
        voiced = states < k
        state_c = jnp.clip(states, 0, k - 1)
        best_lag = jnp.take_along_axis(lag, state_c[:, None], axis=1)[:, 0]
        has_cand = jnp.take_along_axis(
            usable, state_c[:, None], axis=1
        )[:, 0]
        return best_lag, voiced & has_cand

    # transition stack M[t] for t = 1..T-1 with arrival costs folded in
    # (shared with the block decoder)
    m, local = _transition_stack(local_v, local_u, log_lag, params)

    def min_plus(a, b):
        # (A (x) B)[p, s] = min_m A[p, m] + B[m, s]; leading dims map
        # over the scan axis.
        return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(min_plus, m)  # [T-1, S, S]
    v0 = local[0]  # [S]
    cost = jnp.concatenate(
        [v0[None, :], jnp.min(v0[None, :, None] + prefix, axis=1)]
    )  # [T, S]: cost[t][s] = cheapest path ending in state s at frame t

    # backpointers, all frames at once: back[t][s] = argmin_p
    # cost[t-1][p] + M[t][p, s]  (argmin -> first minimum -> voiced
    # states win exact ties, then lower candidate index, as in the
    # serial decoder)
    back = jnp.argmin(cost[:-1, :, None] + m, axis=1)  # [T-1, S]
    end_state = jnp.argmin(cost[-1])

    # backtrace as associative composition of the maps f_t = back[t]:
    # state[t] = back[t][back[t+1][... back[T-1][end]]]. With
    # reverse=True, associative_scan internally flips the sequence, so
    # combine receives (higher-index block a, lower-index block b) in
    # flipped order and must apply a first: combine(a, b)[i] = b[a[i]]
    # (verified against the serial backtrace in tests/test_pitch.py).
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    suffix = jax.lax.associative_scan(compose, back, reverse=True)
    states = jnp.concatenate(
        [suffix[:, end_state], end_state[None]]
    )  # [T]

    voiced = states < k
    state_c = jnp.clip(states, 0, k - 1)
    best_lag = jnp.take_along_axis(lag, state_c[:, None], axis=1)[:, 0]
    has_cand = jnp.take_along_axis(usable, state_c[:, None], axis=1)[:, 0]
    return best_lag, voiced & has_cand


def _viterbi_scan(lag: Array, score: Array, kmax: int, params: PitchParams):
    """Serial (lax.scan) Viterbi — the reference decoder.

    lag, score: [T, K]. Returns (best_lag [T], voiced [T]).
    """
    t, k = lag.shape
    # local costs: voiced = 1 - score*(1 - lag_weight*lag/kmax);
    # unusable candidates are barred. unvoiced = voice_bias + best score.
    usable, local_v, local_u, log_lag = _local_costs(
        lag, score, kmax, params
    )

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
        nccf = _nccf(
            xi, n_frames, hop, params.window, kmin, kmax,
            by_conv=params.nccf_by_conv,
        )
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

"""Shape-static random resampling (the triple-bottleneck's key trick).

The reference's ``InterpLnr`` (model.py:355-436) splits each sequence into
random segments of length U{19..31}, linearly resamples every segment by an
independent factor U(0.5, 1.5), concatenates the surviving frames and
re-pads to ``max_len_pad`` — destroying rhythm information on the paths it
is applied to, which is what forces the bottlenecks to specialize.

The reference implementation is ragged: it materializes variable-length
sequences with a data-dependent ``torch.split`` and re-pads. That shape
dynamism is hostile to XLA, so this implementation is a from-scratch,
fully shape-static redesign built on one observation:

    within a segment, the valid-output mask is a *prefix* of the index
    range (floor(idx/scale) is non-decreasing in idx and both validity
    thresholds are per-segment constants), so the output rank of a valid
    element is its index, and the global output position is just
    ``exclusive_cumsum(counts)[segment] + idx``.

That turns the whole op into: two small PRNG draws, one gather (source
frames), one fused multiply-add (linear interpolation), and one scatter to
static positions with an out-of-range "trash row" absorbing masked lanes.
No data-dependent shapes anywhere; everything fuses under jit.

Distribution equivalence with the reference (same segment-length and scale
laws, same masking and truncation semantics) is covered by
tests/test_interp.py, which injects identical random draws into both this
op and a torch oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Resample formulation: one-hot matmul (MXU, scatter-free AD — the TPU
# choice) vs per-row gathers (the CPU choice). None = pick by backend;
# tests pin each explicitly to cross-check the two.
FORCE_MATMUL: Optional[bool] = None


def _use_matmul() -> bool:
    if FORCE_MATMUL is not None:
        return FORCE_MATMUL
    return jax.default_backend() == "tpu"


def random_resample(
    x: Array,
    len_seq: Array,
    key: jax.Array,
    *,
    min_len_seg: int = 19,
    max_len_seg: int = 32,
    max_len_seq: int = 128,
    max_len_pad: int = 192,
    train: bool = True,
    example_ids: Optional[Array] = None,
) -> Array:
    """Randomly time-resample each sequence in a batch, shape-statically.

    Args:
      x: ``[B, T, C]`` padded sequences; ``T`` must equal ``max_len_pad``
        in the reference configuration but any static T >= 2 works.
      len_seq: ``[B]`` true sequence lengths (int).
      key: PRNG key consumed only in train mode.
      train: in eval mode this is the identity (ref: model.py:382-383).
      example_ids: ``[B]`` int ids naming each row's position in the
        GLOBAL batch (default ``arange(B)``). Draws are keyed per example
        as ``fold_in(key, id)``, which makes the augmentation stream
        *placement-invariant*: a ``shard_map`` shard holding global rows
        [4..8) passes ids [4..8) and draws exactly what a single-device
        or pjit program draws for those rows, so explicit-collective and
        GSPMD training trajectories coincide (same i.i.d. laws as the
        reference either way — model.py:392-402 draws fresh per row).

    Returns:
      ``[B, max_len_pad, C]`` resampled, zero-padded sequences.
    """
    if not train:
        return x

    batch, t_in, _ = x.shape
    num_seg = max_len_seq // min_len_seg + 1  # ref: model.py:365
    seg_span = max_len_seg * 2  # output indices per segment, ref:389

    if example_ids is None:
        example_ids = jnp.arange(batch)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, example_ids)
    k_scale, k_len = jax.vmap(jax.random.split, (0, None), 1)(keys, 2)
    # per-segment resampling factor U(0.5, 1.5)   (ref: model.py:392-393)
    scales = (
        jax.vmap(lambda k: jax.random.uniform(k, (num_seg,)))(k_scale) + 0.5
    )
    # per-segment length U{min_len_seg .. max_len_seg-1} (ref: 399-402)
    len_seg = jax.vmap(
        lambda k: jax.random.randint(k, (num_seg,), min_len_seg, max_len_seg)
    )(k_len)

    return resample_fixed(
        x, len_seq, scales, len_seg, max_len_pad=max_len_pad,
        seg_span=seg_span,
    )


def resample_fixed(
    x: Array,
    len_seq: Array,
    scales: Array,
    len_seg: Array,
    *,
    max_len_pad: int,
    seg_span: Optional[int] = None,
) -> Array:
    """Deterministic core of :func:`random_resample`.

    Split out so tests can drive it with externally fixed draws and match
    the torch oracle exactly (see module docstring).

    Args:
      x: ``[B, T, C]``.
      len_seq: ``[B]``.
      scales: ``[B, S]`` per-segment resampling factors.
      len_seg: ``[B, S]`` per-segment source lengths.
      max_len_pad: static output length.
      seg_span: static per-segment output index range (default 2*32).
    """
    batch, t_in, channels = x.shape
    num_seg = scales.shape[1]
    span = seg_span if seg_span is not None else 64

    # per-segment output counts, via the prefix property: within a
    # segment the valid-output mask is a prefix of the index range, so
    # count = #{idx : floor(idx/scale) < len_seg-1 and
    #                 floor(idx/scale)+offset_in < len_seq-1}
    idx = jnp.arange(span)[None, None, :]  # [1, 1, L]
    idx_fl_all = jnp.floor(idx / scales[:, :, None])  # [B, S, L]
    offset_in = jnp.cumsum(len_seg, axis=1) - len_seg  # [B, S]
    valid_all = (idx_fl_all < (len_seg[:, :, None] - 1)) & (
        idx_fl_all + offset_in[:, :, None] < (len_seq[:, None, None] - 1)
    )
    counts = jnp.sum(valid_all, axis=2)  # [B, S]
    offset_out = jnp.cumsum(counts, axis=1) - counts  # [B, S]

    # OUTPUT-centric indexing: every output frame t locates its segment
    # (the last one whose output offset <= t), recovers its within-
    # segment rank, and computes its source position directly. Exactly
    # the same arithmetic as the reference's element-wise mapping, but
    # with NO scatter: one [B, T_out] gather pair instead of a
    # [B, S*L] gather + scatter (XLA TPU scatters serialize; this cut
    # the op's cost ~2x and shrinks gather volume by span/max_len_pad).
    t_pos = jnp.arange(max_len_pad)[None, :]  # [1, T_out]
    seg = (
        jnp.sum(
            t_pos[:, :, None] >= offset_out[:, None, :], axis=2
        )
        - 1
    )  # [B, T_out] index of covering segment
    seg_c = jnp.clip(seg, 0, num_seg - 1)

    def take(a):  # [B, S] -> [B, T_out] per-position segment attribute
        return jnp.take_along_axis(a, seg_c, axis=1)

    rank = t_pos - take(offset_out)  # within-segment output rank = idx
    scale_t = take(scales)
    idx_scaled = rank / scale_t
    idx_fl = jnp.floor(idx_scaled)
    lam = (idx_scaled - idx_fl).astype(x.dtype)[:, :, None]
    src = idx_fl.astype(jnp.int32) + take(offset_in)  # [B, T_out]
    valid = rank < take(counts)  # false past the total output length

    src_c = jnp.clip(src, 0, t_in - 2)
    if _use_matmul():
        # One-hot-matrix formulation: y = M @ x with M [B, T_out, T_in]
        # holding (1-lam) at src and lam at src+1 (masked rows zero).
        # On TPU this routes the resample AND its whole AD through the
        # MXU: the gather form's forward costs two [B*T_out, C] row
        # gathers and its transpose two scatter-adds, and this op runs
        # on [*, 768] activations three times per step inside the joint
        # content+pitch encoder (ref model.py:199-206 interleaving), so
        # the gathers/scatters totalled ~0.9 ms/step at the reference
        # geometry — vs ~0.9 GFLOP of matmul per application, noise on
        # the MXU. Products are the same two terms per output frame
        # (plus exact zeros), so numerics match the gather path to f32
        # matmul rounding; tests/test_interp.py pins both paths.
        s_pos = jnp.arange(t_in)[None, None, :]  # [1, 1, T_in]
        src_b = src_c[:, :, None]
        m = jnp.where(s_pos == src_b, 1.0 - lam, 0.0) + jnp.where(
            s_pos == src_b + 1, lam, 0.0
        )
        m = jnp.where(valid[:, :, None], m, 0.0)
        # Precision.HIGH (3-pass bf16) keeps ~f32 accuracy on the two
        # nonzero products per row at half the MXU passes of HIGHEST;
        # measured vs the gather path at atol 2e-5 in tests.
        return jnp.einsum(
            "bts,bsc->btc", m, x.astype(jnp.float32),
            precision=jax.lax.Precision.HIGH,
        ).astype(x.dtype)
    x_fl = jnp.take_along_axis(x, src_c[:, :, None], axis=1)
    x_cl = jnp.take_along_axis(x, (src_c + 1)[:, :, None], axis=1)
    y = (1.0 - lam) * x_fl + lam * x_cl  # [B, T_out, C]
    return jnp.where(valid[:, :, None], y, 0.0)

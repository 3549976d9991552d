"""Multi-stream fused BiLSTM kernel: N independent recurrences, one grid.

Why this exists: a 192-step recurrence on TPU has a hard latency floor —
each cell is a chain of dependent VPU ops, so a narrow LSTM costs ~0.08
ms at T=192 *regardless of width* (H=1, 8 and 32 all measure the same;
see BENCHMARKS.md "Device profile"). The three bottleneck encoders of
the SpeechSplit generator (content layer 0, pitch, rhythm — ref
model.py:214-215 lstm_1/lstm_2 and model.py:71 Encoder_t's lstm) are
*independent* of each other, yet as separate kernels they serialize:
3 launches x 0.08 ms. This kernel advances all N streams (2N directions)
inside one grid step, so the streams' dependency chains interleave in
the VLIW pipeline and the whole group costs about as much as one stream
— the same trick ops/pallas_lstm.py's merged-bidirectional kernel plays
for the two directions of one layer, generalized across layers.

Streams may have different hidden widths and input widths; each
direction keeps its own weights resident in VMEM and its own h/c
scratch. Numerics per stream are bit-identical to
``pallas_lstm.bilstm_sequence`` (same cell code, same f32 state);
tests/test_pallas_multilstm.py checks values and gradients against
per-stream ``bilstm_sequence`` in interpret mode.

Layout contract (same as bilstm_sequence, round-3 convention): per
stream s, ``xp_f[s]`` and ``xp_b[s]`` [T, B, 4H_s] projected inputs in
REAL time order for both directions; returns per stream
(h_f [T,B,H_s], h_b [T,B,H_s]), both in real time order. Backward
directions are realized through reversed block index maps and
back-to-front row processing — no flipped activation copies in HBM,
and the grad kernel reads each cell's c_prev from neighbor rows /
single-row edge blocks of the saved c instead of materialized shift
copies (see pallas_lstm's merged-bidirectional kernels).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speechsplit_tpu.ops import pallas_lstm

Array = jax.Array

_MAX_FOLD = 16


def _pad_lane(c: int) -> int:
    return -(-c // 128) * 128


def _ms_vmem_bytes(fold: int, b: int, hs: Sequence[int]) -> float:
    """Worst-case scoped-VMEM bound for the multi-stream kernels.

    The per-stream sum of pallas_lstm._bd_vmem_bytes UNDERCOUNTS here
    and caused a real compile-time OOM (B=128: 18.75 MiB actual vs a
    ~14.2 MiB estimate that skipped the vmem_limit raise): these
    streams are NARROW (H = 1/8/32), and Mosaic tiles every VMEM block
    (8, 128), so a [fold, B, H] block occupies ``B_pad x pad128(H)``
    lanes — up to 128x its nominal bytes for H=1. This bound counts the
    PADDED footprint of every streamed block (worst-case f32
    residuals), resident weights and carry scratch, with the same 2x
    double-buffering guarantee as the merged-bidir bound. Measured
    check: B=128/fold=16 padded block set = 18.0 MiB vs Mosaic's
    18.75 MiB actual (~1.04x single-buffered there); 2x keeps the
    no-OOM guarantee where Mosaic does buffer fully.
    """
    sub_b = -(-b // 8) * 8
    weights = 0.0
    scratch = 0.0
    blocks = 0.0  # bytes per fold unit, all streamed blocks, one buffer
    for h in hs:
        hp, fhp = _pad_lane(h), _pad_lane(4 * h)
        hrows = -(-h // 8) * 8
        for _direction in range(2):
            weights += hrows * fhp * 4
            scratch += 2 * sub_b * hp * 4
            # fwd: xp(f32) + h(f32) + g(resid) + c(resid); bwd streams
            # the same four widths (dh, g, c, dx) plus [1,B,H] edges —
            # worst case both residuals at f32 width
            blocks += sub_b * (fhp * 4 + hp * 4 + fhp * 4 + hp * 4)
        # bwd c-edge blocks: one [1, B, Hp] per direction
        scratch += 2 * sub_b * hp * 4
    return weights + scratch + 2.0 * blocks * fold


def _fold_for(t: int, b: int, hs: Sequence[int]) -> int:
    """Largest fold <= 16 dividing t whose padded worst-case VMEM bound
    fits Mosaic's default stack (same policy as pallas_lstm._fold_for)."""
    for fold in range(_MAX_FOLD, 0, -1):
        if t % fold == 0 and _ms_vmem_bytes(
            fold, b, hs
        ) <= 0.95 * pallas_lstm._MOSAIC_DEFAULT_VMEM:
            return fold
    return 1


def fits(t: int, b: int, hs: Sequence[int]) -> bool:
    """Can the multi-stream kernels compile for these shapes? (~7 MiB
    at B=128 with the fold _fold_for picks; kept as a guard for exotic
    configs.)"""
    return _ms_vmem_bytes(
        _fold_for(t, b, hs), b, hs
    ) <= 0.9 * pallas_lstm._VMEM_CEILING


# ---------------------------------------------------------------- kernels


def _fwd_kernel(n: int, *refs):
    """refs: [xp_f0, xp_b0, ... xp_f{n-1}, xp_b{n-1}, w_f0, w_b0, ...]
    then outputs [h_f0, h_b0, ..., g_f0, g_b0, ..., c_f0, c_b0, ...]
    then scratch [hst_f0, cst_f0, hst_b0, cst_b0, ...]."""
    xp = refs[: 2 * n]
    w = refs[2 * n : 4 * n]
    h_out = refs[4 * n : 6 * n]
    g_out = refs[6 * n : 8 * n]
    c_out = refs[8 * n : 10 * n]
    st = refs[10 * n : 14 * n]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for s in st:
            s[:] = jnp.zeros_like(s)

    fold = xp[0].shape[0]
    for k in range(fold):
        # interleave all 2n directions at each folded timestep: their
        # dependency chains are independent, which is the whole point.
        # Odd d = backward directions: their blocks arrive via reversed
        # index maps, and rows are walked back->front so the recurrence
        # runs T-1 -> 0 while HBM data stays in real time order.
        for d in range(2 * n):
            kd = k if d % 2 == 0 else fold - 1 - k
            h_st, c_st = st[2 * d], st[2 * d + 1]
            h, c, gates = pallas_lstm._cell(
                xp[d][kd], w[d][:], h_st[:], c_st[:]
            )
            h_out[d][kd] = h
            g_out[d][kd] = gates.astype(g_out[d].dtype)
            c_out[d][kd] = c.astype(c_out[d].dtype)
            h_st[:], c_st[:] = h, c


def _infer_kernel(n: int, *refs):
    """Lean forward: no residual outputs (inference path)."""
    xp = refs[: 2 * n]
    w = refs[2 * n : 4 * n]
    h_out = refs[4 * n : 6 * n]
    st = refs[6 * n : 10 * n]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for s in st:
            s[:] = jnp.zeros_like(s)

    fold = xp[0].shape[0]
    for k in range(fold):
        for d in range(2 * n):
            kd = k if d % 2 == 0 else fold - 1 - k
            h_st, c_st = st[2 * d], st[2 * d + 1]
            h, c, _ = pallas_lstm._cell(
                xp[d][kd], w[d][:], h_st[:], c_st[:]
            )
            h_out[d][kd] = h
            h_st[:], c_st[:] = h, c


def _bwd_kernel(n: int, *refs):
    """refs: [dh_f0, dh_b0, ..., g_*, c_*, ce_*, w_*] (each group 2n;
    ce = single-row c edge blocks) then outputs [dx_f0, dx_b0, ...]
    then scratch [dh_st, dc_st] x 2n.

    Forward directions (even d) walk real time descending — reversed
    block maps, rows back->front; backward directions walk ascending.
    Each cell's c_prev (its predecessor in PROCESSING order: t-1 for
    even d, t+1 for odd) reads the neighbor row of the streamed c
    block, except the one row crossing the block boundary, which
    streams as a [1, B, H] edge block; the final grid step's boundary
    cell is the recurrence's first, whose c_prev is the zero state.
    """
    dh = refs[: 2 * n]
    g = refs[2 * n : 4 * n]
    c = refs[4 * n : 6 * n]
    ce = refs[6 * n : 8 * n]
    w = refs[8 * n : 10 * n]
    dx = refs[10 * n : 12 * n]
    st = refs[12 * n : 16 * n]
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _():
        for s in st:
            s[:] = jnp.zeros_like(s)

    fold = g[0].shape[0]
    for k in reversed(range(fold)):
        for d in range(2 * n):
            if d % 2 == 0:
                kd = k  # descending (loop is reversed)
                if kd > 0:
                    cp = c[d][kd - 1].astype(jnp.float32)
                else:
                    cp = jnp.where(
                        i == last, 0.0, ce[d][0].astype(jnp.float32)
                    )
            else:
                kd = fold - 1 - k  # ascending
                if kd < fold - 1:
                    cp = c[d][kd + 1].astype(jnp.float32)
                else:
                    cp = jnp.where(
                        i == last, 0.0, ce[d][0].astype(jnp.float32)
                    )
            dh_st, dc_st = st[2 * d], st[2 * d + 1]
            d_pre, new_dh, new_dc = pallas_lstm._cell_bwd(
                dh[d][kd], g[d][kd], c[d][kd], cp, w[d][:],
                dh_st[:], dc_st[:],
            )
            dx[d][kd] = d_pre
            dh_st[:], dc_st[:] = new_dh, new_dc


# ------------------------------------------------------------- wrappers


def _specs(t, b, four_hs, fold, grad=False):
    """Per-direction block specs. Even directions (forward) ascend in
    the fwd/infer kernels and descend in the grad kernel; odd
    directions (backward) the opposite — all data stays in real time
    order in HBM."""
    grid = t // fold
    seq = lambda i: (i, 0, 0)
    rev = lambda i: (grid - 1 - i, 0, 0)

    def walk(d):
        ascending = (d % 2 == 0) != grad
        return seq if ascending else rev

    full = lambda i: (0, 0)
    xs = [
        pl.BlockSpec((fold, b, fh), walk(d), memory_space=pltpu.VMEM)
        for d, fh in enumerate(four_hs)
    ]
    hs = [
        pl.BlockSpec(
            (fold, b, fh // 4), walk(d), memory_space=pltpu.VMEM
        )
        for d, fh in enumerate(four_hs)
    ]
    ws = [
        pl.BlockSpec((fh // 4, fh), full, memory_space=pltpu.VMEM)
        for fh in four_hs
    ]
    return xs, hs, ws


def _edge_specs(t, b, four_hs, fold):
    """[1, B, H] c-edge blocks for the grad kernel, sliced from the
    saved c arrays by shifted index maps (see _bwd_kernel)."""
    grid = t // fold
    out = []
    for d, fh in enumerate(four_hs):
        if d % 2 == 0:  # walks descending; edge = row before block
            em = lambda i, f=fold, g=grid: (
                jnp.maximum((g - 1 - i) * f - 1, 0), 0, 0
            )
        else:  # walks ascending; edge = row after block
            em = lambda i, f=fold, tt=t: (
                jnp.minimum((i + 1) * f, tt - 1), 0, 0
            )
        out.append(
            pl.BlockSpec((1, b, fh // 4), em, memory_space=pltpu.VMEM)
        )
    return out


def _scratch(b, four_hs):
    out = []
    for fh in four_hs:
        out += [
            pltpu.VMEM((b, fh // 4), jnp.float32),
            pltpu.VMEM((b, fh // 4), jnp.float32),
        ]
    return out


def _vmem(fold, b, four_hs):
    # the SAME padded estimate _fold_for/fits use (ADVICE r2 asked for
    # consistency; the padded bound replaced the per-stream _bd sum
    # after the B=128 compile OOM — see _ms_vmem_bytes)
    return pallas_lstm._vmem_params(
        _ms_vmem_bytes(fold, b, [fh // 4 for fh in four_hs[::2]])
    )


def _interleave(per_stream):
    """[(f, b), ...] -> [f0, b0, f1, b1, ...]"""
    out = []
    for f, b in per_stream:
        out += [f, b]
    return out


@functools.partial(jax.jit, static_argnames=("n", "residual_dtype"))
def _fwd(n, residual_dtype, *args):
    xp = args[: 2 * n]
    t, b, _ = xp[0].shape
    four_hs = [x.shape[-1] for x in xp]  # per direction (f, b alternate)
    fold = _fold_for(t, b, [fh // 4 for fh in four_hs[::2]])
    xs, hs, _ws = _specs(t, b, four_hs, fold)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n),
        grid=(t // fold,),
        in_specs=xs + _ws,
        out_specs=hs + xs + hs,
        out_shape=(
            [jax.ShapeDtypeStruct((t, b, fh // 4), jnp.float32)
             for fh in four_hs]
            + [jax.ShapeDtypeStruct((t, b, fh), residual_dtype)
               for fh in four_hs]
            + [jax.ShapeDtypeStruct((t, b, fh // 4), residual_dtype)
               for fh in four_hs]
        ),
        scratch_shapes=_scratch(b, four_hs),
        interpret=pallas_lstm.FORCE_INTERPRET,
        compiler_params=_vmem(fold, b, four_hs),
    )(*args)


@functools.partial(jax.jit, static_argnames=("n",))
def _infer(n, *args):
    xp = args[: 2 * n]
    t, b, _ = xp[0].shape
    four_hs = [x.shape[-1] for x in xp]
    fold = _fold_for(t, b, [fh // 4 for fh in four_hs[::2]])
    xs, hs, _ws = _specs(t, b, four_hs, fold)
    return pl.pallas_call(
        functools.partial(_infer_kernel, n),
        grid=(t // fold,),
        in_specs=xs + _ws,
        out_specs=hs,
        out_shape=[
            jax.ShapeDtypeStruct((t, b, fh // 4), jnp.float32)
            for fh in four_hs
        ],
        scratch_shapes=_scratch(b, four_hs),
        interpret=pallas_lstm.FORCE_INTERPRET,
        compiler_params=_vmem(fold, b, four_hs),
    )(*args)


@functools.partial(jax.jit, static_argnames=("n",))
def _bwd_call(n, *args):
    dh = args[: 2 * n]
    g = args[2 * n : 4 * n]
    t, b, _ = g[0].shape
    four_hs = [x.shape[-1] for x in g]
    fold = _fold_for(t, b, [fh // 4 for fh in four_hs[::2]])
    xs, hs, _ws = _specs(t, b, four_hs, fold, grad=True)
    es = _edge_specs(t, b, four_hs, fold)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n),
        grid=(t // fold,),
        in_specs=hs + xs + hs + es + _ws,
        out_specs=xs,
        out_shape=[
            jax.ShapeDtypeStruct((t, b, fh), jnp.float32)
            for fh in four_hs
        ],
        scratch_shapes=_scratch(b, four_hs),
        interpret=pallas_lstm.FORCE_INTERPRET,
        compiler_params=_vmem(fold, b, four_hs),
    )(*args)


# ------------------------------------------------------------ public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def multi_bilstm_sequence(
    n: int, residual_dtype, *args
) -> Tuple[Array, ...]:
    """Run n independent BiLSTMs in one fused kernel.

    args: 4n arrays — [xp_f0, xp_b0, ..., xp_f{n-1}, xp_b{n-1},
    w_f0, w_b0, ..., w_f{n-1}, w_b{n-1}] with xp_* [T, B, 4H_d] in
    REAL time order (both directions) and w_* [H_d, 4H_d]. Returns 2n
    arrays (h_f0, h_b0, ...), all in real time order, as in
    ``pallas_lstm.bilstm_sequence``. ``residual_dtype`` (None ->
    pallas_lstm.RESIDUAL_DTYPE) sets the saved-residual precision under
    jax.grad, threaded explicitly from config.residual_dtype by the
    model layer.
    """
    return tuple(_infer(n, *args))


def _vjp_fwd(n, residual_dtype, *args):
    outs = _fwd(
        n, pallas_lstm._resolve_residual(residual_dtype), *args
    )
    h = tuple(outs[: 2 * n])
    g = outs[2 * n : 4 * n]
    c = outs[4 * n : 6 * n]
    return h, (args, h, tuple(g), tuple(c))


def _vjp_bwd(n, residual_dtype, residuals, dh):
    args, h, g, c = residuals
    w = args[2 * n : 4 * n]
    # c edges stream from the saved c arrays themselves (shifted index
    # maps); no materialized _shift copies
    dx = _bwd_call(n, *dh, *g, *c, *c, *w)
    dws = []
    for d in range(2 * n):
        # dW_hh over contiguous slices: the processing-order
        # predecessor is t-1 for forward directions, t+1 for backward;
        # contraction inputs at the residual dtype (pallas_lstm.
        # _dw_contract — f32 residuals keep the path bit-exact)
        if d % 2 == 0:
            h_sl, dx_sl = h[d][:-1], dx[d][1:]
        else:
            h_sl, dx_sl = h[d][1:], dx[d][:-1]
        dws.append(
            pallas_lstm._dw_contract(
                h_sl, dx_sl, w[d], residual_dtype
            )
        )
    return (*dx, *dws)


multi_bilstm_sequence.defvjp(_vjp_fwd, _vjp_bwd)

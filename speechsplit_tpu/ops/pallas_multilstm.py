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

Layout contract (same as bilstm_sequence): per stream s,
``xp_f[s]`` [T, B, 4H_s] projected forward inputs in real time order,
``xp_b[s]`` [T, B, 4H_s] projected backward inputs ALREADY
time-reversed; returns per stream (h_f [T,B,H_s] real time,
h_b [T,B,H_s] reversed time).
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


def _fold_for(t: int, b: int, hs: Sequence[int]) -> int:
    """Largest fold <= 16 dividing t whose worst-case VMEM bound fits
    Mosaic's default stack (same policy as pallas_lstm._fold_for; the
    bound is the sum of the per-stream merged-bidir bounds)."""
    for fold in range(_MAX_FOLD, 0, -1):
        if t % fold == 0 and sum(
            pallas_lstm._bd_vmem_bytes(fold, b, h) for h in hs
        ) <= 0.95 * pallas_lstm._MOSAIC_DEFAULT_VMEM:
            return fold
    return 1


def fits(t: int, b: int, hs: Sequence[int]) -> bool:
    """Can the multi-stream kernels compile for these shapes? (The
    encoder group is tiny — ~1.6 MiB at B=128 — so this is effectively
    always True at sane batches; kept as a guard for exotic configs.)"""
    return sum(
        pallas_lstm._bd_vmem_bytes(_fold_for(t, b, hs), b, h) for h in hs
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
        # dependency chains are independent, which is the whole point
        for d in range(2 * n):
            h_st, c_st = st[2 * d], st[2 * d + 1]
            h, c, gates = pallas_lstm._cell(
                xp[d][k], w[d][:], h_st[:], c_st[:]
            )
            h_out[d][k] = h
            g_out[d][k] = gates.astype(g_out[d].dtype)
            c_out[d][k] = c.astype(c_out[d].dtype)
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
            h_st, c_st = st[2 * d], st[2 * d + 1]
            h, c, _ = pallas_lstm._cell(
                xp[d][k], w[d][:], h_st[:], c_st[:]
            )
            h_out[d][k] = h
            h_st[:], c_st[:] = h, c


def _bwd_kernel(n: int, *refs):
    """refs: [dh_f0, dh_b0, ..., g_*, c_*, cp_*, w_*] (each group 2n)
    then outputs [dx_f0, dx_b0, ...] then scratch [dh_st, dc_st] x 2n."""
    dh = refs[: 2 * n]
    g = refs[2 * n : 4 * n]
    c = refs[4 * n : 6 * n]
    cp = refs[6 * n : 8 * n]
    w = refs[8 * n : 10 * n]
    dx = refs[10 * n : 12 * n]
    st = refs[12 * n : 16 * n]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for s in st:
            s[:] = jnp.zeros_like(s)

    fold = g[0].shape[0]
    for k in reversed(range(fold)):
        for d in range(2 * n):
            dh_st, dc_st = st[2 * d], st[2 * d + 1]
            d_pre, new_dh, new_dc = pallas_lstm._cell_bwd(
                dh[d][k], g[d][k], c[d][k], cp[d][k], w[d][:],
                dh_st[:], dc_st[:],
            )
            dx[d][k] = d_pre
            dh_st[:], dc_st[:] = new_dh, new_dc


# ------------------------------------------------------------- wrappers


def _specs(t, b, four_hs, fold, rev=False):
    grid = t // fold
    if rev:
        seq = lambda i: (grid - 1 - i, 0, 0)
    else:
        seq = lambda i: (i, 0, 0)
    full = lambda i: (0, 0)
    xs = [
        pl.BlockSpec((fold, b, fh), seq, memory_space=pltpu.VMEM)
        for fh in four_hs
    ]
    hs = [
        pl.BlockSpec((fold, b, fh // 4), seq, memory_space=pltpu.VMEM)
        for fh in four_hs
    ]
    ws = [
        pl.BlockSpec((fh // 4, fh), full, memory_space=pltpu.VMEM)
        for fh in four_hs
    ]
    return xs, hs, ws


def _scratch(b, four_hs):
    out = []
    for fh in four_hs:
        out += [
            pltpu.VMEM((b, fh // 4), jnp.float32),
            pltpu.VMEM((b, fh // 4), jnp.float32),
        ]
    return out


def _vmem(fold, b, four_hs):
    return pallas_lstm._vmem_params(
        sum(
            pallas_lstm._bd_vmem_bytes(fold, b, fh // 4)
            for fh in four_hs
        )
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
    xs, hs, _ws = _specs(t, b, four_hs, fold, rev=True)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n),
        grid=(t // fold,),
        in_specs=hs + xs + hs + hs + _ws,
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def multi_bilstm_sequence(n: int, *args) -> Tuple[Array, ...]:
    """Run n independent BiLSTMs in one fused kernel.

    args: 4n arrays — [xp_f0, xp_b0, ..., xp_f{n-1}, xp_b{n-1},
    w_f0, w_b0, ..., w_f{n-1}, w_b{n-1}] with xp_* [T, B, 4H_d] and
    w_* [H_d, 4H_d] (backward streams pre-time-reversed, as in
    ``pallas_lstm.bilstm_sequence``). Returns 2n arrays
    (h_f0, h_b0, ...), the backward halves in reversed time.
    """
    return tuple(_infer(n, *args))


def _vjp_fwd(n, *args):
    outs = _fwd(n, pallas_lstm.RESIDUAL_DTYPE, *args)
    h = tuple(outs[: 2 * n])
    g = outs[2 * n : 4 * n]
    c = outs[4 * n : 6 * n]
    return h, (args, h, tuple(g), tuple(c))


def _vjp_bwd(n, residuals, dh):
    args, h, g, c = residuals
    w = args[2 * n : 4 * n]
    cp = [pallas_lstm._shift(ci) for ci in c]
    dx = _bwd_call(n, *dh, *g, *c, *cp, *w)
    dws = []
    for d in range(2 * n):
        t, b, four_h = g[d].shape
        h_dim = four_h // 4
        dws.append(
            jax.lax.dot_general(
                pallas_lstm._shift(h[d]).reshape(t * b, h_dim),
                dx[d].reshape(t * b, four_h),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(w[d].dtype)
        )
    return (*dx, *dws)


multi_bilstm_sequence.defvjp(_vjp_fwd, _vjp_bwd)

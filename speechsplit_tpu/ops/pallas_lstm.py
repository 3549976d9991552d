"""Fused Pallas LSTM-sequence kernels (the decoder hot path).

The five BiLSTM stacks are this model's FLOPs center (SURVEY.md §2.5:
the reference runs them on cuDNN, model.py:244,268). Under plain
``lax.scan`` XLA re-fetches the recurrent weight matrix and bounces the
carried state through HBM fusion boundaries every step. These kernels
run the *entire* time loop as one Pallas grid:

- the grid dimension is time (sequential on TPU by construction);
- ``W_hh`` ([H, 4H], e.g. 4 MB for the 512-wide decoder) is pinned in
  VMEM for the whole sequence;
- h/c live in VMEM scratch across grid steps — zero HBM traffic for the
  recurrence, one block load (x-projection) + one block store (h) per
  step;
- the backward pass is a second Pallas kernel walking the grid in
  reverse, accumulating ``dW_hh`` on-chip, wired up via ``custom_vjp``.

Only the input projection (one large [T*B, I] @ [I, 4H] matmul) and the
W_ih/bias gradients stay outside — they are single big MXU matmuls XLA
already handles optimally.

Applicability: gate dims must tile the MXU/VPU lanes (H and 4H multiples
of 128, batch >= 8), which covers the mel decoder (H=512) and F0 decoder
(H=256); the tiny encoder bottleneck LSTMs (H=1/8/32) stay on the scan
path — they are negligible FLOPs. ``supported()`` makes the decision;
eval/train numerics match the scan path exactly (tests/test_pallas_lstm
checks in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Tests flip this to exercise the kernels on CPU via the interpreter.
FORCE_INTERPRET = False

# Scoped-VMEM budgeting. Mosaic's default scoped-vmem stack is 16 MiB;
# the merged bidirectional kernels outgrow it at some batch sizes and
# the failure is a compile-time OOM, not a fallback (measured: the
# backward kernel allocates 16.44 MiB at B=24/fold=4 — exactly the
# weights + 2x-double-buffered streamed blocks + scratch bound below).
# ``vmem_limit_bytes`` can raise the cap (a v5e core has 128 MiB), but
# the value perturbs the surrounding XLA program: measured at the
# reference geometry, a blanket 100 MiB request costs ~5% step time on
# ops *outside* the kernel (less VMEM left for XLA's own fusion
# prefetch), while <= 24 MiB is noise. Policy, implemented by
# ``_plan_fold``/``_vmem_params``: prefer a fold whose worst-case bound
# fits the 16 MiB default (no compiler param at all — this reproduces
# every previously-measured best configuration), and only when fold=1
# still exceeds it, request a *tight* per-shape limit. _VMEM_CEILING is
# the sanity ceiling beyond which we fall back to the unmerged
# single-direction kernels instead.
_MOSAIC_DEFAULT_VMEM = 16 * 1024 * 1024
_VMEM_CEILING = 100 * 1024 * 1024

# DEFAULT dtype for the saved backward residuals (gates/c), used when a
# caller passes residual_dtype=None. bfloat16 halves the residual HBM
# traffic; once the round-2 AD-path/fusion work shrank everything else,
# that traffic (and the VMEM-staging copies feeding on it) became the
# largest remaining cost, so bf16 now buys 7% (5.41 -> 5.04 ms/step at
# reference geometry — the round-1 measure of ~1% predates those
# fixes). Gradient error is <= 2% max-relative vs the f32-residual/scan
# path; training is unaffected (loss trajectory matches f32 residuals
# to ~1e-4 relative over 400 steps, BENCHMARKS.md).
# ``config.residual_dtype`` is threaded EXPLICITLY through the model
# layers (models/layers.py LSTM.residual_dtype) down to these kernels'
# nondiff args — it is a trace-time property, and a process-global
# would let a second model's config silently change the first model's
# gradient precision on a later retrace (ADVICE r2). Kernel-level
# tests that want a specific precision pin this module default.
RESIDUAL_DTYPE = jnp.bfloat16


def _resolve_residual(residual_dtype):
    return RESIDUAL_DTYPE if residual_dtype is None else residual_dtype


# Gradient-stream dtype: the bwd kernels' dxp output ([T, B, 4H] f32
# per direction) is the single largest byte stream in the backward
# grids — at decoder geometry (T=192, B=16, 4H=2048) the two dxp
# writes are ~50 MB of a ~88 MB grid, and the kernels sit at the HBM
# roofline (BENCHMARKS.md device profiles). When the saved residuals
# are bfloat16 (the default), d_pre is already derived from
# bf16-rounded gates, and its dominant consumer `_dw_contract` casts
# it to bf16 anyway — so storing dxp in bf16 halves the stream while
# changing dW_hh/dW_ih-on-the-bf16-path numerics not at all (same
# bits after the cast) and adding only one more 2^-8-relative rounding
# to dx/db. The in-kernel dh/dc carry chain still propagates the
# UNROUNDED f32 d_pre, so the rounding does not compound across
# timesteps. f32-residual mode keeps f32 dxp — the bit-parity-with-
# scan escape hatch and parity-test mode. The flag pins the f32
# stream for A/B. Measured (round 3, BENCHMARKS.md "Gradient/xp
# stream dtype"): -1.6% step @B16 f32, -6.6% @B40 bf16; losses equal
# to 5-6 decimals.
GRAD_STREAM_FOLLOWS_RESIDUAL = True

# xp-stream dtype (the companion forward-side lever): the kernels have
# always streamed the pre-projected inputs in f32 ([T, B, 4H] per
# direction — the fwd grids' dominant input bytes) even under
# compute_dtype=bfloat16, because the projection accumulates in f32.
# When BOTH the compute and residual dtypes are bf16, rounding xp to
# bf16 before the recurrence adds one 2^-8-relative rounding to values
# the mode already rounds everywhere else, halves the fwd streams, and
# makes bf16 the NATURAL cotangent dtype for dxp (the astype at the
# custom-vjp boundary becomes a no-op). f32 compute keeps f32 xp — the
# forward numerics of the f32 path are untouched. Measured (round 3,
# BENCHMARKS.md "Gradient/xp stream dtype"): on top of the bf16 dxp
# stream, -2.1% at B40 bf16 (8.82 -> 8.63 ms/step) and ~-0.3% at B16
# bf16; identical losses to 5 decimals.
XP_STREAM_FOLLOWS_COMPUTE = True

# dh cotangent stream dtype (the third stream lever): after the dxp
# and xp levers, the incoming dh cotangents ([T, B, H] f32 per
# direction) are the backward grids' largest remaining f32 stream —
# at decoder geometry in bf16-residual mode they are ~16 of ~34
# H-bytes/(T,B) of grad-grid traffic (gates 8, c 2, dxp out 8).
# Rounding them to bf16 at the custom-vjp boundary adds one
# 2^-8-relative rounding to a cotangent the bf16 mode already derives
# from rounded operands, and the convert fuses into the upstream
# producer (the layer-above's projection-VJP dx matmul or the loss
# head), so the [T, B, H] HBM write itself becomes bf16 — the read
# AND the write halve. The in-kernel dh/dc carry chain stays f32 and
# dh_out is folded in once per cell, so the rounding does not
# compound across timesteps. Gated on RESIDUALS bf16 only (not
# compute): the hardware A/B (round 4, BENCHMARKS.md "dh/h stream
# dtype A/B") measured the win exactly in the SHIPPED f32-compute +
# bf16-residual default — -11.0% step time at B16 f32 (5.455 vs
# 6.132 ms interleaved), noise at B40 bf16 — because after the
# dxp/xp levers dh is the largest remaining f32 backward stream
# there. Rounding cotangents the forward kept at f32 was verified by
# a 400-step loss-trajectory run (benchmarks.trajectory_check
# bfloat16+f32dh vs bfloat16+dh): max relative delta 1.09e-2, all of
# it on the converged ~1.2e-3 tail (0.001242 vs 0.001256, absolute
# 1.4e-5), early steps matching to ~4e-4 — the same acceptance class
# as the round-3 bf16-residual run (7.8e-3). f32-residual mode keeps
# f32 dh — the bit-parity-with-scan escape hatch and parity-test mode.
DH_STREAM_FOLLOWS_RESIDUAL = True

# h output stream dtype (the fourth stream lever): in full-bf16 mode
# every consumer of the kernels' h outputs rounds them to bf16 anyway
# — the next layer's ``project`` and the output LinearNorm cast inputs
# to the compute dtype (models/layers.py project), and ``_dw_contract``
# casts its h operand to the residual dtype. Emitting h from the grid
# already rounded is therefore forward-BIT-IDENTICAL in that mode
# (the recurrence carry h_st stays f32 in VMEM; only the HBM block
# write rounds, with the same 2^-8 rounding the consumers applied),
# while halving the fwd grids' h writes (~2 of ~22 H-bytes per
# direction per (T,B)), the dW/dW_ih contraction reads, and making
# bf16 the NATURAL dh cotangent dtype (the primal's dtype defines it —
# no convert at the custom-vjp boundary at all). Same gate as the xp
# lever: compute AND residuals both bf16; f32 compute keeps f32 h so
# f32 forward numerics are untouched. Measured (round 4, BENCHMARKS.md
# "dh/h stream dtype A/B") before any default flip — see the dh lever's
# discipline note above.
H_STREAM_FOLLOWS_COMPUTE = False


def _dh_stream_dtype(compute_dtype, residual_dtype):
    """dtype for the incoming dh cotangent stream (compute_dtype is the
    recurrent weights' dtype, as in _h_stream_dtype, and is accepted
    for signature symmetry — the gate rides the residual dtype alone,
    like _grad_stream_dtype; see the flag comment for the measured A/B
    and the trajectory-equivalence run that justify rounding cotangents
    in the f32-compute + bf16-residual shipped default)."""
    del compute_dtype
    rd = _resolve_residual(residual_dtype)
    if DH_STREAM_FOLLOWS_RESIDUAL and rd == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _h_stream_dtype(compute_dtype, residual_dtype):
    """dtype for the kernels' h output stream (compute_dtype is the
    recurrent weights' dtype — models cast w_hh to the compute dtype)."""
    rd = _resolve_residual(residual_dtype)
    if (
        H_STREAM_FOLLOWS_COMPUTE
        and compute_dtype == jnp.bfloat16
        and rd == jnp.bfloat16
    ):
        return jnp.bfloat16
    return jnp.float32


def _grad_stream_dtype(residual_dtype):
    rd = _resolve_residual(residual_dtype)
    if GRAD_STREAM_FOLLOWS_RESIDUAL and rd == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def stream_dtype(compute_dtype, residual_dtype) -> Any:
    """dtype for the xp streams models feed to these kernels."""
    rd = _resolve_residual(residual_dtype)
    if (
        XP_STREAM_FOLLOWS_COMPUTE
        and compute_dtype == jnp.bfloat16
        and rd == jnp.bfloat16
    ):
        return jnp.bfloat16
    return jnp.float32


def _vmem_params(bound_bytes: float):
    """Compiler params for a kernel whose worst-case scoped-VMEM need is
    ``bound_bytes``: none while the Mosaic default stack suffices (zero
    perturbation of the surrounding program), else a tight raise with
    ~5% + 1 MiB headroom."""
    if bound_bytes <= 0.95 * _MOSAIC_DEFAULT_VMEM:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(bound_bytes * 1.05) + 1024 * 1024
    )


def _sd_vmem_bytes(b: int, h: int) -> float:
    """Worst-case scoped-VMEM bound for the single-direction kernels
    (sized for the backward, the largest: 11 [B,H]-unit blocks per grid
    step, fully double-buffered, + resident weights + carry scratch)."""
    weights = h * (4 * h) * 4
    block_set = 11 * b * h * 4
    scratch = 2 * b * h * 4
    return weights + 2.0 * block_set + scratch


def supported(batch: int, hidden: int) -> bool:
    """Can (and should) the Pallas path run for these dims on this backend?

    All hidden widths compile correctly on TPU (verified for H=1, 8, 32,
    512 against the scan path on hardware); sub-lane widths just waste
    vector lanes, which is still cheaper than scan-step overhead — the
    full train step runs ~1.6x faster with every LSTM on this path vs
    scan (10.5 ms vs 17.0 ms at the reference geometry). Batches below
    the float32 sublane tile stay on scan.
    """
    if batch < 8:
        return False
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------- forward


def _fwd_kernel(xp_ref, whh_ref, h_ref, gates_ref, c_ref, h_st, c_st):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)
        c_st[:] = jnp.zeros_like(c_st)

    gates = xp_ref[0] + jnp.dot(
        h_st[:].astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c_st[:] + i * g
    h = o * jnp.tanh(c)

    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(
        gates_ref.dtype
    )
    c_ref[0] = c.astype(c_ref.dtype)
    h_ref[0] = h.astype(h_ref.dtype)
    h_st[:] = h
    c_st[:] = c


def _infer_kernel(xp_ref, whh_ref, h_ref, h_st, c_st):
    """Lean forward: no residual outputs (inference path)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)
        c_st[:] = jnp.zeros_like(c_st)

    gates = xp_ref[0] + jnp.dot(
        h_st[:].astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c_st[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    h_ref[0] = h.astype(h_ref.dtype)
    h_st[:] = h
    c_st[:] = c


def _sd_maps(t: int, reverse: bool):
    """(processing-order index map) for the single-direction kernels:
    grid step i handles real row i (forward) or T-1-i (reverse)."""
    if reverse:
        return lambda i: (t - 1 - i, 0, 0)
    return lambda i: (i, 0, 0)


@functools.partial(jax.jit, static_argnames=("reverse", "h_dtype"))
def _infer(
    x_proj: Array, w_hh: Array, reverse: bool = False,
    h_dtype=jnp.float32,
) -> Array:
    t, b, four_h = x_proj.shape
    h_dim = four_h // 4
    seq = _sd_maps(t, reverse)
    return pl.pallas_call(
        _infer_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, b, four_h), seq, memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (h_dim, four_h), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b, h_dim), seq, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_sd_vmem_bytes(b, h_dim)),
    )(x_proj, w_hh)


@functools.partial(
    jax.jit, static_argnames=("residual_dtype", "reverse", "h_dtype")
)
def _fwd(
    x_proj: Array,
    w_hh: Array,
    residual_dtype=jnp.float32,
    reverse: bool = False,
    h_dtype=jnp.float32,
) -> Tuple[Array, Array, Array]:
    """x_proj: [T, B, 4H] (pre-projected inputs incl. biases, real time
    order), w_hh [H, 4H]. Returns (h [T,B,H], gates [T,B,4H],
    c [T,B,H]), all in real time order (reverse=True runs the
    recurrence T-1 -> 0 via the index maps)."""
    t, b, four_h = x_proj.shape
    h_dim = four_h // 4
    seq = _sd_maps(t, reverse)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (1, b, four_h), seq, memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (h_dim, four_h), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, b, h_dim), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, four_h), seq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h_dim), seq, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), residual_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_sd_vmem_bytes(b, h_dim)),
    )(x_proj, w_hh)


# -------------------------------------------------------------- backward


def _bwd_kernel(
    dh_out_ref, gates_ref, c_ref, cpe_ref, whh_ref,
    dxp_ref, dh_st, dc_st,
):
    t = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(t == 0)
    def _():
        dh_st[:] = jnp.zeros_like(dh_st)
        dc_st[:] = jnp.zeros_like(dc_st)

    i, f, g, o = jnp.split(
        gates_ref[0].astype(jnp.float32), 4, axis=-1
    )
    c = c_ref[0].astype(jnp.float32)
    tanh_c = jnp.tanh(c)
    dh = dh_out_ref[0].astype(jnp.float32) + dh_st[:]
    do = dh * tanh_c
    dc = dc_st[:] + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g
    # c_prev streams from the saved c itself through a shifted index
    # map (no materialized shift); the final grid step handles the
    # recurrence's first cell, whose c_prev is the zero initial state
    c_prev = jnp.where(t == last, 0.0, cpe_ref[0].astype(jnp.float32))
    df = dc * c_prev
    dg = dc * i
    d_pre = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    dxp_ref[0] = d_pre.astype(dxp_ref.dtype)
    # carry to the previous processing step (dW_hh is NOT accumulated
    # here: one big [H, T*B] @ [T*B, 4H] matmul outside the kernel
    # beats 192 skinny [H, B] @ [B, 4H] accumulations on the MXU)
    dh_st[:] = jax.lax.dot_general(
        d_pre.astype(whh_ref.dtype), whh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dc_st[:] = dc * f


@functools.partial(jax.jit, static_argnames=("reverse", "dx_dtype"))
def _bwd_call(dh_out, gates, c, w_hh, reverse: bool = False,
              dx_dtype=jnp.float32):
    """Grad recurrence: walks the OPPOSITE of the forward processing
    order — descending real time for a forward-direction LSTM,
    ascending for a reverse-direction one. ``dx_dtype`` sets the
    stored d(gates_pre) precision (see _grad_stream_dtype)."""
    t, b, four_h = gates.shape
    h_dim = four_h // 4
    if reverse:
        walk = lambda i: (i, 0, 0)
        edge = lambda i: (jnp.minimum(i + 1, t - 1), 0, 0)
    else:
        walk = lambda i: (t - 1 - i, 0, 0)
        edge = lambda i: (jnp.maximum(t - 2 - i, 0), 0, 0)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h_dim), walk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, four_h), walk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h_dim), walk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h_dim), edge, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (h_dim, four_h), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b, four_h), walk, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, b, four_h), dx_dtype),
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_sd_vmem_bytes(b, h_dim)),
    )(dh_out, gates, c, c, w_hh)


# ------------------------------------------------------------ public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lstm_sequence(
    x_proj: Array, w_hh: Array, residual_dtype=None,
    reverse: bool = False,
) -> Array:
    """Run an LSTM over time: x_proj [T, B, 4H], w_hh [H, 4H] -> h [T, B, H].

    Gate layout i, f, g, o (torch-compatible, matching models/layers.py).
    Zero initial state. Differentiable (custom VJP, Pallas both ways).
    ``reverse=True`` runs the recurrence T-1 -> 0 with inputs AND
    outputs in real time order (reversal happens in the kernels' block
    index maps, so no flipped copies hit HBM). Undifferentiated
    (inference) calls run a lean kernel with no residual outputs; under
    jax.grad the vjp-fwd kernel saves residuals in ``residual_dtype``
    (None -> module default RESIDUAL_DTYPE). In full-bf16 mode the h
    output itself is emitted bf16 (see _h_stream_dtype — bit-identical
    downstream, since every consumer casts to the compute dtype).
    """
    return _infer(
        x_proj, w_hh, reverse=reverse,
        h_dtype=_h_stream_dtype(w_hh.dtype, residual_dtype),
    )


def _vjp_fwd(x_proj, w_hh, residual_dtype, reverse):
    h, gates, c = _fwd(
        x_proj, w_hh,
        residual_dtype=_resolve_residual(residual_dtype),
        reverse=reverse,
        h_dtype=_h_stream_dtype(w_hh.dtype, residual_dtype),
    )
    # x_proj[:0] is a zero-byte dtype tag: the bwd rule must return the
    # xp cotangent in the PRIMAL's dtype (bf16 under stream_dtype)
    return h, (gates, c, h, w_hh, x_proj[:0])


def _dw_contract(h_slice, dx_slice, w, residual_dtype):
    """dW = h_prev^T @ d(gates_pre) over flattened (T-1, B) rows.

    Contraction inputs are cast to the resolved residual dtype: in the
    default bf16-residual mode the gates that PRODUCED dx_slice are
    already bf16-rounded, so rounding the contraction inputs adds error
    of the same order while moving the two largest backward matmuls
    from the f32 to the bf16 MXU path (profiled at ~0.55 ms/step
    combined at reference geometry, ~f32 peak). Accumulation stays f32
    (preferred_element_type). residual_dtype=float32 keeps the whole
    path bit-identical to the scan backward — the exactness escape
    hatch and the parity-test mode."""
    rd = _resolve_residual(residual_dtype)
    n = h_slice.shape[0] * h_slice.shape[1]
    return jax.lax.dot_general(
        h_slice.reshape(n, h_slice.shape[-1]).astype(rd),
        dx_slice.reshape(n, dx_slice.shape[-1]).astype(rd),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)  # cotangent dtype must match the primal


def _vjp_bwd(residual_dtype, reverse, residuals, dh_out):
    gates, c, h, w_hh, xtag = residuals
    # dh stream at the grad dtype: the convert fuses into the upstream
    # producer, so both its HBM write and the grad kernel's read halve
    dxp = _bwd_call(
        dh_out.astype(_dh_stream_dtype(w_hh.dtype, residual_dtype)),
        gates, c, w_hh, reverse=reverse,
        dx_dtype=_grad_stream_dtype(residual_dtype),
    )
    # dW_hh = sum_t h_prev[t]^T @ dxp[t] as one large contraction over
    # contiguous slices (processing predecessor: t-1 fwd / t+1 reverse)
    if reverse:
        h_sl, dx_sl = h[1:], dxp[:-1]
    else:
        h_sl, dx_sl = h[:-1], dxp[1:]
    dwhh = _dw_contract(h_sl, dx_sl, w_hh, residual_dtype)
    # cotangent dtype must match the primal's; when they differ (bf16
    # stream under an f32 primal) the convert fuses into the
    # projection-VJP consumers, so the HBM reads stay bf16
    return dxp.astype(xtag.dtype), dwhh


lstm_sequence.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- merged bidirectional
#
# A BiLSTM's two directions are independent recurrences of identical
# shape. Running them as two kernel launches serializes two full grid
# traversals; this merged kernel advances BOTH in each grid step,
# halving grid overhead and letting the second stream's VPU work
# overlap the first's MXU matmul.
#
# Layout discipline (round 3): ALL stream inputs and outputs are in
# REAL time order. The backward direction is realized inside the
# kernel — its blocks are fetched with a time-REVERSED BlockSpec index
# map and its rows processed back to front — so no jnp.flip of a
# [T, B, 4H] activation ever materializes in HBM (two flips per
# layer-direction in fwd+bwd previously; part of the 0.69 ms/step of
# staging copies in the round-2 device profile). Likewise the grad
# kernels read c_{t-1} through a row-shifted index map on the saved c
# itself plus in-block neighbors, replacing the materialized _shift
# copies, and dW contractions consume contiguous slices (h[:-1]) not
# concatenated copies.


def _cell(xp, w, h_st, c_st):
    gates = xp + jnp.dot(
        h_st.astype(w.dtype), w, preferred_element_type=jnp.float32
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c_st + i * g
    h = o * jnp.tanh(c)
    return h, c, jnp.concatenate([i, f, g, o], axis=-1)


# timesteps processed per grid step in the merged-bidirectional kernels:
# amortizes per-block DMA latency over FOLD cells (the per-step blocks
# are small, so DMA latency — not bytes — bounds the grid). Must divide
# the sequence length (192 = 4 * 48).
FOLD = 4


def _max_fold(h: int) -> int:
    """Fold ceiling by recurrence width.

    The wide decoders (H >= 128) are VMEM-bound at fold 4 and measured
    fold-insensitive beyond it (~1%). The narrow encoder bottlenecks
    (H = 1/8/32) stream KB-sized blocks whose per-grid-step DMA latency
    IS the kernel's cost (~0.08 ms each at T=192/fold=4 regardless of
    H); folding 16 timesteps per grid step cuts the grid from 48 to 12
    iterations at negligible VMEM (~1.4 MiB at B=16/H=8); deeper
    unrolling mostly grows Mosaic compile time."""
    return 4 if h >= 128 else 16


def _bd_fwd_kernel(
    xpf_ref, xpb_ref, wf_ref, wb_ref,
    hf_ref, hb_ref, gf_ref, gb_ref, cf_ref, cb_ref,
    hf_st, cf_st, hb_st, cb_st,
):
    """Both directions per grid step; everything in REAL time order.

    The forward stream's blocks arrive via the ascending index map and
    its rows are processed 0..fold-1; the backward stream's blocks
    arrive via the DESCENDING map (grid step i = real block grid-1-i)
    and its rows are processed fold-1..0 — so its recurrence runs
    T-1 -> 0 while its inputs/outputs stay un-flipped in HBM.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for st in (hf_st, cf_st, hb_st, cb_st):
            st[:] = jnp.zeros_like(st)

    fold = xpf_ref.shape[0]
    for k in range(fold):
        h, c, gates = _cell(xpf_ref[k], wf_ref[:], hf_st[:], cf_st[:])
        hf_ref[k] = h.astype(hf_ref.dtype)
        cf_ref[k] = c.astype(cf_ref.dtype)
        gf_ref[k] = gates.astype(gf_ref.dtype)
        hf_st[:], cf_st[:] = h, c

        kb = fold - 1 - k  # backward stream walks its block back->front
        h, c, gates = _cell(xpb_ref[kb], wb_ref[:], hb_st[:], cb_st[:])
        hb_ref[kb] = h.astype(hb_ref.dtype)
        cb_ref[kb] = c.astype(cb_ref.dtype)
        gb_ref[kb] = gates.astype(gb_ref.dtype)
        hb_st[:], cb_st[:] = h, c


def _bd_vmem_bytes(fold: int, b: int, h: int) -> float:
    """Worst-case scoped-VMEM bound for the merged-bidir kernels.

    Resident weights + 2x (full double-buffering) the per-grid-step
    streamed blocks + carry scratch, sized for the backward kernel (the
    larger of the pair: 22 [fold,B,H]-unit blocks per grid step vs the
    forward's 20). Mosaic's measured buffering sits between ~1.4x and
    exactly 2x depending on shape (B=24/fold=4 allocates 16.44 MiB —
    this bound to the byte; B=64/fold=2 allocates 16.5 MiB ~ 1.4x), so
    2x is the guarantee against compile-time OOM, the failure mode this
    exists to prevent.
    """
    weights = 2 * h * (4 * h) * 4
    block_set = 22 * fold * b * h * 4
    scratch = 4 * b * h * 4
    return weights + 2.0 * block_set + scratch


def merged_bidir_fits(t: int, b: int, h: int) -> bool:
    """Can the merged-bidirectional kernel pair compile for this shape?

    True for every geometry this model trains at (the fold-1 bound at
    B=128/H=512 is ~21 MiB vs the 100 MiB ceiling). When False, the
    LSTM layer runs the two directions as separate single-direction
    Pallas kernels (half the resident weights and streams per kernel) —
    still fused recurrences, just not co-scheduled.
    """
    return _bd_vmem_bytes(_fold_for(t, b, h), b, h) <= 0.9 * (
        _VMEM_CEILING
    )


def _fold_for(t: int, b: int, h: int) -> int:
    """Pick the timestep fold for the merged-bidir kernels.

    Largest fold <= FOLD that divides t and whose worst-case bound fits
    Mosaic's default 16 MiB stack (no compiler param -> zero
    perturbation of the surrounding program; fold's DMA-amortization
    win is ~1%, so it never justifies raising the limit). When even
    fold=1 exceeds the default stack (wide decoder at B >= ~96), fold=1
    with a tight vmem_limit_bytes raise is the minimal-limit choice.
    """
    for fold in range(_max_fold(h), 0, -1):
        if t % fold == 0 and _bd_vmem_bytes(
            fold, b, h
        ) <= 0.95 * _MOSAIC_DEFAULT_VMEM:
            return fold
    return 1


@functools.partial(
    jax.jit, static_argnames=("residual_dtype", "h_dtype")
)
def _bd_fwd(
    xp_f, xp_b, w_f, w_b, residual_dtype=jnp.float32,
    h_dtype=jnp.float32,
):
    t, b, four_h = xp_f.shape
    h_dim = four_h // 4
    fold = _fold_for(t, b, h_dim)
    grid = t // fold
    seq = lambda i: (i, 0, 0)
    rev = lambda i: (grid - 1 - i, 0, 0)
    full = lambda i: (0, 0)
    bxf = pl.BlockSpec((fold, b, four_h), seq, memory_space=pltpu.VMEM)
    bxb = pl.BlockSpec((fold, b, four_h), rev, memory_space=pltpu.VMEM)
    bhf = pl.BlockSpec((fold, b, h_dim), seq, memory_space=pltpu.VMEM)
    bhb = pl.BlockSpec((fold, b, h_dim), rev, memory_space=pltpu.VMEM)
    blk_w = pl.BlockSpec((h_dim, four_h), full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bd_fwd_kernel,
        grid=(grid,),
        in_specs=[bxf, bxb, blk_w, blk_w],
        out_specs=[bhf, bhb, bxf, bxb, bhf, bhb],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), residual_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), residual_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), residual_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32) for _ in range(4)
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_bd_vmem_bytes(fold, b, h_dim)),
    )(xp_f, xp_b, w_f, w_b)


def _bd_infer_kernel(
    xpf_ref, xpb_ref, wf_ref, wb_ref, hf_ref, hb_ref,
    hf_st, cf_st, hb_st, cb_st,
):
    """Lean merged-bidirectional forward (inference path)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for st in (hf_st, cf_st, hb_st, cb_st):
            st[:] = jnp.zeros_like(st)

    fold = xpf_ref.shape[0]
    for k in range(fold):
        h, c, _ = _cell(xpf_ref[k], wf_ref[:], hf_st[:], cf_st[:])
        hf_ref[k] = h.astype(hf_ref.dtype)
        hf_st[:], cf_st[:] = h, c
        kb = fold - 1 - k
        h, c, _ = _cell(xpb_ref[kb], wb_ref[:], hb_st[:], cb_st[:])
        hb_ref[kb] = h.astype(hb_ref.dtype)
        hb_st[:], cb_st[:] = h, c


@functools.partial(jax.jit, static_argnames=("h_dtype",))
def _bd_infer(xp_f, xp_b, w_f, w_b, h_dtype=jnp.float32):
    t, b, four_h = xp_f.shape
    h_dim = four_h // 4
    fold = _fold_for(t, b, h_dim)
    grid = t // fold
    seq = lambda i: (i, 0, 0)
    rev = lambda i: (grid - 1 - i, 0, 0)
    full = lambda i: (0, 0)
    bxf = pl.BlockSpec((fold, b, four_h), seq, memory_space=pltpu.VMEM)
    bxb = pl.BlockSpec((fold, b, four_h), rev, memory_space=pltpu.VMEM)
    bhf = pl.BlockSpec((fold, b, h_dim), seq, memory_space=pltpu.VMEM)
    bhb = pl.BlockSpec((fold, b, h_dim), rev, memory_space=pltpu.VMEM)
    blk_w = pl.BlockSpec((h_dim, four_h), full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bd_infer_kernel,
        grid=(grid,),
        in_specs=[bxf, bxb, blk_w, blk_w],
        out_specs=[bhf, bhb],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32) for _ in range(4)
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_bd_vmem_bytes(fold, b, h_dim)),
    )(xp_f, xp_b, w_f, w_b)


def _cell_bwd(dh_out, g_all, c, c_prev, w, dh_st, dc_st):
    i, f, g, o = jnp.split(g_all.astype(jnp.float32), 4, axis=-1)
    c = c.astype(jnp.float32)
    c_prev = c_prev.astype(jnp.float32)
    tanh_c = jnp.tanh(c)
    dh = dh_out.astype(jnp.float32) + dh_st
    do = dh * tanh_c
    dc = dc_st + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    d_pre = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    new_dh = jax.lax.dot_general(
        d_pre.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d_pre, new_dh, dc * f


def _bd_bwd_kernel(
    dhf_ref, dhb_ref, gf_ref, gb_ref, cf_ref, cb_ref,
    cpf_edge, cpb_edge, wf_ref, wb_ref,
    dxf_ref, dxb_ref,
    dhf_st, dcf_st, dhb_st, dcb_st,
):
    """Grad recurrences, everything in REAL time order.

    The forward stream's grad walks T-1 -> 0 (descending block map,
    rows back to front); the backward stream's grad walks 0 -> T-1
    (ascending map). Each cell's c_prev comes from its neighbor row of
    the streamed c block; the one row per block that crosses the block
    boundary is streamed separately as a [1, B, H] edge block sliced
    from the SAME saved-c array by a shifted index map — no
    materialized shift copy (round-2 profile: those copies were part of
    the 0.69 ms staging cost).
    """
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _():
        for st in (dhf_st, dcf_st, dhb_st, dcb_st):
            st[:] = jnp.zeros_like(st)

    fold = gf_ref.shape[0]
    for k in reversed(range(fold)):
        # forward stream, rows back to front (real t descending)
        if k > 0:
            cpf = cf_ref[k - 1].astype(jnp.float32)
        else:  # row below the block boundary; zero at real t == 0
            cpf = jnp.where(
                i == last, 0.0, cpf_edge[0].astype(jnp.float32)
            )
        d_pre, dh, dc = _cell_bwd(
            dhf_ref[k], gf_ref[k], cf_ref[k], cpf, wf_ref[:],
            dhf_st[:], dcf_st[:],
        )
        dxf_ref[k] = d_pre.astype(dxf_ref.dtype)
        dhf_st[:], dcf_st[:] = dh, dc

        # backward stream, rows front to back (real t ascending); its
        # recurrence predecessor at real time t is t+1
        kb = fold - 1 - k
        if kb < fold - 1:
            cpb = cb_ref[kb + 1].astype(jnp.float32)
        else:  # row above the boundary; zero at real t == T-1
            cpb = jnp.where(
                i == last, 0.0, cpb_edge[0].astype(jnp.float32)
            )
        d_pre, dh, dc = _cell_bwd(
            dhb_ref[kb], gb_ref[kb], cb_ref[kb], cpb, wb_ref[:],
            dhb_st[:], dcb_st[:],
        )
        dxb_ref[kb] = d_pre.astype(dxb_ref.dtype)
        dhb_st[:], dcb_st[:] = dh, dc


@functools.partial(jax.jit, static_argnames=("dx_dtype",))
def _bd_bwd_call(dh_f, dh_b, g_f, g_b, c_f, c_b, w_f, w_b,
                 dx_dtype=jnp.float32):
    t, b, four_h = g_f.shape
    h_dim = four_h // 4
    fold = _fold_for(t, b, h_dim)
    grid = t // fold
    seq = lambda i: (i, 0, 0)
    rev = lambda i: (grid - 1 - i, 0, 0)
    full = lambda i: (0, 0)
    # edge rows, sliced from the saved c arrays themselves: for the
    # forward stream's block j = grid-1-i the row just before it
    # (j*fold - 1, clamped; kernel zeroes it at t==0), for the backward
    # stream's block i the row just after it ((i+1)*fold, clamped)
    edge_f = lambda i: (jnp.maximum((grid - 1 - i) * fold - 1, 0), 0, 0)
    edge_b = lambda i: (jnp.minimum((i + 1) * fold, t - 1), 0, 0)
    bxf = pl.BlockSpec((fold, b, four_h), rev, memory_space=pltpu.VMEM)
    bxb = pl.BlockSpec((fold, b, four_h), seq, memory_space=pltpu.VMEM)
    bhf = pl.BlockSpec((fold, b, h_dim), rev, memory_space=pltpu.VMEM)
    bhb = pl.BlockSpec((fold, b, h_dim), seq, memory_space=pltpu.VMEM)
    bef = pl.BlockSpec((1, b, h_dim), edge_f, memory_space=pltpu.VMEM)
    beb = pl.BlockSpec((1, b, h_dim), edge_b, memory_space=pltpu.VMEM)
    blk_w = pl.BlockSpec((h_dim, four_h), full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bd_bwd_kernel,
        grid=(grid,),
        in_specs=[
            bhf, bhb, bxf, bxb, bhf, bhb, bef, beb,
            blk_w, blk_w,
        ],
        out_specs=[bxf, bxb],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, four_h), dx_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), dx_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32) for _ in range(4)
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(_bd_vmem_bytes(fold, b, h_dim)),
    )(dh_f, dh_b, g_f, g_b, c_f, c_b, c_f, c_b, w_f, w_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilstm_sequence(
    xp_f: Array, xp_b: Array, w_f: Array, w_b: Array, residual_dtype=None
):
    """Both BiLSTM directions in one grid, REAL time order throughout.

    xp_f, xp_b: [T, B, 4H] projected inputs for the forward / backward
    direction, both in real time order (the kernel realizes the
    backward direction through reversed block index maps — no flipped
    copies in HBM). Returns (h_f [T,B,H], h_b [T,B,H]), both in real
    time order, ready to concatenate. Undifferentiated calls run a lean
    kernel without residual outputs; under jax.grad residuals are saved
    in ``residual_dtype`` (None -> module default RESIDUAL_DTYPE). In
    full-bf16 mode the h outputs are emitted bf16 (_h_stream_dtype).
    """
    return _bd_infer(
        xp_f, xp_b, w_f, w_b,
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )


def _bd_vjp_fwd(xp_f, xp_b, w_f, w_b, residual_dtype):
    h_f, h_b, g_f, g_b, c_f, c_b = _bd_fwd(
        xp_f, xp_b, w_f, w_b,
        residual_dtype=_resolve_residual(residual_dtype),
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )
    # xp_f[:0]: zero-byte dtype tag for the cotangent (see _vjp_fwd)
    return (h_f, h_b), (
        g_f, g_b, c_f, c_b, h_f, h_b, w_f, w_b, xp_f[:0]
    )


def _bd_vjp_bwd(residual_dtype, residuals, grads):
    g_f, g_b, c_f, c_b, h_f, h_b, w_f, w_b, xtag = residuals
    dh_f, dh_b = grads
    # dh streams at the grad dtype (see _dh_stream_dtype)
    dd = _dh_stream_dtype(w_f.dtype, residual_dtype)
    dx_f, dx_b = _bd_bwd_call(
        dh_f.astype(dd), dh_b.astype(dd), g_f, g_b, c_f, c_b, w_f, w_b,
        dx_dtype=_grad_stream_dtype(residual_dtype),
    )
    # dW_hh = sum_t h_prev[t]^T dxp[t]; with everything in real time
    # order the predecessor is h[t-1] for the forward direction and
    # h[t+1] for the backward one, so both contractions consume
    # CONTIGUOUS slices (the old concat-a-zero-row _shift materialized
    # a full [T, B, H] copy per direction per layer); inputs cast to
    # the residual dtype (see _dw_contract)
    dw_f = _dw_contract(h_f[:-1], dx_f[1:], w_f, residual_dtype)
    dw_b = _dw_contract(h_b[1:], dx_b[:-1], w_b, residual_dtype)
    # cotangent dtype must match the primals'; when they differ (bf16
    # stream under f32 primals) the converts fuse into the
    # projection-VJP consumers, so the HBM reads stay bf16
    return (
        dx_f.astype(xtag.dtype), dx_b.astype(xtag.dtype), dw_f, dw_b
    )


bilstm_sequence.defvjp(_bd_vjp_fwd, _bd_vjp_bwd)


# --------------------------- layer-level op: projection + merged bidir
#
# AD of the project-then-``bilstm_sequence`` composition has two costs
# the op below removes without touching forward numerics:
#   1. the xp cotangent crosses the custom-vjp dtype boundary (it must
#      match the f32 primal), so the bf16 dxp stream is converted back
#      to f32 between the grad kernel and the projection VJP;
#   2. the projection VJP matmuls (dW_ih = x^T dxp, dx = dxp W_ih^T,
#      six of each per mel-decoder step) run at the COMPUTE dtype — at
#      f32 compute they sit on the f32 MXU path even though the
#      residual policy already rounds their dxp operand to bf16 (the
#      same asymmetry _dw_contract fixed for dW_hh in round 2).
# ``bilstm_layer`` spans projection + recurrence in ONE custom_vjp:
# the forward is IDENTICAL XLA (projection matmul in the compute
# dtype, f32 accumulation, then the merged-bidir kernel); the backward
# consumes the kernel's dxp stream directly at the grad-stream dtype
# and runs dW_ih/dx at the residual dtype. residual_dtype=float32
# keeps every contraction f32 — the exactness mode.

# A/B pin: "on" routes LSTM's merged path through bilstm_layer;
# "off" keeps the round-3 project-then-bilstm_sequence composition.
# Default OFF until the hardware A/B lands (PROJ_FUSION discipline);
# interpret-mode parity is already pinned either way
# (tests/test_pallas_bilstm.py::test_layer_vjp_matches_composed_path).
LAYER_VJP = "off"


def _project_xla(x, wi, b):
    """x [T,B,I] @ wi [I,4H] + b, f32 accumulation — identical math to
    models/layers.py ``project`` (caller pre-casts x/wi to the compute
    dtype)."""
    return jnp.dot(x, wi, preferred_element_type=jnp.float32) + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def bilstm_layer(
    x: Array,
    wi_f: Array, wi_b: Array,
    b_f: Array, b_b: Array,
    w_f: Array, w_b: Array,
    residual_dtype=None,
):
    """One BiLSTM layer: input projection (XLA) + merged-bidir kernel.

    x: [T, B, I] layer input in the compute dtype; wi_f/wi_b [I, 4H]
    input projections (compute dtype); b_f/b_b [4H] f32 summed biases
    (b_ih + b_hh); w_f/w_b [H, 4H] recurrent weights. Returns
    (h_f [T,B,H], h_b [T,B,H]) in real time order. Forward numerics
    are identical to project-then-``bilstm_sequence`` (same GEMMs,
    same kernels, same stream dtypes); only the backward's dtype
    boundaries differ (see the section comment above).
    """
    sd = stream_dtype(wi_f.dtype, residual_dtype)
    xp_f = _project_xla(x, wi_f, b_f).astype(sd)
    xp_b = _project_xla(x, wi_b, b_b).astype(sd)
    return _bd_infer(
        xp_f, xp_b, w_f, w_b,
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )


def _layer_vjp_fwd(x, wi_f, wi_b, b_f, b_b, w_f, w_b, residual_dtype):
    sd = stream_dtype(wi_f.dtype, residual_dtype)
    xp_f = _project_xla(x, wi_f, b_f).astype(sd)
    xp_b = _project_xla(x, wi_b, b_b).astype(sd)
    h_f, h_b, g_f, g_b, c_f, c_b = _bd_fwd(
        xp_f, xp_b, w_f, w_b,
        residual_dtype=_resolve_residual(residual_dtype),
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )
    # x is saved exactly as plain AD would save it for the projection
    # VJP — no extra residual traffic vs the unfused composition
    return (h_f, h_b), (
        g_f, g_b, c_f, c_b, h_f, h_b, x, wi_f, wi_b, w_f, w_b
    )


def _layer_vjp_bwd(residual_dtype, residuals, grads):
    g_f, g_b, c_f, c_b, h_f, h_b, x, wi_f, wi_b, w_f, w_b = residuals
    dh_f, dh_b = grads
    dd = _dh_stream_dtype(w_f.dtype, residual_dtype)
    dx_f, dx_b = _bd_bwd_call(
        dh_f.astype(dd), dh_b.astype(dd), g_f, g_b, c_f, c_b, w_f, w_b,
        dx_dtype=_grad_stream_dtype(residual_dtype),
    )
    t, b, four_h = g_f.shape
    i_dim = x.shape[-1]
    rd = _resolve_residual(residual_dtype)

    dw_f = _dw_contract(h_f[:-1], dx_f[1:], w_f, residual_dtype)
    dw_b = _dw_contract(h_b[1:], dx_b[:-1], w_b, residual_dtype)
    # projection grads at the residual dtype (same policy as dW_hh):
    # with bf16 residuals these are bf16-MXU matmuls over the bf16 dxp
    # stream as stored — no convert in between
    dwi_f = _dw_contract(x, dx_f, wi_f, residual_dtype)
    dwi_b = _dw_contract(x, dx_b, wi_b, residual_dtype)
    db_f = dx_f.astype(jnp.float32).sum(axis=(0, 1))
    db_b = dx_b.astype(jnp.float32).sum(axis=(0, 1))

    def dxin(dxp, wi):
        return jax.lax.dot_general(
            dxp.reshape(t * b, four_h).astype(rd), wi.astype(rd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(t, b, i_dim)

    dx = (dxin(dx_f, wi_f) + dxin(dx_b, wi_b)).astype(x.dtype)
    return dx, dwi_f, dwi_b, db_f, db_b, dw_f, dw_b


bilstm_layer.defvjp(_layer_vjp_fwd, _layer_vjp_bwd)


# ------------------------------------- merged bidir, fused input projection
#
# The merged-bidir kernels above consume PRE-projected gate inputs
# ([T, B, 4H] per direction), so every layer-direction pays a full HBM
# round trip for that tensor: XLA writes x @ W_ih + b, the kernel
# streams it back in. At the reference decoder geometry that is a
# [192, 16, 2048] f32 array (25 MB) written + read per direction per
# layer, while the layer *input* x is only [192, 16, 1024] — the
# projection's HBM cost exceeds its MXU cost. These variants move the
# input projection INSIDE the grid: W_ih joins W_hh resident in VMEM,
# each grid step projects its whole fold-block as ONE
# [fold*B, I] @ [I, 4H] MXU matmul (fold is chosen so fold*B fills the
# 128-row MXU tile), and the x block streams at I lanes instead of 4H.
# The gradient path is unchanged: the same _bd_bwd_call grad kernel
# produces d(gates_pre), and dx / dW_ih / db remain one large XLA
# contraction each — exactly the matmuls the unfused path's projection
# VJP already performs, so the backward cost is identical and only the
# forward xp round trips disappear.
#
# VMEM: W_ih ([I, 4H]) is the price — e.g. 8 MiB per direction for the
# mel decoder's upper layers (I=1024, f32), pushing the kernel past
# Mosaic's 16 MiB default stack into a tight vmem_limit raise (~30
# MiB; measured <= 24 MiB raises are noise, a blanket 100 MiB costs
# ~5% on surrounding ops — see the VMEM planning notes at the top).
# ``fused_proj_plan`` makes the call per shape; PROJ_FUSION pins it
# for tests and A/B measurement.


# "auto": fuse when fused_proj_plan approves; "off": never (also the
# pin for tests and A/B benchmarks). Default OFF until the fused
# kernels are validated + measured on hardware (they are currently
# interpret-mode-verified only; flipping this is the one-line enable).
PROJ_FUSION = "off"

# Fused-projection VMEM raise ceiling: fusing a layer whose weights push
# the tight raise beyond this is assumed to cost more in surrounding-op
# perturbation than the saved xp round trips are worth. Measured on
# hardware (see BENCHMARKS.md round-3 fused-projection table).
_FUSED_RAISE_CEILING = 40 * 1024 * 1024


def _bdp_vmem_bytes(
    fold: int, b: int, h: int, i: int, w_bytes: int, x_bytes: int
) -> float:
    """Worst-case scoped-VMEM bound for the fused-projection forward
    kernel: resident weights (W_ih + W_hh, both directions) + 2x the
    per-grid-step streamed blocks (2 x-blocks at I lanes, h/gates/c
    outputs as in _bd_vmem_bytes) + the in-kernel projected gate
    temporaries (xpf/xpb, [fold*B, 4H] f32 values the kernel
    materializes before the cell loop — NOT streamed, so single-
    buffered) + carry scratch. The grad kernel has no W_ih and keeps
    its own (_bd_vmem_bytes) bound."""
    weights = 2 * (i + h) * (4 * h) * w_bytes
    # streamed per fold unit: 2 x-blocks (x_bytes wide) in; out: 2 h
    # (f32), 2 gates (residual, worst-case f32), 2 c (residual)
    blocks = fold * b * (
        2 * i * x_bytes + 2 * h * 4 + 2 * (4 * h) * 4 + 2 * h * 4
    )
    proj_tmp = 2 * fold * b * (4 * h) * 4
    scratch = 4 * b * h * 4
    return weights + 2.0 * blocks + proj_tmp + scratch


def _fold_for_fused(t: int, b: int, h: int, i: int, w_bytes, x_bytes):
    """Fold for the fused-projection kernels: smallest fold with
    fold*b >= 128 (a full MXU M-tile for the in-block projection;
    skinnier folds waste MXU passes), preferring one that divides t and
    fits the VMEM plan. Returns (fold, bound) or None if nothing fits
    under the fused raise ceiling."""
    want = max(1, -(-128 // b))
    for fold in range(want, 2 * want + 1):
        if t % fold:
            continue
        bound = _bdp_vmem_bytes(fold, b, h, i, w_bytes, x_bytes)
        if bound <= _FUSED_RAISE_CEILING:
            return fold, bound
    # fall back to any dividing fold (large batches: fold 1)
    for fold in range(want, 0, -1):
        if t % fold == 0:
            bound = _bdp_vmem_bytes(fold, b, h, i, w_bytes, x_bytes)
            if bound <= _FUSED_RAISE_CEILING:
                return fold, bound
    return None


def fused_proj_plan(t: int, b: int, h: int, i: int, w_dtype) -> bool:
    """Should the merged-bidir path fuse the input projection for this
    layer shape? PROJ_FUSION="off" pins it off (tests, A/B); otherwise
    fuse whenever a full-M-tile fold fits under the raise ceiling. The
    in-kernel block projection reshapes (fold, B, I) -> (fold*B, I),
    which needs whole sublane tiles in the x block's dtype: B must be
    a MULTIPLE of the tile's sublane count — 8 for 4-byte elements,
    16 for 2-byte (bf16 tiles are (16, 128))."""
    w_bytes = 2 if w_dtype == jnp.bfloat16 else 4
    sublanes = 16 if w_bytes == 2 else 8
    if PROJ_FUSION == "off" or b % sublanes:
        return False
    return _fold_for_fused(t, b, h, i, w_bytes, w_bytes) is not None


def _proj(x_ref, wi_ref, b_ref):
    """In-grid input projection: the whole fold-block as ONE
    [fold*B, I] @ [I, 4H] matmul (x cast to W_ih's dtype, f32
    accumulate + f32 bias add — exactly the unfused ``project``).
    Shared by the fused fwd and infer kernels so train/inference
    numerics cannot desynchronize."""
    fold, b, i_dim = x_ref.shape
    xp = jnp.dot(
        x_ref[:].reshape(fold * b, i_dim).astype(wi_ref.dtype),
        wi_ref[:],
        preferred_element_type=jnp.float32,
    ) + b_ref[0]
    return xp.reshape(fold, b, wi_ref.shape[1])


def _bdp_fwd_kernel(
    xf_ref, xb_ref, wif_ref, wib_ref, bf_ref, bb_ref, wf_ref, wb_ref,
    hf_ref, hb_ref, gf_ref, gb_ref, cf_ref, cb_ref,
    hf_st, cf_st, hb_st, cb_st,
):
    """Merged-bidir forward with the input projection in-grid.

    Per grid step: project the whole fold-block of each direction as one
    [fold*B, I] @ [I, 4H] matmul (W_ih resident), then run the fold's
    cells exactly as _bd_fwd_kernel (forward rows 0..fold-1, backward
    rows fold-1..0 on a descending block map)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for st in (hf_st, cf_st, hb_st, cb_st):
            st[:] = jnp.zeros_like(st)

    fold = xf_ref.shape[0]
    xpf = _proj(xf_ref, wif_ref, bf_ref)
    xpb = _proj(xb_ref, wib_ref, bb_ref)
    for k in range(fold):
        h, c, gates = _cell(xpf[k], wf_ref[:], hf_st[:], cf_st[:])
        hf_ref[k] = h.astype(hf_ref.dtype)
        cf_ref[k] = c.astype(cf_ref.dtype)
        gf_ref[k] = gates.astype(gf_ref.dtype)
        hf_st[:], cf_st[:] = h, c

        kb = fold - 1 - k
        h, c, gates = _cell(xpb[kb], wb_ref[:], hb_st[:], cb_st[:])
        hb_ref[kb] = h.astype(hb_ref.dtype)
        cb_ref[kb] = c.astype(cb_ref.dtype)
        gb_ref[kb] = gates.astype(gb_ref.dtype)
        hb_st[:], cb_st[:] = h, c


def _bdp_infer_kernel(
    xf_ref, xb_ref, wif_ref, wib_ref, bf_ref, bb_ref, wf_ref, wb_ref,
    hf_ref, hb_ref, hf_st, cf_st, hb_st, cb_st,
):
    """Lean fused-projection forward (inference path)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for st in (hf_st, cf_st, hb_st, cb_st):
            st[:] = jnp.zeros_like(st)

    fold = xf_ref.shape[0]
    xpf = _proj(xf_ref, wif_ref, bf_ref)
    xpb = _proj(xb_ref, wib_ref, bb_ref)
    for k in range(fold):
        h, c, _ = _cell(xpf[k], wf_ref[:], hf_st[:], cf_st[:])
        hf_ref[k] = h.astype(hf_ref.dtype)
        hf_st[:], cf_st[:] = h, c
        kb = fold - 1 - k
        h, c, _ = _cell(xpb[kb], wb_ref[:], hb_st[:], cb_st[:])
        hb_ref[kb] = h.astype(hb_ref.dtype)
        hb_st[:], cb_st[:] = h, c


def _bdp_specs(t, b, i_dim, h_dim, w_i_dtype_bytes, x_bytes):
    four_h = 4 * h_dim
    plan = _fold_for_fused(t, b, h_dim, i_dim, w_i_dtype_bytes, x_bytes)
    assert plan is not None, "caller must check fused_proj_plan first"
    fold, bound = plan
    grid = t // fold
    seq = lambda j: (j, 0, 0)
    rev = lambda j: (grid - 1 - j, 0, 0)
    full2 = lambda j: (0, 0)
    return dict(
        fold=fold,
        grid=grid,
        bound=bound,
        bxf=pl.BlockSpec((fold, b, i_dim), seq, memory_space=pltpu.VMEM),
        bxb=pl.BlockSpec((fold, b, i_dim), rev, memory_space=pltpu.VMEM),
        bhf=pl.BlockSpec((fold, b, h_dim), seq, memory_space=pltpu.VMEM),
        bhb=pl.BlockSpec((fold, b, h_dim), rev, memory_space=pltpu.VMEM),
        bgf=pl.BlockSpec((fold, b, four_h), seq, memory_space=pltpu.VMEM),
        bgb=pl.BlockSpec((fold, b, four_h), rev, memory_space=pltpu.VMEM),
        blk_wi=pl.BlockSpec(
            (i_dim, four_h), full2, memory_space=pltpu.VMEM
        ),
        blk_b=pl.BlockSpec((1, four_h), full2, memory_space=pltpu.VMEM),
        blk_w=pl.BlockSpec(
            (h_dim, four_h), full2, memory_space=pltpu.VMEM
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("residual_dtype", "h_dtype")
)
def _bdp_fwd(
    x, wi_f, wi_b, b_f, b_b, w_f, w_b, residual_dtype,
    h_dtype=jnp.float32,
):
    t, b, i_dim = x.shape
    h_dim = w_f.shape[0]
    four_h = 4 * h_dim
    s = _bdp_specs(
        t, b, i_dim, h_dim, wi_f.dtype.itemsize, x.dtype.itemsize
    )
    return pl.pallas_call(
        _bdp_fwd_kernel,
        grid=(s["grid"],),
        in_specs=[
            s["bxf"], s["bxb"], s["blk_wi"], s["blk_wi"],
            s["blk_b"], s["blk_b"], s["blk_w"], s["blk_w"],
        ],
        out_specs=[
            s["bhf"], s["bhb"], s["bgf"], s["bgb"], s["bhf"], s["bhb"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), residual_dtype),
            jax.ShapeDtypeStruct((t, b, four_h), residual_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), residual_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), residual_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32) for _ in range(4)
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(s["bound"]),
    )(x, x, wi_f, wi_b, b_f[None, :], b_b[None, :], w_f, w_b)


@functools.partial(jax.jit, static_argnames=("h_dtype",))
def _bdp_infer(x, wi_f, wi_b, b_f, b_b, w_f, w_b, h_dtype=jnp.float32):
    t, b, i_dim = x.shape
    h_dim = w_f.shape[0]
    s = _bdp_specs(
        t, b, i_dim, h_dim, wi_f.dtype.itemsize, x.dtype.itemsize
    )
    return pl.pallas_call(
        _bdp_infer_kernel,
        grid=(s["grid"],),
        in_specs=[
            s["bxf"], s["bxb"], s["blk_wi"], s["blk_wi"],
            s["blk_b"], s["blk_b"], s["blk_w"], s["blk_w"],
        ],
        out_specs=[s["bhf"], s["bhb"]],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
            jax.ShapeDtypeStruct((t, b, h_dim), h_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32) for _ in range(4)
        ],
        interpret=FORCE_INTERPRET,
        compiler_params=_vmem_params(s["bound"]),
    )(x, x, wi_f, wi_b, b_f[None, :], b_b[None, :], w_f, w_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def bilstm_sequence_fused(
    x: Array,
    wi_f: Array, wi_b: Array,
    b_f: Array, b_b: Array,
    w_f: Array, w_b: Array,
    residual_dtype=None,
):
    """Merged-bidir BiLSTM layer with the input projection fused in-grid.

    x: [T, B, I] layer input in real time order (cast to the compute
    dtype by the caller — the kernel streams it as-is and casts to
    W_ih's dtype at the matmul, matching the unfused ``project``).
    wi_f/wi_b: [I, 4H] input projections; b_f/b_b: [4H] summed biases
    (b_ih + b_hh); w_f/w_b: [H, 4H] recurrent weights. Returns
    (h_f [T,B,H], h_b [T,B,H]) in real time order. Numerics match
    project-then-``bilstm_sequence`` exactly in f32 (same contractions,
    same cells); callers gate via ``fused_proj_plan``.
    """
    return _bdp_infer(
        x, wi_f, wi_b, b_f, b_b, w_f, w_b,
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )


def _bdp_vjp_fwd(x, wi_f, wi_b, b_f, b_b, w_f, w_b, residual_dtype):
    h_f, h_b, g_f, g_b, c_f, c_b = _bdp_fwd(
        x, wi_f, wi_b, b_f, b_b, w_f, w_b,
        residual_dtype=_resolve_residual(residual_dtype),
        h_dtype=_h_stream_dtype(w_f.dtype, residual_dtype),
    )
    return (h_f, h_b), (
        g_f, g_b, c_f, c_b, h_f, h_b, x, wi_f, wi_b, w_f, w_b
    )


def _bdp_vjp_bwd(residual_dtype, residuals, grads):
    g_f, g_b, c_f, c_b, h_f, h_b, x, wi_f, wi_b, w_f, w_b = residuals
    dh_f, dh_b = grads
    # same grad kernel as the unfused path — it consumes gate/c
    # residuals and produces d(gates_pre) per direction
    dd = _dh_stream_dtype(w_f.dtype, residual_dtype)
    dx_f, dx_b = _bd_bwd_call(
        dh_f.astype(dd), dh_b.astype(dd), g_f, g_b, c_f, c_b, w_f, w_b,
        dx_dtype=_grad_stream_dtype(residual_dtype),
    )
    t, b, four_h = g_f.shape
    i_dim = x.shape[-1]

    dw_f = _dw_contract(h_f[:-1], dx_f[1:], w_f, residual_dtype)
    dw_b = _dw_contract(h_b[1:], dx_b[:-1], w_b, residual_dtype)

    # projection grads — the same contractions the unfused path's
    # projection VJP performs outside the kernel, with dW_ih inputs at
    # the residual dtype like dW_hh (see _dw_contract)
    def dwi(dxp, wi):
        return _dw_contract(x, dxp, wi, residual_dtype)

    def dxin(dxp, wi):
        return jax.lax.dot_general(
            dxp.reshape(t * b, four_h).astype(wi.dtype), wi,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(t, b, i_dim)

    dwi_f, dwi_b = dwi(dx_f, wi_f), dwi(dx_b, wi_b)
    # f32 accumulation for the bias reduction regardless of dxp dtype
    db_f = dx_f.astype(jnp.float32).sum(axis=(0, 1))
    db_b = dx_b.astype(jnp.float32).sum(axis=(0, 1))
    dx = (dxin(dx_f, wi_f) + dxin(dx_b, wi_b)).astype(x.dtype)
    return dx, dwi_f, dwi_b, db_f, db_b, dw_f, dw_b


bilstm_sequence_fused.defvjp(_bdp_vjp_fwd, _bdp_vjp_bwd)

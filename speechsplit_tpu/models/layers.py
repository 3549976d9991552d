"""Core neural layers, designed TPU-first.

Design notes
------------
- Everything operates on ``[B, T, C]`` tensors (NWC). Convolutions use
  ``lax.conv_general_dilated`` with NWC/WIO dimension numbers so XLA maps
  them straight onto the MXU without layout churn.
- The LSTM hoists the input projection out of the recurrence: one large
  ``[B*T, I] @ [I, 4H]`` matmul feeds the scan, and the per-step work is a
  single ``[B, H] @ [H, 4H]`` matmul plus VPU element-wise gates. On TPU
  the recurrences run as fused Pallas sequence kernels instead
  (ops/pallas_lstm.py: merged bidirectional grids, optionally with the
  input projection fused in-grid — ``fused_proj_plan`` decides); the
  scan path remains the CPU/parity reference.
- Gate layout and parameter semantics deliberately mirror torch's LSTM
  (gates ordered i, f, g, o; two bias vectors summed at apply time) so that
  reference checkpoints (e.g. 660000-G.ckpt) can be imported losslessly for
  parity testing. Reference layers surveyed: LinearNorm model.py:10-20,
  ConvNorm model.py:24-42, the five nn.LSTM stacks model.py:71,119,174,189,
  244,268, GroupNorm usage model.py:67,115,170,185.
- ``param_dtype`` is float32 always; ``dtype`` controls matmul input
  precision (bfloat16 on TPU keeps the MXU in its fast path while the
  carried state and accumulations stay float32).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any

GAIN = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0}


def xavier_uniform_gain(gain: float, fan_in_axes: Sequence[int],
                        fan_out_axes: Sequence[int]):
    """Xavier-uniform init with an explicit gain (torch semantics)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = math.prod(shape[a] for a in fan_in_axes)
        fan_out = math.prod(shape[a] for a in fan_out_axes)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_fan(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """Dense layer with gain-scaled Xavier init (ref: model.py:10-20)."""

    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        # stored [in, out]; torch stores [out, in] — transposed on import
        kernel = self.param(
            "kernel",
            xavier_uniform_gain(GAIN[self.w_init_gain], (0,), (1,)),
            (in_features, self.features),
        )
        y = jnp.dot(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias", uniform_fan(1.0 / math.sqrt(in_features)),
                (self.features,),
            )
            y = y + bias
        return y


class Conv1d(nn.Module):
    """'Same'-padded 1-D convolution over [B, T, C] (ref: model.py:24-42).

    Padding is derived from kernel/dilation exactly as the reference's
    ConvNorm does (model.py:28-30).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.kernel_size % 2 == 1, "even kernels need explicit pad"
        in_ch = x.shape[-1]
        # stored [K, Cin, Cout]; torch stores [Cout, Cin, K]
        kernel = self.param(
            "kernel",
            xavier_uniform_gain(GAIN[self.w_init_gain], (0, 1), (0, 2)),
            (self.kernel_size, in_ch, self.features),
        )
        pad = self.dilation * (self.kernel_size - 1) // 2
        # bf16 convs emit bf16 (the MXU still accumulates f32 internally)
        # and are upcast after: a mixed bf16-in/f32-out conv has no
        # transpose rule, so preferred_element_type=f32 would break grads.
        pet = jnp.float32 if self.dtype == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=pet,
        ).astype(jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                uniform_fan(1.0 / math.sqrt(in_ch * self.kernel_size)),
                (self.features,),
            )
            y = y + bias
        return y


class GroupNorm(nn.Module):
    """Group normalization over the channel axis of [B, T, C].

    Statistics are computed per (batch, group) across time and the group's
    channels — torch nn.GroupNorm semantics (ref usage: model.py:67,115,
    170,185). Always computed in float32.
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, c = x.shape
        assert c % self.num_groups == 0
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.astype(jnp.float32).reshape(b, t, self.num_groups, -1)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xg.reshape(b, t, c) * scale + bias


def _recurrent_dtype(dtype: Dtype, hidden: int) -> Dtype:
    """Effective dtype for the recurrent weights of an H-wide LSTM.

    Mosaic cannot lower a bf16 H=1 recurrence (a `vector.broadcast`
    verification failure on the [B, 4] gate vector, observed on v5e);
    the sub-lane bottleneck LSTMs are negligible FLOPs anyway, so bf16
    applies only from H >= 2. Applied identically on the Pallas and scan
    paths so their numerics stay interchangeable.
    """
    if dtype == jnp.bfloat16 and hidden < 2:
        return jnp.float32
    return dtype


def _lstm_direction(
    x_proj: Array,
    w_hh: Array,
    reverse: bool,
    dtype: Dtype,
    residual_dtype: Optional[Dtype] = None,
) -> Array:
    """Run one LSTM direction over pre-projected inputs.

    x_proj: [B, T, 4H] = x @ W_ih^T + (b_ih + b_hh), gates ordered i,f,g,o,
    in real time order regardless of direction.
    w_hh:   [H, 4H].
    Returns hidden states [B, T, H] in real time order.

    Dispatch: wide, lane-aligned recurrences (the decoders) run the fused
    Pallas sequence kernel (ops/pallas_lstm.py — W_hh pinned in VMEM,
    state never leaves chip; reverse direction realized by the kernel's
    index maps, no flipped copies); narrow bottleneck LSTMs and CPU runs
    take the lax.scan path. Both produce identical numerics.
    """
    from speechsplit_tpu.ops import pallas_lstm

    batch, _, four_h = x_proj.shape
    hidden = four_h // 4
    dtype = _recurrent_dtype(dtype, hidden)

    if dtype in (jnp.float32, jnp.bfloat16) and pallas_lstm.supported(
        batch, hidden
    ):
        xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H] time-major
        # x_proj accumulates in f32; the stream dtype rounds it to bf16
        # only when compute AND residuals are both bf16 (the cast fuses
        # into the projection epilogue, halving the kernel's dominant
        # input stream — see pallas_lstm.stream_dtype). The recurrent
        # weight is carried at compute precision; the kernel casts h to
        # w_hh's dtype per step, mirroring the scan cell.
        hs = pallas_lstm.lstm_sequence(
            xs.astype(pallas_lstm.stream_dtype(dtype, residual_dtype)),
            w_hh.astype(dtype), residual_dtype, reverse,
        )
        return jnp.swapaxes(hs, 0, 1)

    if reverse:
        x_proj = jnp.flip(x_proj, axis=1)
    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H] time-major
    w_hh_c = w_hh.astype(dtype)

    def cell(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(
            h.astype(dtype), w_hh_c, preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((batch, hidden), jnp.float32),
        jnp.zeros((batch, hidden), jnp.float32),
    )
    _, hs = jax.lax.scan(cell, init, xs)
    hs = jnp.swapaxes(hs, 0, 1)  # [B, T, H]
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs


class LSTM(nn.Module):
    """Multi-layer (bi)directional LSTM with torch-compatible parameters.

    Parameters per layer/direction: ``w_ih`` [I, 4H] (transposed vs torch),
    ``w_hh`` [H, 4H], ``b_ih`` and ``b_hh`` [4H]. Initialization follows
    torch's U(-1/sqrt(H), 1/sqrt(H)). Returns the full output sequence
    [B, T, D*H] with forward/backward halves concatenated per layer, which
    is exactly what all five reference LSTM stacks consume
    (ref: model.py:71,119,174,189,244,268).
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True
    dtype: Dtype = jnp.float32
    # saved-residual precision for the Pallas backward (None -> the
    # kernel-module default). Threaded from config.residual_dtype by
    # the encoders/decoders so it is a per-model property, not a
    # process global (ADVICE r2).
    residual_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: Array, mode: str = "run", start_layer: int = 0
    ) -> Any:
        """mode="run": run layers ``start_layer..num_layers-1`` over x
        (the default, start_layer=0 = the whole stack).

        mode="streams": declare layer ``start_layer``'s parameters and
        return its kernel-ready recurrence streams
        ``(xp_f [T,B,4H], xp_b [T,B,4H], w_f, w_b)`` — both projected
        input streams in real time order — WITHOUT running the recurrence — the caller feeds them to
        ``ops.pallas_multilstm.multi_bilstm_sequence`` together with
        streams of *other, independent* LSTMs so all their sequential
        cell chains interleave in one kernel grid (a narrow recurrence
        is latency-bound, so N fused streams cost about the same as
        one — see that module's docstring), then resumes any remaining
        layers via mode="run"/start_layer. Both paths declare identical
        parameter trees, so a checkpoint is loadable regardless of
        which path built it.
        """
        from speechsplit_tpu.ops import pallas_lstm

        h = self.hidden_size
        k = 1.0 / math.sqrt(h)
        batch = x.shape[0]

        def make_params(sfx: str, in_features: int):
            w_ih = self.param(
                f"w_ih_{sfx}", uniform_fan(k), (in_features, 4 * h)
            )
            w_hh = self.param(f"w_hh_{sfx}", uniform_fan(k), (h, 4 * h))
            b_ih = self.param(f"b_ih_{sfx}", uniform_fan(k), (4 * h,))
            b_hh = self.param(f"b_hh_{sfx}", uniform_fan(k), (4 * h,))
            return w_ih, w_hh, b_ih + b_hh

        def project(inputs, w_ih, bias):
            return (
                jnp.dot(
                    inputs.astype(self.dtype),
                    w_ih.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )

        if mode == "streams":
            assert self.bidirectional, "streams mode is for BiLSTM layers"
            in_features = x.shape[-1]
            p_f = make_params(f"l{start_layer}", in_features)
            p_b = make_params(f"l{start_layer}_reverse", in_features)
            w_dtype = _recurrent_dtype(self.dtype, h)
            return (
                jnp.swapaxes(project(x, p_f[0], p_f[2]), 0, 1),
                jnp.swapaxes(project(x, p_b[0], p_b[2]), 0, 1),
                p_f[1].astype(w_dtype),
                p_b[1].astype(w_dtype),
            )
        assert mode == "run", mode

        use_pallas = self.dtype in (
            jnp.float32, jnp.bfloat16
        ) and pallas_lstm.supported(batch, h)
        merged = (
            use_pallas
            and self.bidirectional
            and pallas_lstm.merged_bidir_fits(x.shape[1], batch, h)
        )
        if merged:
            # the WHOLE stack runs time-major: one [B,T,.] -> [T,B,.]
            # layout change in, one out. Projections contract the last
            # dim, so they cost the same in either layout, while the
            # per-layer swapaxes of [T,B,4H]/[T,B,2H] tensors each
            # materialized a real relayout copy (~0.07 ms apiece at the
            # reference geometry — 9 of them per step for the 3-layer
            # decoder before this, plus their transposed mirrors in the
            # backward). Numerics are unchanged: same GEMMs, same
            # kernel streams, only the relayout points moved.
            x = jnp.swapaxes(x, 0, 1)
            t_len = x.shape[0]
            for layer in range(start_layer, self.num_layers):
                in_features = x.shape[-1]
                p_f = make_params(f"l{layer}", in_features)
                p_b = make_params(f"l{layer}_reverse", in_features)
                w_dtype = _recurrent_dtype(self.dtype, h)
                # both directions advance in ONE kernel grid; all
                # streams stay in real time order (the kernel's index
                # maps realize the backward direction — no flips)
                if pallas_lstm.fused_proj_plan(
                    t_len, batch, h, in_features, w_dtype
                ):
                    # input projection runs INSIDE the grid (W_ih
                    # resident in VMEM, one [fold*B, I] @ [I, 4H]
                    # matmul per grid step) — the [T, B, 4H] projected
                    # tensors never round-trip HBM
                    hs_f, hs_b = pallas_lstm.bilstm_sequence_fused(
                        x.astype(w_dtype),
                        p_f[0].astype(w_dtype),
                        p_b[0].astype(w_dtype),
                        p_f[2], p_b[2],
                        p_f[1].astype(w_dtype),
                        p_b[1].astype(w_dtype),
                        self.residual_dtype,
                    )
                elif pallas_lstm.LAYER_VJP == "on":
                    # layer-level custom VJP: projection + recurrence
                    # in one op — identical forward, backward consumes
                    # the dxp stream at the residual dtype with no
                    # boundary convert (pallas_lstm.bilstm_layer)
                    hs_f, hs_b = pallas_lstm.bilstm_layer(
                        x.astype(w_dtype),
                        p_f[0].astype(w_dtype),
                        p_b[0].astype(w_dtype),
                        p_f[2], p_b[2],
                        p_f[1].astype(w_dtype),
                        p_b[1].astype(w_dtype),
                        self.residual_dtype,
                    )
                else:
                    # stream dtype: bf16 xp feed when compute AND
                    # residuals are bf16 (pallas_lstm.stream_dtype)
                    sd = pallas_lstm.stream_dtype(
                        w_dtype, self.residual_dtype
                    )
                    hs_f, hs_b = pallas_lstm.bilstm_sequence(
                        project(x, p_f[0], p_f[2]).astype(sd),
                        project(x, p_b[0], p_b[2]).astype(sd),
                        p_f[1].astype(w_dtype),
                        p_b[1].astype(w_dtype),
                        self.residual_dtype,
                    )
                x = jnp.concatenate([hs_f, hs_b], axis=-1)
            return jnp.swapaxes(x, 0, 1)

        for layer in range(start_layer, self.num_layers):
            in_features = x.shape[-1]
            if not self.bidirectional:
                w_ih, w_hh, bias = make_params(f"l{layer}", in_features)
                x = _lstm_direction(
                    project(x, w_ih, bias), w_hh, False, self.dtype,
                    self.residual_dtype,
                )
                continue

            p_f = make_params(f"l{layer}", in_features)
            p_b = make_params(f"l{layer}_reverse", in_features)
            outs = [
                _lstm_direction(
                    project(x, p[0], p[2]), p[1], reverse,
                    self.dtype, self.residual_dtype,
                )
                for p, reverse in ((p_f, False), (p_b, True))
            ]
            x = jnp.concatenate(outs, axis=-1)
        return x


def downsample_codes(outputs: Array, dim_neck: int, freq: int) -> Array:
    """Stride-``freq`` bottleneck sampling of BiLSTM outputs.

    Forward states are taken at t ≡ freq-1 (mod freq), backward states at
    t ≡ 0 (mod freq), then concatenated (ref: model.py:87,137-138,223-227).
    outputs: [B, T, 2*dim_neck] -> codes [B, T//freq, 2*dim_neck].

    Formulated as reshape + static index rather than a strided slice:
    the strided form's VJP lowered to a scatter-add that XLA:TPU
    serializes into a T//freq-iteration while loop (measured ~0.84
    ms/step across the three encoders at the reference geometry — 13%
    of the whole train step); the reshape form's VJP is a zero-pad,
    one cheap fusion. Numerics are identical (same elements selected).
    """
    b, t, c = outputs.shape
    if t % freq == 0:
        blocks = outputs.reshape(b, t // freq, freq, c)
        fwd = blocks[:, :, freq - 1, :dim_neck]
        bwd = blocks[:, :, 0, dim_neck:]
    else:  # ragged tail: keep the strided form (not a training shape)
        fwd = outputs[:, freq - 1 :: freq, :dim_neck]
        bwd = outputs[:, ::freq, dim_neck:]
    return jnp.concatenate([fwd, bwd], axis=-1)


def upsample_codes(codes: Array, freq: int) -> Array:
    """Repeat-interleave codes back to frame rate (ref: model.py:301-306)."""
    return jnp.repeat(codes, freq, axis=1)


def combine_bidir(h_f: Array, h_b: Array) -> Array:
    """Assemble a BiLSTM output from fused-kernel direction streams.

    h_f, h_b: [T, B, H] forward/backward direction states, BOTH in real
    time order (the round-3 kernel convention — reversal happens inside
    the kernels' index maps). Returns [B, T, 2H] — exactly the layout
    LSTM's merged-bidir path produces internally.
    """
    return jnp.swapaxes(jnp.concatenate([h_f, h_b], axis=-1), 0, 1)

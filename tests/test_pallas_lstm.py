"""Pallas LSTM kernels vs the lax.scan reference path (interpret mode).

Numerics must match exactly-ish (same math, same precision policy) in
both forward and backward; these tests run the kernels through the
Pallas interpreter on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.ops import pallas_lstm

T, B, H = 12, 8, 128  # satisfies tiling constraints


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_lstm.FORCE_INTERPRET = True
    # exact-gradient comparisons pin full-precision residuals; the
    # shipped bf16-residual default is covered by its own test below
    prev = pallas_lstm.RESIDUAL_DTYPE
    pallas_lstm.RESIDUAL_DTYPE = jnp.float32
    yield
    pallas_lstm.FORCE_INTERPRET = False
    pallas_lstm.RESIDUAL_DTYPE = prev


def _scan_reference(x_proj, w_hh):
    def cell(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(cell, init, x_proj)
    return hs


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x_proj = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.4)
    w_hh = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
    return x_proj, w_hh


def test_forward_matches_scan():
    x_proj, w_hh = _inputs()
    expected = np.asarray(_scan_reference(x_proj, w_hh))
    got = np.asarray(pallas_lstm.lstm_sequence(x_proj, w_hh))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_gradients_match_scan():
    x_proj, w_hh = _inputs(1)
    target = jnp.asarray(
        np.random.RandomState(2).randn(T, B, H).astype(np.float32)
    )

    def loss_pallas(xp, w):
        return jnp.mean(
            jnp.square(pallas_lstm.lstm_sequence(xp, w) - target)
        )

    def loss_scan(xp, w):
        return jnp.mean(jnp.square(_scan_reference(xp, w) - target))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh)
    gs = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_hh)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-5
    )


def test_bf16_residuals_gradients_close():
    """The shipped bf16-residual mode: gradients within mixed-precision
    tolerance of the exact path."""
    x_proj, w_hh = _inputs(5)
    target = jnp.asarray(
        np.random.RandomState(6).randn(T, B, H).astype(np.float32)
    )

    def loss(xp, w):
        return jnp.mean(
            jnp.square(pallas_lstm.lstm_sequence(xp, w) - target)
        )

    g_exact = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)
    pallas_lstm.RESIDUAL_DTYPE = jnp.bfloat16
    try:
        g_bf16 = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)
    finally:
        pallas_lstm.RESIDUAL_DTYPE = jnp.float32
    for a, b in zip(g_exact, g_bf16):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 0.02


def test_bf16_weight_forward_matches_bf16_scan():
    """bf16 recurrent weights (compute_dtype=bfloat16): the kernel must
    match a scan cell using the identical precision policy — h cast to
    bf16 for the recurrent matmul, f32 accumulate/state."""
    x_proj, w_hh = _inputs(7)
    w_bf16 = w_hh.astype(jnp.bfloat16)

    def cell(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(
            h.astype(jnp.bfloat16), w_bf16,
            preferred_element_type=jnp.float32,
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    expected = np.asarray(jax.lax.scan(cell, init, x_proj)[1])
    got = np.asarray(pallas_lstm.lstm_sequence(x_proj, w_bf16))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_bf16_weight_gradients_close_to_f32():
    """bf16-weight gradients stay within mixed-precision tolerance of the
    f32 kernel path, and cotangent dtypes match the primals."""
    x_proj, w_hh = _inputs(8)
    target = jnp.asarray(
        np.random.RandomState(9).randn(T, B, H).astype(np.float32)
    )

    def loss(xp, w):
        return jnp.mean(
            jnp.square(pallas_lstm.lstm_sequence(xp, w) - target)
        )

    g32 = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)
    g16 = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh.astype(jnp.bfloat16))
    assert g16[0].dtype == jnp.float32
    assert g16[1].dtype == jnp.bfloat16
    for a, b in zip(g32, g16):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 0.03


def test_stream_dtype_rule():
    """xp streams go bf16 only when the flag is on AND compute AND
    residuals are bf16."""
    sd = pallas_lstm.stream_dtype
    prev = pallas_lstm.XP_STREAM_FOLLOWS_COMPUTE
    try:
        pallas_lstm.XP_STREAM_FOLLOWS_COMPUTE = True
        assert sd(jnp.float32, jnp.float32) == jnp.float32
        assert sd(jnp.float32, jnp.bfloat16) == jnp.float32
        assert sd(jnp.bfloat16, jnp.float32) == jnp.float32
        assert sd(jnp.bfloat16, jnp.bfloat16) == jnp.bfloat16
        # None resolves to the module default (f32 under this fixture)
        assert sd(jnp.bfloat16, None) == jnp.float32
        pallas_lstm.XP_STREAM_FOLLOWS_COMPUTE = False
        assert sd(jnp.bfloat16, jnp.bfloat16) == jnp.float32
    finally:
        pallas_lstm.XP_STREAM_FOLLOWS_COMPUTE = prev


def test_bf16_stream_forward_and_gradients_close():
    """Full bf16 stream mode (bf16 xp feed + bf16 residuals + bf16 dxp):
    forward and gradients stay within mixed-precision tolerance of the
    f32 path, and the xp cotangent is bf16 (the natural stream dtype —
    no convert at the custom-vjp boundary)."""
    x_proj, w_hh = _inputs(10)
    target = jnp.asarray(
        np.random.RandomState(11).randn(T, B, H).astype(np.float32)
    )

    def loss(xp, w):
        return jnp.mean(
            jnp.square(pallas_lstm.lstm_sequence(xp, w) - target)
        )

    f32_fwd = np.asarray(pallas_lstm.lstm_sequence(x_proj, w_hh))
    g32 = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)

    pallas_lstm.RESIDUAL_DTYPE = jnp.bfloat16
    try:
        xb = x_proj.astype(jnp.bfloat16)
        wb = w_hh.astype(jnp.bfloat16)
        fwd16 = np.asarray(pallas_lstm.lstm_sequence(xb, wb))
        g16 = jax.grad(loss, argnums=(0, 1))(xb, wb)
    finally:
        pallas_lstm.RESIDUAL_DTYPE = jnp.float32

    assert g16[0].dtype == jnp.bfloat16  # cotangent matches primal
    assert g16[1].dtype == jnp.bfloat16
    assert np.abs(fwd16 - f32_fwd).max() < 0.05
    for a, b in zip(g32, g16):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 0.05


def test_f32_residuals_keep_f32_grad_stream():
    """The bit-parity escape hatch: f32 residuals must keep the f32
    dxp stream regardless of the follow-residual flag."""
    x_proj, w_hh = _inputs(12)

    def loss(xp, w):
        return jnp.mean(jnp.square(pallas_lstm.lstm_sequence(xp, w)))

    g = jax.grad(loss, argnums=(0, 1))(x_proj, w_hh)
    assert g[0].dtype == jnp.float32
    assert pallas_lstm._grad_stream_dtype(jnp.float32) == jnp.float32
    assert pallas_lstm._grad_stream_dtype(jnp.bfloat16) == jnp.bfloat16
    # the dh cotangent stream rides the RESIDUAL dtype alone (like the
    # grad/dxp stream) — the round-4 hardware A/B measured its win in
    # the f32-compute + bf16-residual shipped default, and a 400-step
    # trajectory run verified the rounding (pallas_lstm.py flag note)
    dh = pallas_lstm._dh_stream_dtype
    prev = pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL
    try:
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = True
        assert dh(jnp.float32, jnp.float32) == jnp.float32
        assert dh(jnp.float32, jnp.bfloat16) == jnp.bfloat16
        assert dh(jnp.bfloat16, jnp.float32) == jnp.float32
        assert dh(jnp.bfloat16, jnp.bfloat16) == jnp.bfloat16
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = False
        assert dh(jnp.bfloat16, jnp.bfloat16) == jnp.float32
        assert dh(jnp.float32, jnp.bfloat16) == jnp.float32
    finally:
        pallas_lstm.DH_STREAM_FOLLOWS_RESIDUAL = prev


def test_h_stream_bf16_is_rounded_f32_output():
    """The h-stream lever's claimed invariant: in full-bf16 mode the
    kernel's bf16 h output is BIT-identical to the f32 output rounded
    to bf16 (the rounding every downstream consumer applies anyway), so
    flipping H_STREAM_FOLLOWS_COMPUTE cannot change forward numerics."""
    x_proj, w_hh = _inputs(13)
    xb = x_proj.astype(jnp.bfloat16)
    wb = w_hh.astype(jnp.bfloat16)
    pallas_lstm.RESIDUAL_DTYPE = jnp.bfloat16
    prev = pallas_lstm.H_STREAM_FOLLOWS_COMPUTE
    try:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = False
        h_f32 = pallas_lstm.lstm_sequence(xb, wb)
        assert h_f32.dtype == jnp.float32
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = True
        h_bf16 = pallas_lstm.lstm_sequence(xb, wb)
        assert h_bf16.dtype == jnp.bfloat16
    finally:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = prev
        pallas_lstm.RESIDUAL_DTYPE = jnp.float32
    np.testing.assert_array_equal(
        np.asarray(h_f32.astype(jnp.bfloat16), np.float32),
        np.asarray(h_bf16, np.float32),
    )
    # the rule itself: f32 compute or f32 residuals keep f32 h, and
    # the flag (off by default pending a hardware A/B) gates the rest
    hd = pallas_lstm._h_stream_dtype
    prev = pallas_lstm.H_STREAM_FOLLOWS_COMPUTE
    try:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = True
        assert hd(jnp.float32, jnp.bfloat16) == jnp.float32
        assert hd(jnp.bfloat16, jnp.float32) == jnp.float32
        assert hd(jnp.bfloat16, jnp.bfloat16) == jnp.bfloat16
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = False
        assert hd(jnp.bfloat16, jnp.bfloat16) == jnp.float32
    finally:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = prev


def test_supported_predicate():
    assert pallas_lstm.supported(8, 128)
    assert pallas_lstm.supported(16, 512)
    assert pallas_lstm.supported(16, 8)    # bottleneck widths OK on TPU
    assert not pallas_lstm.supported(4, 512)   # batch too small


@pytest.mark.parametrize("hidden", [8, 32])
def test_small_width_forward_matches_scan(hidden):
    rng = np.random.RandomState(3)
    x_proj = jnp.asarray(
        rng.randn(T, B, 4 * hidden).astype(np.float32) * 0.4
    )
    w_hh = jnp.asarray(
        rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.1
    )

    def scan(xp, w):
        def cell(carry, xt):
            h, c = carry
            g = xt + h @ w
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, hidden)), jnp.zeros((B, hidden)))
        return jax.lax.scan(cell, init, xp)[1]

    got = np.asarray(pallas_lstm.lstm_sequence(x_proj, w_hh))
    np.testing.assert_allclose(got, np.asarray(scan(x_proj, w_hh)), atol=1e-5)

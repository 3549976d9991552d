"""Long-form (windowed) conversion past the 192-frame model geometry."""

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.convert import convert_long
from speechsplit_tpu.training.train_step import create_train_state

pytestmark = pytest.mark.slow  # long-form windowed conversions (~4 s each)

CFG = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


@pytest.fixture(scope="module")
def models():
    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    return g_module, g_state.params, p_module, p_state.params


def _utt(rng, length):
    return (
        rng.rand(length, 80).astype(np.float32),
        rng.rand(length).astype(np.float32),
        np.eye(82, dtype=np.float32)[3],
    )


@pytest.mark.parametrize("condition,src_len,trg_len", [
    ("U", 600, 150),     # long source, source timeline
    ("RFU", 150, 500),   # long target, target timeline
    ("F", 150, 120),     # short-path sanity
])
def test_convert_long_shapes(models, rng, condition, src_len, trg_len):
    g_module, g_params, p_module, p_params = models
    s_mel, s_f0, s_emb = _utt(rng, src_len)
    t_mel, t_f0, t_emb = _utt(rng, trg_len)
    out = convert_long(
        CFG, g_module, g_params, p_module, p_params,
        s_mel, s_f0, s_emb, t_mel, t_f0, t_emb, condition=condition,
    )
    expect = trg_len if "R" in condition else src_len
    assert out.shape == (expect, 80)
    assert np.isfinite(out).all()
    # no dead zones: every frame was covered by some window
    assert np.abs(out).sum(axis=1).min() > 0

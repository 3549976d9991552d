"""Conversion-driver tests, including golden parity with the reference
demo pipeline on the bundled demo.pkl utterances."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.convert import (
    CONDITIONS,
    convert,
    convert_f0,
    load_demo_metadata,
    prepare_utterance,
    utterance_from_metadata,
)
from speechsplit_tpu.models import F0Converter, SpeechSplit
from speechsplit_tpu.training.train_step import create_train_state

CFG = SpeechSplitConfig()
DEMO_PKL = "/root/reference/assets/demo.pkl"


@pytest.fixture(scope="module")
def models():
    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    return g_module, g_state.params, p_module, p_state.params


def _random_utterance(rng, name, uid, length=150):
    mel = rng.rand(length, 80).astype(np.float32)
    f0 = rng.rand(length).astype(np.float32)
    emb = np.zeros(82, np.float32)
    emb[rng.randint(0, 82)] = 1.0
    return prepare_utterance(CFG, mel, f0, emb, name=name, uid=uid)


@pytest.mark.slow
def test_seven_conditions_shapes(models, rng):
    g_module, g_params, p_module, p_params = models
    src = _random_utterance(rng, "spkA", "u1", 150)
    trg = _random_utterance(rng, "spkB", "u2", 120)
    results = convert(g_module, g_params, p_module, p_params, src, trg)
    assert [n.split("_")[-1] for n, _ in results] == list(CONDITIONS)
    for name, mel in results:
        expect_len = trg.length if "R" in name.split("_")[-1] else src.length
        assert mel.shape == (expect_len, 80)
        assert np.isfinite(mel).all()
    # conditions produce distinct outputs
    r = dict(results)
    a = r["spkA_spkB_u1_R"][:100]
    b = r["spkA_spkB_u1_U"][:100]
    assert np.abs(a - b).max() > 1e-6


def test_f0_conversion_is_onehot(models, rng):
    g_module, g_params, p_module, p_params = models
    src = _random_utterance(rng, "a", "u", 100)
    trg = _random_utterance(rng, "b", "v", 100)
    onehot = np.asarray(convert_f0(p_module, p_params, src, trg))
    assert onehot.shape == (1, CFG.max_len_pad, CFG.dim_f0)
    np.testing.assert_array_equal(onehot.sum(-1), 1.0)
    assert set(np.unique(onehot)) == {0.0, 1.0}


@pytest.mark.skipif(
    not os.path.exists(DEMO_PKL), reason="demo.pkl not available"
)
@pytest.mark.slow
def test_demo_conversion_parity_with_reference(models):
    """Golden test: with identical (converted) weights, our conversion of
    the bundled demo utterances must match the reference demo pipeline
    within the BASELINE 1e-3 mel MAE budget (it matches far tighter)."""
    torch = pytest.importorskip("torch")
    from speechsplit_tpu.interop import torch_state_dict_to_params
    from tests.reference_oracle import load_reference

    ref_model, ref_hparams = load_reference()
    metadata = load_demo_metadata(DEMO_PKL)

    torch.manual_seed(0)
    ref_g = ref_model.Generator_3(ref_hparams).eval()
    ref_p = ref_model.Generator_6(ref_hparams).eval()
    g_params = torch_state_dict_to_params(ref_g.state_dict(), "speechsplit")
    p_params = torch_state_dict_to_params(
        ref_p.state_dict(), "f0_converter"
    )

    src = utterance_from_metadata(CFG, metadata[0])
    trg = utterance_from_metadata(CFG, metadata[1])

    g_module = SpeechSplit(CFG)
    p_module = F0Converter(CFG)
    ours = dict(
        convert(g_module, g_params, p_module, p_params, src, trg)
    )

    # reference pipeline (demo.ipynb cell-0), driven directly
    from speechsplit_tpu.ops.masks import pad_time_axis
    from speechsplit_tpu.ops.quantize import quantize_f0_onehot

    def prep(entry):
        mel, f0, length, uid = entry[2]
        mel_pad, _ = pad_time_axis(
            np.asarray(mel, np.float32)[None], 192
        )
        f0_pad = np.pad(np.asarray(f0, np.float64), (0, 192 - length))
        onehot = np.asarray(
            quantize_f0_onehot(jnp.asarray(f0_pad), 256)
        )[None]
        return (
            torch.from_numpy(mel_pad),
            torch.from_numpy(onehot.astype(np.float32)),
            torch.from_numpy(np.asarray(entry[1], np.float32)),
            length,
        )

    u_org, f0_org_oh, emb_org, len_org = prep(metadata[0])
    u_trg, f0_trg_oh, emb_trg, len_trg = prep(metadata[1])

    with torch.no_grad():
        f0_pred = ref_p(u_org, f0_trg_oh)[0]
        ids = f0_pred.argmax(dim=-1).squeeze(0)
        f0_con = torch.zeros((1, 192, 257))
        f0_con[0, torch.arange(192), ids] = 1
        uttr_f0_org = torch.cat((u_org, f0_org_oh), dim=-1)
        uttr_f0_trg = torch.cat((u_org, f0_con), dim=-1)
        cases = {
            "R": (uttr_f0_org, u_trg, emb_org),
            "F": (uttr_f0_trg, u_org, emb_org),
            "U": (uttr_f0_org, u_org, emb_trg),
            "RF": (uttr_f0_trg, u_trg, emb_org),
            "RU": (uttr_f0_org, u_trg, emb_trg),
            "FU": (uttr_f0_trg, u_org, emb_trg),
            "RFU": (uttr_f0_trg, u_trg, emb_trg),
        }
        for cond, (x_f0, x_org, emb) in cases.items():
            expected = ref_g(x_f0, x_org, emb)[0].numpy()
            cut = len_trg if "R" in cond else len_org
            expected = expected[:cut]
            name = f"{metadata[0][0]}_{metadata[1][0]}_{src.uid}_{cond}"
            got = ours[name]
            mae = np.abs(got - expected).mean()
            assert mae < 1e-3, f"{cond}: mel MAE {mae}"
            assert np.abs(got - expected).max() < 5e-4, cond

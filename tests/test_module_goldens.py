"""Per-module golden activation parity vs the reference (eval mode).

test_models.py checks the full forward; these pin each encoder/decoder
individually so a regression localizes to a module, mirroring the
"golden-activation tests against the reference per module" plan of
SURVEY.md §7 stage 4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speechsplit_tpu.config import SpeechSplitConfig  # noqa: E402
from speechsplit_tpu.interop import torch_state_dict_to_params  # noqa: E402
from speechsplit_tpu.models import (  # noqa: E402
    ContentPitchEncoder,
    F0Decoder,
    F0Encoder,
    MelDecoder,
    RhythmEncoder,
)
from tests.reference_oracle import load_reference  # noqa: E402

CFG = SpeechSplitConfig()


@pytest.fixture(scope="module")
def reference():
    return load_reference()


def _subtree(params, key):
    return {k[len(key) + 1 :]: v for k, v in _flat(params).items()
            if k.startswith(key + "/")}


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = v
    return out


def _unflat(flat):
    tree = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def test_rhythm_encoder_golden(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(10)
    ref = ref_model.Generator_3(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "speechsplit")
    sub = _unflat(_subtree(params, "encoder_rhythm"))

    x = rng.randn(2, 192, 80).astype(np.float32)
    with torch.no_grad():
        expected = ref.encoder_2(
            torch.from_numpy(x.transpose(0, 2, 1)), None
        ).numpy()
    got = np.asarray(
        RhythmEncoder(CFG).apply({"params": sub}, jnp.asarray(x), None)
    )
    assert got.shape == expected.shape == (2, 24, 2)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_content_pitch_encoder_golden(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(11)
    ref = ref_model.Generator_3(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "speechsplit")
    sub = _unflat(_subtree(params, "encoder_content_pitch"))

    x = rng.randn(2, 192, 337).astype(np.float32)
    with torch.no_grad():
        exp_c, exp_p = ref.encoder_1(
            torch.from_numpy(x.transpose(0, 2, 1))
        )
    got_c, got_p = ContentPitchEncoder(CFG).apply(
        {"params": sub}, jnp.asarray(x)
    )
    assert got_c.shape == exp_c.shape == (2, 24, 16)
    assert got_p.shape == exp_p.shape == (2, 24, 64)
    np.testing.assert_allclose(np.asarray(got_c), exp_c.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_p), exp_p.numpy(), atol=2e-5)


def test_mel_decoder_golden(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(12)
    ref = ref_model.Generator_3(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "speechsplit")
    sub = _unflat(_subtree(params, "decoder"))

    x = rng.randn(2, 192, CFG.dim_code).astype(np.float32)
    with torch.no_grad():
        expected = ref.decoder(torch.from_numpy(x)).numpy()
    got = np.asarray(MelDecoder(CFG).apply({"params": sub}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_f0_encoder_and_decoder_golden(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(13)
    ref = ref_model.Generator_6(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "f0_converter")

    x = rng.randn(2, 192, 257).astype(np.float32)
    with torch.no_grad():
        expected = ref.encoder_3(
            torch.from_numpy(x.transpose(0, 2, 1))
        ).numpy()
    got = np.asarray(
        F0Encoder(CFG).apply(
            {"params": _unflat(_subtree(params, "encoder_f0"))},
            jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5)

    y = rng.randn(2, 192, 66).astype(np.float32)
    with torch.no_grad():
        expected_d = ref.decoder(torch.from_numpy(y)).numpy()
    got_d = np.asarray(
        F0Decoder(CFG).apply(
            {"params": _unflat(_subtree(params, "decoder"))},
            jnp.asarray(y),
        )
    )
    np.testing.assert_allclose(got_d, expected_d, atol=2e-5)

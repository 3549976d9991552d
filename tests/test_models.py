"""End-to-end model parity against the reference (eval mode).

Random-initialized reference models are converted via
``speechsplit_tpu.interop`` and must reproduce the reference forward pass
on identical inputs. Also pins the exact parameter counts from
SURVEY.md §2.1 / BASELINE.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speechsplit_tpu.config import SpeechSplitConfig  # noqa: E402
from speechsplit_tpu.interop import torch_state_dict_to_params  # noqa: E402
from speechsplit_tpu.models import F0Converter, SpeechSplit  # noqa: E402
from tests.reference_oracle import load_reference  # noqa: E402

CFG = SpeechSplitConfig()


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def reference():
    return load_reference()


@pytest.mark.slow
def test_speechsplit_forward_matches_reference(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(0)
    ref = ref_model.Generator_3(ref_hparams).eval()

    params = torch_state_dict_to_params(ref.state_dict(), "speechsplit")

    batch, t_len = 2, CFG.max_len_pad
    x_f0 = rng.randn(batch, t_len, CFG.dim_freq + CFG.dim_f0).astype(
        np.float32
    )
    x_org = rng.randn(batch, t_len, CFG.dim_freq).astype(np.float32)
    c_trg = rng.randn(batch, CFG.dim_spk_emb).astype(np.float32)

    with torch.no_grad():
        expected = ref(
            torch.from_numpy(x_f0),
            torch.from_numpy(x_org),
            torch.from_numpy(c_trg),
        ).numpy()

    model = SpeechSplit(CFG)
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x_f0),
            jnp.asarray(x_org),
            jnp.asarray(c_trg),
        )
    )
    assert got.shape == expected.shape == (batch, t_len, CFG.dim_freq)
    np.testing.assert_allclose(got, expected, atol=5e-5)


def test_speechsplit_rhythm_endpoint_matches(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(1)
    ref = ref_model.Generator_3(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "speechsplit")

    x_org = rng.randn(2, CFG.max_len_pad, CFG.dim_freq).astype(np.float32)
    with torch.no_grad():
        expected = ref.rhythm(torch.from_numpy(x_org)).numpy()

    model = SpeechSplit(CFG)
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x_org), method=SpeechSplit.rhythm
        )
    )
    np.testing.assert_allclose(got, expected, atol=5e-5)


def test_f0_converter_forward_matches_reference(reference, rng):
    ref_model, ref_hparams = reference
    torch.manual_seed(2)
    ref = ref_model.Generator_6(ref_hparams).eval()
    params = torch_state_dict_to_params(ref.state_dict(), "f0_converter")

    batch, t_len = 2, CFG.max_len_pad
    x_org = rng.randn(batch, t_len, CFG.dim_freq).astype(np.float32)
    f0_trg = rng.randn(batch, t_len, CFG.dim_f0).astype(np.float32)

    with torch.no_grad():
        expected = ref(
            torch.from_numpy(x_org), torch.from_numpy(f0_trg)
        ).numpy()

    model = F0Converter(CFG)
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x_org), jnp.asarray(f0_trg)
        )
    )
    assert got.shape == expected.shape == (batch, t_len, CFG.dim_f0)
    np.testing.assert_allclose(got, expected, atol=5e-5)


def test_parameter_counts_match_reference():
    """19,437,800 G params / 3,485,849 P params (SURVEY.md §2.1)."""
    cfg = CFG
    g_params = SpeechSplit(cfg).init(
        {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)},
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_freq + cfg.dim_f0)),
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_freq)),
        jnp.zeros((1, cfg.dim_spk_emb)),
    )["params"]
    assert _count(g_params) == 19_437_800

    p_params = F0Converter(cfg).init(
        {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)},
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_freq)),
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_f0)),
    )["params"]
    assert _count(p_params) == 3_485_849


@pytest.mark.slow
def test_train_mode_runs_and_differs_from_eval(rng):
    cfg = CFG
    model = SpeechSplit(cfg)
    x_f0 = jnp.asarray(
        rng.randn(2, cfg.max_len_pad, cfg.dim_freq + cfg.dim_f0).astype(
            np.float32
        )
    )
    x_org = jnp.asarray(
        rng.randn(2, cfg.max_len_pad, cfg.dim_freq).astype(np.float32)
    )
    c_trg = jnp.asarray(rng.randn(2, cfg.dim_spk_emb).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "resample": jax.random.PRNGKey(1)},
        x_f0, x_org, c_trg,
    )
    out_eval = model.apply(variables, x_f0, x_org, c_trg, train=False)
    out_train = model.apply(
        variables, x_f0, x_org, c_trg, train=True,
        rngs={"resample": jax.random.PRNGKey(2)},
    )
    assert out_eval.shape == out_train.shape
    assert np.abs(np.asarray(out_eval) - np.asarray(out_train)).max() > 1e-4


def test_interop_rejects_unknown_parameters():
    from speechsplit_tpu.interop import torch_state_dict_to_params

    with pytest.raises(ValueError, match="unmapped reference parameter"):
        torch_state_dict_to_params(
            {"encoder_9.bogus.weight": np.zeros((2, 2))}, "speechsplit"
        )
    # constant buffers are skipped silently (ref registers len_org)
    out = torch_state_dict_to_params(
        {"encoder_1.len_org": np.asarray(192)}, "speechsplit"
    )
    assert out == {}


def test_export_roundtrip_is_bit_identical(reference):
    """params -> reference state_dict -> params must be exact, and the
    exported dict must load into the actual torch reference module
    (same keys, same shapes) for both model families."""
    from speechsplit_tpu.interop import params_to_torch_state_dict

    ref_model, ref_hparams = reference
    for model_name, ctor, seed in (
        ("speechsplit", ref_model.Generator_3, 10),
        ("f0_converter", ref_model.Generator_6, 11),
    ):
        torch.manual_seed(seed)
        ref = ctor(ref_hparams).eval()
        params = torch_state_dict_to_params(ref.state_dict(), model_name)
        exported = params_to_torch_state_dict(params, model_name)

        # exact round trip back to flax params
        back = torch_state_dict_to_params(exported, model_name)

        def as_flat(tree):
            return {
                jax.tree_util.keystr(path): leaf
                for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
            }

        flat_a, flat_b = as_flat(params), as_flat(back)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k])

        # the torch reference accepts the exported dict verbatim
        # (len_org buffers are constants the export rightly omits)
        state = {k: torch.from_numpy(v.copy()) for k, v in exported.items()}
        missing, unexpected = ctor(ref_hparams).load_state_dict(
            state, strict=False
        )
        assert not unexpected
        assert all(k.endswith("len_org") for k in missing)
        ref_keys = {
            k for k in ref.state_dict() if not k.endswith("len_org")
        }
        assert set(exported) == ref_keys


def test_export_rejects_learned_mode_subtrees():
    from speechsplit_tpu.interop import params_to_torch_state_dict

    cfg = SpeechSplitConfig()
    model = SpeechSplit(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_freq + cfg.dim_f0)),
        jnp.zeros((1, cfg.max_len_pad, cfg.dim_freq)),
        jnp.zeros((1, cfg.dim_spk_emb)),
    )
    params = dict(variables["params"])
    params["speaker_encoder"] = {"proj": {"kernel": np.zeros((4, 4))}}
    with pytest.raises(ValueError, match="no reference counterpart"):
        params_to_torch_state_dict(params, "speechsplit")

"""Layer-level numerical parity against torch primitives.

These tests copy identical weights into both implementations and compare
outputs — they pin down gate ordering, padding, normalization statistics
and layout conventions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speechsplit_tpu.models.layers import (  # noqa: E402
    LSTM,
    Conv1d,
    GroupNorm,
    Linear,
    downsample_codes,
    upsample_codes,
)


def test_linear_matches_torch(rng):
    x = rng.randn(4, 7, 16).astype(np.float32)
    lin = Linear(features=24)
    params = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))

    t = torch.nn.Linear(16, 24)
    with torch.no_grad():
        t.weight.copy_(
            torch.from_numpy(np.asarray(params["params"]["kernel"]).T)
        )
        t.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        expected = t(torch.from_numpy(x)).numpy()

    got = np.asarray(lin.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_conv1d_same_padding_matches_torch(rng):
    x = rng.randn(2, 31, 12).astype(np.float32)
    conv = Conv1d(features=20, kernel_size=5, w_init_gain="relu")
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))

    t = torch.nn.Conv1d(12, 20, kernel_size=5, padding=2)
    with torch.no_grad():
        kernel = np.asarray(params["params"]["kernel"])  # [k, in, out]
        t.weight.copy_(torch.from_numpy(kernel.transpose(2, 1, 0)))
        t.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        expected = (
            t(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )

    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_groupnorm_matches_torch(rng):
    x = rng.randn(3, 17, 32).astype(np.float32) * 3 + 1
    gn = GroupNorm(num_groups=4)
    params = gn.init(jax.random.PRNGKey(2), jnp.asarray(x))

    t = torch.nn.GroupNorm(4, 32)
    with torch.no_grad():
        scale = np.linspace(0.5, 1.5, 32, dtype=np.float32)
        bias = np.linspace(-0.2, 0.2, 32, dtype=np.float32)
        t.weight.copy_(torch.from_numpy(scale))
        t.bias.copy_(torch.from_numpy(bias))
        expected = (
            t(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )

    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(gn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("num_layers,bidirectional", [(1, True), (2, True), (3, True), (1, False)])
def test_lstm_matches_torch(rng, num_layers, bidirectional):
    batch, t_len, in_dim, hidden = 3, 25, 11, 13
    x = rng.randn(batch, t_len, in_dim).astype(np.float32)

    lstm = LSTM(
        hidden_size=hidden,
        num_layers=num_layers,
        bidirectional=bidirectional,
    )
    params = lstm.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]

    t = torch.nn.LSTM(
        in_dim, hidden, num_layers,
        batch_first=True, bidirectional=bidirectional,
    )
    with torch.no_grad():
        for layer in range(num_layers):
            dirs = ["", "_reverse"] if bidirectional else [""]
            for sfx in dirs:
                ours = f"l{layer}{sfx}"
                getattr(t, f"weight_ih_l{layer}{sfx}").copy_(
                    torch.from_numpy(np.asarray(params[f"w_ih_{ours}"]).T))
                getattr(t, f"weight_hh_l{layer}{sfx}").copy_(
                    torch.from_numpy(np.asarray(params[f"w_hh_{ours}"]).T))
                getattr(t, f"bias_ih_l{layer}{sfx}").copy_(
                    torch.from_numpy(np.asarray(params[f"b_ih_{ours}"])))
                getattr(t, f"bias_hh_l{layer}{sfx}").copy_(
                    torch.from_numpy(np.asarray(params[f"b_hh_{ours}"])))
        expected = t(torch.from_numpy(x))[0].numpy()

    got = np.asarray(lstm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_code_down_up_sampling_shapes(rng):
    # stride-8 sampling: fwd states at t%8==7, bwd at t%8==0
    # (ref: model.py:87)
    outputs = jnp.asarray(rng.randn(2, 16, 6).astype(np.float32))
    codes = downsample_codes(outputs, dim_neck=3, freq=8)
    assert codes.shape == (2, 2, 6)
    np.testing.assert_array_equal(
        np.asarray(codes[:, 0, :3]), np.asarray(outputs[:, 7, :3])
    )
    np.testing.assert_array_equal(
        np.asarray(codes[:, 0, 3:]), np.asarray(outputs[:, 0, 3:])
    )
    up = upsample_codes(codes, 8)
    assert up.shape == (2, 16, 6)
    np.testing.assert_array_equal(
        np.asarray(up[:, 3]), np.asarray(codes[:, 0])
    )

"""bfloat16 compute-dtype policy: forward runs, params stay float32."""

import numpy as np

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.models import SpeechSplit

CFG = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


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

"""Learned speaker-embedding mode (config.spk_emb_mode="learned").

The zero-shot upgrade the reference's make_metadata.py:19 comment
anticipates ("may use generalized speaker embedding for zero-shot
conversion"): a jointly-trained utterance-level SpeakerEncoder replaces
the fixed 82-slot one-hot. Load-bearing properties:

- the DEFAULT (onehot) param tree is byte-identical to before the
  feature existed (checkpoint compatibility);
- embeddings are unit-norm and exactly invariant to trailing zero
  padding (masked conv-stack statistics);
- training in learned mode is finite and actually trains the encoder;
- a mel-valued c_trg is rejected in onehot mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Batch
from speechsplit_tpu.models.generator import SpeechSplit
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_train_step,
)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
    dim_spk_enc=32,
    batch_size=4,
)
LEARNED = SMALL.parse("spk_emb_mode=learned")


def _batch(cfg, key, b=4):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    t = cfg.max_len_pad
    lens = np.asarray([60, 90, 120, t][:b], np.int32)
    mel = np.array(jax.random.uniform(k1, (b, t, cfg.dim_freq)))
    f0 = np.array(jax.random.uniform(k2, (b, t, 1)))
    for i, ln in enumerate(lens):
        mel[i, ln:] = 0.0
        f0[i, ln:] = -1e10
    emb = np.zeros((b, cfg.dim_spk_emb), np.float32)
    emb[np.arange(b), np.arange(b)] = 1.0
    return Batch(
        mel=jnp.asarray(mel), spk_emb=jnp.asarray(emb),
        f0=jnp.asarray(f0), len_org=jnp.asarray(lens),
    )


def test_onehot_param_tree_unchanged():
    """The learned branch must not perturb default checkpoints: the
    full-size onehot tree keeps the exact reference-parity param count
    (tests/test_models.py pins 19,437,800) and contains no
    speaker_encoder branch."""
    _, state = create_train_state(SMALL, jax.random.PRNGKey(0))
    assert "speaker_encoder" not in state.params
    _, full_state = create_train_state(
        SpeechSplitConfig(), jax.random.PRNGKey(0)
    )
    n = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(full_state.params)
    )
    assert n == 19_437_800


def test_learned_mode_trains_and_embeds():
    module, state = create_train_state(LEARNED, jax.random.PRNGKey(0))
    assert "speaker_encoder" in state.params
    step = make_train_step(LEARNED, module)
    batch = _batch(LEARNED, 1)
    key = jax.random.PRNGKey(2)
    before = jax.tree.map(
        np.asarray, state.params["speaker_encoder"]
    )
    losses = []
    for _ in range(2):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    after = state.params["speaker_encoder"]
    deltas = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            after, before,
        )
    )
    assert max(deltas) > 0.0  # the encoder actually receives gradient

    # conversion-time entry point: unit-norm embedding of any utterance
    emb = module.apply(
        {"params": state.params}, batch.mel, method="embed_speaker"
    )
    assert emb.shape == (4, LEARNED.dim_spk_emb)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )


def test_embedding_padding_invariant():
    """Masked statistics: trailing zero padding must not change the
    embedding at all (the collator zeroes past each crop's length)."""
    module, state = create_train_state(LEARNED, jax.random.PRNGKey(0))
    t = LEARNED.max_len_pad
    mel = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (2, 100, 80))
    )
    short = jnp.asarray(np.pad(mel, ((0, 0), (0, 20), (0, 0))))
    longer = jnp.asarray(np.pad(mel, ((0, 0), (0, t - 100), (0, 0))))
    e1 = module.apply(
        {"params": state.params}, short, method="embed_speaker"
    )
    e2 = module.apply(
        {"params": state.params}, longer, method="embed_speaker"
    )
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e2), rtol=0, atol=1e-6
    )


def test_mel_ctrg_rejected_in_onehot_mode():
    module, state = create_train_state(SMALL, jax.random.PRNGKey(0))
    batch = _batch(SMALL, 4)
    x_f0 = jnp.concatenate(
        [batch.mel, jnp.zeros((4, SMALL.max_len_pad, SMALL.dim_f0))],
        axis=-1,
    )
    with pytest.raises(ValueError, match="learned"):
        module.apply(
            {"params": state.params}, x_f0, batch.mel, batch.mel
        )


def test_with_learned_embedding_conversion_path():
    """Conversion glue for learned-mode checkpoints: the utterance's
    spk_emb is replaced by its own mel's SpeakerEncoder embedding
    (zero-shot timbre target), a no-op in onehot mode, and the
    resulting utterance drives the 7-condition converter."""
    from speechsplit_tpu.convert import (
        convert,
        prepare_utterance,
        with_learned_embedding,
    )

    cfg = LEARNED
    model = SpeechSplit(cfg)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    utt = prepare_utterance(
        cfg,
        rng.rand(50, cfg.dim_freq).astype(np.float32),
        np.linspace(0.1, 0.9, 50),
        np.eye(1, cfg.dim_spk_emb, 1, dtype=np.float32),
        name="s", uid="0",
    )
    out = with_learned_embedding(cfg, model, state.params, utt)
    assert out.spk_emb.shape == (1, cfg.dim_spk_emb)
    ref = model.apply(
        {"params": state.params}, utt.mel, method="embed_speaker"
    )
    np.testing.assert_allclose(
        np.asarray(out.spk_emb), np.asarray(ref), atol=1e-6
    )
    # unit-norm (SpeakerEncoder contract), unlike the stored one-hot
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.spk_emb)), 1.0, atol=1e-5
    )

    # onehot configs: strict no-op
    same = with_learned_embedding(SMALL, model, state.params, utt)
    assert same is utt

    # the embedded utterance converts (one condition, eval forward)
    from speechsplit_tpu.models.generator import F0Converter

    _, p_state = create_train_state(
        cfg, jax.random.PRNGKey(1), model="f0_converter"
    )
    results = convert(
        model, state.params, F0Converter(cfg), p_state.params,
        out, out, conditions=("U",),
    )
    (name, mel), = results.items() if isinstance(results, dict) else [
        (n, m) for n, m in results
    ]
    assert np.isfinite(np.asarray(mel)).all()

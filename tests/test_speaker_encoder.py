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


def test_supcon_loss_math():
    """speaker_contrastive_loss against a hand-computed numpy value,
    plus the no-positive guard (all-distinct labels -> 0, not NaN)."""
    from speechsplit_tpu.training.train_step import (
        speaker_contrastive_loss,
    )

    rng = np.random.RandomState(0)
    emb = rng.randn(4, 8).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = np.asarray([0, 0, 1, 1], np.int32)
    temp = 0.2

    sim = emb @ emb.T / temp
    want = 0.0
    for i in range(4):
        others = [j for j in range(4) if j != i]
        logz = np.log(np.sum(np.exp(sim[i, others])))
        pos = [j for j in others if labels[j] == labels[i]]
        want += -np.mean([sim[i, j] - logz for j in pos])
    want /= 4

    got = float(
        speaker_contrastive_loss(
            jnp.asarray(emb), jnp.asarray(labels), temp
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # no in-batch positives: zero, finite
    distinct = jnp.asarray([0, 1, 2, 3], jnp.int32)
    assert float(
        speaker_contrastive_loss(jnp.asarray(emb), distinct, temp)
    ) == 0.0

    # same-speaker pairs pulled together score lower than pushed apart
    tight = np.stack([emb[0], emb[0], emb[2], emb[2]])
    loose = np.stack([emb[0], -emb[0], emb[2], -emb[2]])
    l_tight = float(
        speaker_contrastive_loss(jnp.asarray(tight), jnp.asarray(labels))
    )
    l_loose = float(
        speaker_contrastive_loss(jnp.asarray(loose), jnp.asarray(labels))
    )
    assert l_tight < l_loose


def test_contrast_weight_adds_exactly_the_supcon_term():
    """At the initial params the step loss with spk_contrast_weight=w
    must exceed the w=0 loss by exactly w * SupCon(embeddings, labels)
    — the aux term composes, it does not perturb the MSE path."""
    from speechsplit_tpu.training.train_step import (
        speaker_contrastive_loss,
    )

    w = 0.25
    contrast = LEARNED.replace(spk_contrast_weight=w)
    module, state = create_train_state(LEARNED, jax.random.PRNGKey(0))
    module_c, state_c = create_train_state(contrast, jax.random.PRNGKey(0))
    # identical initial params (same key, same tree)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state_c.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # batch with same-speaker positives (2 speakers x 2 utterances)
    batch = _batch(LEARNED, 1)
    emb_rows = np.zeros((4, LEARNED.dim_spk_emb), np.float32)
    emb_rows[[0, 1], 3] = 1.0
    emb_rows[[2, 3], 5] = 1.0
    batch = Batch(
        mel=batch.mel, spk_emb=jnp.asarray(emb_rows),
        f0=batch.f0, len_org=batch.len_org,
    )
    key = jax.random.PRNGKey(2)

    # the jitted steps DONATE their input state: score the embeddings
    # first, then run the steps
    emb = module.apply(
        {"params": state.params}, batch.mel, method="embed_speaker"
    )
    aux = float(
        speaker_contrastive_loss(
            emb, jnp.argmax(batch.spk_emb, -1), contrast.spk_contrast_temp
        )
    )

    _, loss0 = make_train_step(LEARNED, module)(state, batch, key)
    _, loss_w = make_train_step(contrast, module_c)(state_c, batch, key)
    np.testing.assert_allclose(
        float(loss_w) - float(loss0), w * aux, rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_contrast_shard_map_trajectory_equals_single_device():
    """With the contrastive term ON, the shard_map step must still
    follow the single-device trajectory: the aux loss all-gathers
    embeddings+labels so every shard scores the GLOBAL batch, and the
    replicated term's psum-scatter cotangent (x n) cancels the gradient
    pmean (/ n) exactly (train_step._speaker_conditioning)."""
    from speechsplit_tpu.parallel import batch_sharding, make_mesh
    from speechsplit_tpu.training.train_step import (
        make_train_step_shard_map,
    )

    assert len(jax.devices()) == 8
    cfg = LEARNED.replace(
        spk_contrast_weight=0.5, batch_size=16, learning_rate=1e-3
    )
    mesh = make_mesh()
    module, state_sm = create_train_state(cfg, jax.random.PRNGKey(0))
    _, state_one = create_train_state(cfg, jax.random.PRNGKey(0))
    sm_step = make_train_step_shard_map(cfg, module, mesh)
    one_step = make_train_step(cfg, module, None)

    rng = np.random.RandomState(1)
    b, t = 16, cfg.max_len_pad
    emb_rows = np.zeros((b, cfg.dim_spk_emb), np.float32)
    emb_rows[np.arange(b), np.arange(b) % 4] = 1.0  # 4 speakers x 4
    batch = Batch(
        mel=rng.rand(b, t, 80).astype(np.float32),
        spk_emb=emb_rows,
        f0=rng.rand(b, t, 1).astype(np.float32),
        len_org=rng.randint(64, 129, b).astype(np.int32),
    )
    batch_sm = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch
    )
    key = jax.random.PRNGKey(7)

    losses_sm, losses_one = [], []
    for _ in range(3):
        state_sm, loss_sm = sm_step(state_sm, batch_sm, key)
        state_one, loss_one = one_step(state_one, batch, key)
        losses_sm.append(float(loss_sm))
        losses_one.append(float(loss_one))
    np.testing.assert_allclose(losses_sm, losses_one, atol=1e-5, rtol=0)
    for a, b_ in zip(
        jax.tree.leaves(state_sm.params), jax.tree.leaves(state_one.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=0
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

"""Batched conversion must reproduce the per-utterance driver exactly."""

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.convert import convert, convert_batched, prepare_utterance
from speechsplit_tpu.training.train_step import create_train_state

CFG = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)


def _utt(rng, name, uid, length):
    mel = rng.rand(length, 80).astype(np.float32)
    f0 = rng.rand(length).astype(np.float32)
    emb = np.zeros(82, np.float32)
    emb[rng.randint(0, 82)] = 1.0
    return prepare_utterance(CFG, mel, f0, emb, name=name, uid=uid)


@pytest.mark.slow
def test_batched_matches_sequential(rng):
    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    pairs = [
        (_utt(rng, "a", "u0", 150), _utt(rng, "b", "v0", 120)),
        (_utt(rng, "c", "u1", 100), _utt(rng, "d", "v1", 180)),
    ]
    batched = convert_batched(
        g_module, g_state.params, p_module, p_state.params, pairs
    )
    for pi, (src, trg) in enumerate(pairs):
        sequential = convert(
            g_module, g_state.params, p_module, p_state.params, src, trg
        )
        assert len(batched[pi]) == len(sequential) == 7
        for (bn, bm), (sn, sm) in zip(batched[pi], sequential):
            assert bn == sn
            np.testing.assert_allclose(bm, sm, atol=1e-5), bn


@pytest.mark.slow
def test_compress_fetch_matches_within_bf16(rng):
    """compress_fetch=True returns the same mels to bf16 rounding."""
    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    pairs = [(_utt(rng, "a", "u0", 100), _utt(rng, "b", "u1", 120))]
    exact = convert_batched(
        g_module, g_state.params, p_module, p_state.params, pairs
    )[0]
    packed = convert_batched(
        g_module, g_state.params, p_module, p_state.params, pairs,
        compress_fetch=True,
    )[0]
    assert [n for n, _ in exact] == [n for n, _ in packed]
    for (_, a), (_, b) in zip(exact, packed):
        assert a.shape == b.shape
        assert b.dtype == np.float32
        np.testing.assert_allclose(a, b, atol=4e-3)


@pytest.mark.slow
def test_stream_matches_batched(rng):
    """convert_stream must yield exactly convert_batched's results for
    every incoming batch, in order, regardless of pipeline depth."""
    from speechsplit_tpu.convert import convert_stream

    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    batches = [
        [(_utt(rng, f"a{k}", "u0", 150), _utt(rng, f"b{k}", "v0", 120))]
        for k in range(3)
    ]
    streamed = list(
        convert_stream(
            g_module, g_state.params, p_module, p_state.params,
            iter(batches), depth=2,
        )
    )
    assert len(streamed) == len(batches)
    for pairs, got in zip(batches, streamed):
        want = convert_batched(
            g_module, g_state.params, p_module, p_state.params, pairs
        )
        for wp, gp in zip(want, got):
            for (wn, wm), (gn, gm) in zip(wp, gp):
                assert wn == gn
                np.testing.assert_array_equal(wm, gm)


@pytest.mark.slow
def test_stream_auto_mode_yields_correct_results(rng):
    """compress_fetch="auto" must self-tune without changing WHAT is
    yielded: the mode is decided once on the first batch (link probe +
    fenced compute timing, convert_stream docstring) and every batch's
    results equal convert_batched's (within the ~0.004 rounding the
    static bf16 test allows, in case bf16 is chosen)."""
    from speechsplit_tpu import convert as convert_mod
    from speechsplit_tpu.convert import convert_stream

    g_module, g_state = create_train_state(CFG, jax.random.PRNGKey(0))
    p_module, p_state = create_train_state(
        CFG, jax.random.PRNGKey(1), "f0_converter"
    )
    batches = [
        [(_utt(rng, f"a{k}", "u0", 150), _utt(rng, f"b{k}", "v0", 120))]
        for k in range(12)
    ]
    streamed = list(
        convert_stream(
            g_module, g_state.params, p_module, p_state.params,
            iter(batches), compress_fetch="auto", depth=2,
        )
    )
    assert len(streamed) == len(batches)
    for pairs, got in zip(batches, streamed):
        want = convert_batched(
            g_module, g_state.params, p_module, p_state.params, pairs
        )
        for wp, gp in zip(want, got):
            for (wn, wm), (gn, gm) in zip(wp, gp):
                assert wn == gn
                assert gm.dtype == np.float32
                np.testing.assert_allclose(wm, gm, atol=4e-3)


def test_auto_key_tracks_fetch_length():
    """The auto-decision cache key must vary with the TRIMMED fetch
    length (cut_max), not the padded mel shape — streams with the same
    batch geometry but very different clip lengths fetch very different
    byte counts and must not share one bf16/f32 verdict (ADVICE r4)."""
    from types import SimpleNamespace

    from speechsplit_tpu.convert import CONDITIONS, _auto_key

    def pair(ls, lt):
        return (
            SimpleNamespace(length=ls),
            SimpleNamespace(length=lt),
        )

    short = [pair(64, 80)]
    long = [pair(190, 192)]
    assert _auto_key(short, CONDITIONS) != _auto_key(long, CONDITIONS)
    # and it is the R-aware cut_max: with an R condition present the
    # target length counts even when the source is shorter
    assert _auto_key([pair(64, 192)], CONDITIONS)[2] == 192
    assert _auto_key([pair(64, 192)], ["F"])[2] == 64


def test_probe_force_clears_auto_decisions():
    """probe_link(force=True) must invalidate convert's cached auto
    verdicts — they were derived from the stale link profile."""
    from speechsplit_tpu import convert as convert_mod
    from speechsplit_tpu import linkprobe

    convert_mod._AUTO_DECISIONS[(1, 7, 128)] = True
    linkprobe.probe_link(force=True)
    assert convert_mod._AUTO_DECISIONS == {}


def test_choose_compress_policy():
    """The probe-based policy: bf16 only when it actually beats the f32
    fetch AND the stream isn't compute-bound AND the fetch is slow
    enough to matter."""
    from speechsplit_tpu.linkprobe import LinkProfile, choose_compress

    tunnel = LinkProfile(f32_mbps=29.0, bf16_mbps=21.0, rtt_ms=10.0)
    fast = LinkProfile(f32_mbps=4000.0, bf16_mbps=3000.0, rtt_ms=0.1)
    slow_bf16 = LinkProfile(f32_mbps=29.0, bf16_mbps=14.0, rtt_ms=10.0)
    grid = 7 * 192 * 80 * 4  # one pair, 7 conditions, f32 bytes

    # tunnel-class link, fetch-bound request: compress
    assert choose_compress(grid, profile=tunnel) is True
    # same link but the device is the bottleneck: don't
    assert choose_compress(grid, compute_s=1.0, profile=tunnel) is False
    # fast local link: never compress (fetch ~0.1 ms, below threshold)
    assert choose_compress(grid, profile=fast) is False
    # bf16 rate degraded to where halving bytes buys nothing: don't
    assert choose_compress(grid, profile=slow_bf16) is False

"""Wav->wav VoiceConverter pipeline + Solver validation/render smoke."""

import os
import pickle

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.pipeline import VoiceConverter
from speechsplit_tpu.training.checkpoint import save_checkpoint
from speechsplit_tpu.training.train_step import create_train_state

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)
FS = 16000


def _tone(f0, n, seed=0):
    t = np.arange(n) / FS
    r = np.random.RandomState(seed)
    sig = sum(np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, 4))
    sig = sig + 0.01 * r.randn(n)
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


@pytest.mark.slow
def test_voice_converter_wav_to_wav(tmp_path):
    from scipy.io import wavfile

    wavfile.write(
        tmp_path / "src.wav", FS, (_tone(120, FS) * 32767).astype(np.int16)
    )
    wavfile.write(
        tmp_path / "trg.wav", FS,
        (_tone(210, FS, 1) * 32767).astype(np.int16),
    )

    _, g_state = create_train_state(SMALL, jax.random.PRNGKey(0))
    _, p_state = create_train_state(
        SMALL, jax.random.PRNGKey(1), "f0_converter"
    )
    save_checkpoint(str(tmp_path / "m"), 1, g_state, "G")
    save_checkpoint(str(tmp_path / "m"), 1, p_state, "P")

    vc = VoiceConverter.from_checkpoints(
        str(tmp_path / "m" / "1-G"), str(tmp_path / "m" / "1-P"),
        config=SMALL,
    )
    out = vc.convert_wav_files(
        str(tmp_path / "src.wav"), str(tmp_path / "trg.wav"),
        conditions=("R", "U"), synthesize=True,
    )
    assert set(out) == {"R", "U"}
    for entry in out.values():
        assert entry["mel"].shape[1] == 80
        assert np.isfinite(entry["mel"]).all()
        assert entry["wav"].ndim == 1 and np.isfinite(entry["wav"]).all()

    # pcm16 wiring (the cli/serve path): int16 wavs, same lengths,
    # device quantization within 1 LSB of the float path's host
    # quantization (vocoder._peak_norm_pcm16 rounds; astype truncates)
    out16 = vc.convert_wav_files(
        str(tmp_path / "src.wav"), str(tmp_path / "trg.wav"),
        conditions=("R", "U"), synthesize=True, pcm16=True,
    )
    for condition, entry in out16.items():
        # determinism contract: identical calls give identical
        # conversions (the dither key is fixed, not split per call —
        # the reference preprocessing is deterministic too,
        # make_spect_f0.py:47)
        np.testing.assert_array_equal(
            entry["mel"], out[condition]["mel"]
        )
        w16, wf = entry["wav"], out[condition]["wav"]
        assert w16.dtype == np.int16 and len(w16) == len(wf)
        host = (wf * 32767).astype(np.int16)
        assert (
            np.abs(w16.astype(np.int32) - host.astype(np.int32)).max()
            <= 1
        )


@pytest.mark.slow
def test_solver_validation_and_render(tmp_path):
    """Solver validation + 5-panel ablation render on a demo-style file
    (ref: solver.py:206-269)."""
    from speechsplit_tpu.data.collator import Batch
    from speechsplit_tpu.training.solver import Solver, SolverConfig

    # demo-style validation bundle
    rng = np.random.RandomState(0)
    demo = []
    for spk, ix in [("a", 1), ("b", 7)]:
        mel = rng.rand(100, 80).astype(np.float32)
        f0 = rng.rand(100).astype(np.float32)
        emb = np.zeros((1, 82), np.float32)
        emb[0, ix] = 1.0
        demo.append([spk, emb, (mel, f0, 100, "u0")])
    val_path = tmp_path / "demo.pkl"
    with open(val_path, "wb") as fh:
        pickle.dump(demo, fh)

    def loader():
        while True:
            lens = rng.randint(64, 129, 4).astype(np.int32)
            yield Batch(
                mel=rng.rand(4, 192, 80).astype(np.float32),
                spk_emb=np.eye(4, 82, dtype=np.float32),
                f0=rng.rand(4, 192, 1).astype(np.float32),
                len_org=lens,
            )

    rc = SolverConfig(
        num_iters=2, log_step=1, sample_step=2, model_save_step=2,
        model_save_dir=str(tmp_path / "models"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        validation_path=str(val_path),
    )
    solver = Solver(loader(), rc, SMALL)
    solver.train()

    val = solver.validate()
    assert np.isfinite(val)
    pngs = [f for f in os.listdir(tmp_path / "samples") if f.endswith(".png")]
    assert len(pngs) == 2  # one render per validation speaker


def test_voice_converter_long_form_windowing(tmp_path):
    """Wavs past the 192-frame geometry trigger the convert_long path."""
    from scipy.io import wavfile

    n = 4 * FS  # ~250 frames > 192
    wavfile.write(
        tmp_path / "s.wav", FS, (_tone(130, n) * 32767).astype(np.int16)
    )
    wavfile.write(
        tmp_path / "t.wav", FS,
        (_tone(220, n, 1) * 32767).astype(np.int16),
    )
    _, g_state = create_train_state(SMALL, jax.random.PRNGKey(0))
    _, p_state = create_train_state(
        SMALL, jax.random.PRNGKey(1), "f0_converter"
    )
    from speechsplit_tpu.pipeline import VoiceConverter

    vc = VoiceConverter(SMALL, g_state.params, p_state.params)
    out = vc.convert_wav_files(
        str(tmp_path / "s.wav"), str(tmp_path / "t.wav"),
        conditions=("U",), synthesize=False,
    )
    mel = out["U"]["mel"]
    assert mel.shape == (n // 256 + 1, 80)  # full length, not truncated
    assert np.isfinite(mel).all()
    assert (np.abs(mel).sum(axis=1) > 0).all()  # no window gaps

"""Data pipeline tests: preprocessing end-to-end, collation, sampling."""

import os
import pickle

import numpy as np
import pytest

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.collator import Collator
from speechsplit_tpu.data.dataset import SpeakerDataset
from speechsplit_tpu.data.loader import data_loader
from speechsplit_tpu.data.prepare import (
    build_metadata,
    extract_dir,
    read_wav,
    speaker_embedding,
)
from speechsplit_tpu.data.sampler import RepeatSampler

CFG = SpeechSplitConfig()
FS = 16000


def _write_wav(path, wav):
    from scipy.io import wavfile

    wavfile.write(path, FS, (wav * 32767).astype(np.int16))


def _tone(f0, n, seed=0):
    t = np.arange(n) / FS
    r = np.random.RandomState(seed)
    sig = sum(
        np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, 4)
    ) + 0.01 * r.randn(n)
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


@pytest.fixture(scope="module")
def prepared_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    wav_dir = root / "wavs"
    mel_dir = root / "spmel"
    f0_dir = root / "raptf0"
    spk2gen = {"p001": "M", "p002": "F"}
    for spk, f0 in [("p001", 110.0), ("p002", 210.0)]:
        os.makedirs(wav_dir / spk)
        for i in range(3):
            n = 2 * FS + i * 2048
            _write_wav(
                wav_dir / spk / f"utt{i}.wav", _tone(f0, n, seed=i)
            )
    extract_dir(
        str(wav_dir), str(mel_dir), str(f0_dir), spk2gen, batch_size=4
    )
    build_metadata(str(mel_dir), dim_spk_emb=CFG.dim_spk_emb)
    return str(mel_dir), str(f0_dir)


def test_extract_dir_feature_geometry(prepared_dataset):
    mel_dir, f0_dir = prepared_dataset
    mel = np.load(os.path.join(mel_dir, "p001", "utt0.npy"))
    f0 = np.load(os.path.join(f0_dir, "p001", "utt0.npy"))
    assert mel.shape == (2 * FS // 256 + 1, 80)
    assert f0.shape == (2 * FS // 256 + 1,)
    assert mel.dtype == np.float32 and f0.dtype == np.float32
    # mel normalized roughly into [0, 1]; voiced f0 in [0, 1]
    assert -0.5 < mel.min() and mel.max() < 1.5
    voiced = f0 > -1e9
    assert voiced.mean() > 0.5
    assert (f0[voiced] >= 0).all() and (f0[voiced] <= 1).all()


def test_metadata_structure(prepared_dataset):
    mel_dir, _ = prepared_dataset
    with open(os.path.join(mel_dir, "train.pkl"), "rb") as fh:
        meta = pickle.load(fh)
    assert len(meta) == 2
    speaker, emb = meta[0][0], meta[0][1]
    assert speaker == "p001"
    assert emb.shape == (82,) and emb.sum() == 1.0
    assert len(meta[0]) == 2 + 3  # 3 utterances


def test_reference_compat_embedding():
    emb = speaker_embedding("p226", 0, reference_compat=True)
    assert emb[1] == 1.0
    emb2 = speaker_embedding("p999", 5, reference_compat=True)
    assert emb2[7] == 1.0


def test_dataset_and_loader(prepared_dataset):
    mel_dir, f0_dir = prepared_dataset
    ds = SpeakerDataset(mel_dir, f0_dir)
    assert len(ds) == 2
    cfg = CFG.replace(batch_size=4)
    it = data_loader(ds, cfg, seed=0)
    batch = next(it)
    assert batch.mel.shape == (4, 192, 80)
    assert batch.spk_emb.shape == (4, 82)
    assert batch.f0.shape == (4, 192, 1)
    assert batch.len_org.shape == (4,)
    assert (batch.len_org >= cfg.min_len_seq).all()
    assert (batch.len_org <= cfg.max_len_seq).all()
    # mel clipped to [0,1]; f0 padding sentinel present
    assert batch.mel.min() >= 0 and batch.mel.max() <= 1
    for i in range(4):
        assert (batch.f0[i, batch.len_org[i] :, 0] == -1e10).all()
        assert (batch.mel[i, batch.len_org[i] :, :] == 0).all()


def test_collator_short_utterance_no_crash():
    """Reference crashes on utterances shorter than the crop window
    (data_loader.py:107); we cap the crop instead."""
    cfg = CFG
    collator = Collator(cfg)
    rng = np.random.default_rng(0)
    mel = np.random.rand(10, 80).astype(np.float32)
    f0 = np.random.rand(10).astype(np.float32)
    emb = np.zeros(82, np.float32)
    batch = collator([(mel, emb, f0)], rng)
    assert batch.len_org[0] == 10
    assert batch.mel.shape == (1, 192, 80)


def test_repeat_sampler_epoch():
    sampler = RepeatSampler(5, 8, shuffle=True)
    assert len(sampler) == 40
    rng = np.random.default_rng(0)
    epoch = sampler.epoch(rng)
    assert len(epoch) == 40
    counts = np.bincount(epoch, minlength=5)
    assert (counts == 8).all()


def test_read_wav_roundtrip(tmp_path):
    wav = _tone(150.0, FS)
    _write_wav(tmp_path / "x.wav", wav)
    back = read_wav(str(tmp_path / "x.wav"))
    assert np.abs(back - wav).max() < 1e-3


def test_lazy_dataset(prepared_dataset):
    """eager=False keeps lazy file handles; batches are identical to
    eager, and NO file descriptors are held between accesses (the old
    always-open-memmap form capped corpus size at the process fd
    limit — ~500 utterances under a 1024 ulimit; found at the 10k
    scale rehearsal)."""
    import os

    from speechsplit_tpu.data.dataset import LazyArray

    mel_dir, f0_dir = prepared_dataset
    lazy = SpeakerDataset(mel_dir, f0_dir, eager=False)
    eager = SpeakerDataset(mel_dir, f0_dir, eager=True)
    assert isinstance(lazy.entries[0][2][0][0], LazyArray)

    fd_dir = "/proc/self/fd"
    if os.path.isdir(fd_dir):  # linux: holding the dataset keeps 0 fds
        before = len(os.listdir(fd_dir))
        cfg0 = CFG.replace(batch_size=4)
        _ = next(data_loader(lazy, cfg0, seed=1))
        assert len(os.listdir(fd_dir)) <= before + 1

    cfg = CFG.replace(batch_size=4)
    b_lazy = next(data_loader(lazy, cfg, seed=3))
    b_eager = next(data_loader(eager, cfg, seed=3))
    np.testing.assert_array_equal(b_lazy.mel, b_eager.mel)
    np.testing.assert_array_equal(b_lazy.f0, b_eager.f0)
    np.testing.assert_array_equal(b_lazy.len_org, b_eager.len_org)

    # lazy handles materialize like arrays (resident-upload path)
    mel0, f00 = lazy.entries[0][2][0]
    e_mel0, e_f00 = eager.entries[0][2][0]
    assert len(mel0) == len(e_mel0)
    np.testing.assert_array_equal(np.asarray(mel0), e_mel0)
    np.testing.assert_array_equal(mel0[2:5], e_mel0[2:5])
    np.testing.assert_array_equal(np.asarray(f00), e_f00)


def test_read_wav_scales_stereo_and_int(tmp_path):
    """Integer PCM must be scaled to [-1, 1] BEFORE channel averaging
    (the mean promotes to float64 and used to skip the dtype-based
    scaling, letting +-32768-scale amplitudes through), on both the
    float and the PCM-preserving reader."""
    from scipy.io import wavfile

    from speechsplit_tpu.data.prepare import read_wav_pcm

    mono = (_tone(150.0, FS) * 32767).astype(np.int16)
    stereo = np.stack([mono, mono], axis=1)
    wavfile.write(tmp_path / "st.wav", FS, stereo)
    for reader in (read_wav, read_wav_pcm):
        back = reader(str(tmp_path / "st.wav"))
        assert back.dtype == np.float32
        assert np.abs(back).max() <= 1.0
        assert np.abs(back).max() > 0.4  # scaled, not silenced

    # mono int16 stays raw PCM on the pcm reader, scaled on read_wav
    wavfile.write(tmp_path / "mo.wav", FS, mono)
    assert read_wav_pcm(str(tmp_path / "mo.wav")).dtype == np.int16
    assert np.abs(read_wav(str(tmp_path / "mo.wav"))).max() <= 1.0


def test_prepare_val_inputs_learned_mode():
    """spk_emb_mode='learned': validation must condition on the
    utterance mel (rank 3, embedded by the generator's learned-mode
    dispatch), never the stored one-hot the model never trained on."""
    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.training.solver import Solver

    entry = [
        "p226",
        np.eye(1, 82, 1, dtype=np.float32)[0],
        (np.random.RandomState(0).rand(40, 80).astype(np.float32),
         np.linspace(0, 1, 40), 40, "uid"),
    ]
    for mode in ("onehot", "learned"):
        solver = Solver.__new__(Solver)  # config-only unit probe
        solver.config = SpeechSplitConfig(spk_emb_mode=mode)
        x_f0, x_pad, emb = solver._prepare_val_inputs(entry)
        if mode == "onehot":
            # flat (82,) and reference-style (1, 82) bundles both
            # normalize to the [1, 82] the generator expects
            assert np.asarray(emb).shape == (1, 82)
            np.testing.assert_array_equal(emb[0], entry[1])
        else:
            assert np.asarray(emb).ndim == 3
            np.testing.assert_array_equal(emb, x_pad)

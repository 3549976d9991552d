"""Device-resident data path: HBM features + on-device collation.

The load-bearing property: for the same seed, the resident path's
on-device gather+mask produces bit-identical batches to the host
loader+collator, and the fused plan-driven train step follows the same
trajectory as the batch-driven one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.data.dataset import SpeakerDataset
from speechsplit_tpu.data.loader import data_loader
from speechsplit_tpu.data.resident import (
    build_resident,
    collate_on_device,
    make_resident_train_step,
    plan_batches,
    stack_plans,
)
from speechsplit_tpu.training.train_step import (
    create_train_state,
    make_train_step,
)

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
    batch_size=4,
)


def _corpus(tmp_path, n_speakers=3, n_utts=2):
    """On-disk features + metadata in the expected layout."""
    import os
    import pickle

    rng = np.random.RandomState(7)
    mel_dir = tmp_path / "spmel"
    f0_dir = tmp_path / "raptf0"
    meta = []
    for s in range(n_speakers):
        spk = f"p{s:03d}"
        os.makedirs(mel_dir / spk)
        os.makedirs(f0_dir / spk)
        emb = np.zeros(82, np.float32)
        emb[s] = 1.0
        entry = [spk, emb]
        for u in range(n_utts):
            t = rng.randint(80, 300)
            np.save(mel_dir / spk / f"u{u}.npy", rng.rand(t, 80) * 1.2 - 0.1)
            np.save(f0_dir / spk / f"u{u}.npy", rng.rand(t))
            entry.append(f"{spk}/u{u}.npy")
        meta.append(entry)
    with open(mel_dir / "train.pkl", "wb") as fh:
        pickle.dump(meta, fh)
    return SpeakerDataset(str(mel_dir), str(f0_dir))


def test_resident_batches_match_host_loader(tmp_path):
    dataset = _corpus(tmp_path)
    cfg = SMALL
    host = data_loader(dataset, cfg, seed=3)
    features, speaker_utts = build_resident(dataset, cfg)
    plans = plan_batches(
        speaker_utts, np.asarray(features.length), cfg, seed=3
    )
    collate = jax.jit(
        lambda p: collate_on_device(cfg, features, p)
    )
    for _ in range(6):
        host_b = next(host)
        dev_b = collate(next(plans))
        np.testing.assert_array_equal(
            np.asarray(dev_b.mel), host_b.mel
        )
        np.testing.assert_array_equal(np.asarray(dev_b.f0), host_b.f0)
        np.testing.assert_array_equal(
            np.asarray(dev_b.spk_emb), host_b.spk_emb
        )
        np.testing.assert_array_equal(
            np.asarray(dev_b.len_org), host_b.len_org
        )


def test_resident_bf16_storage_close(tmp_path):
    dataset = _corpus(tmp_path)
    cfg = SMALL
    f32, utts = build_resident(dataset, cfg)
    bf16, _ = build_resident(dataset, cfg, store_dtype=jnp.bfloat16)
    plans = plan_batches(utts, np.asarray(f32.length), cfg, seed=0)
    p = next(plans)
    a = collate_on_device(cfg, f32, p)
    b = collate_on_device(cfg, bf16, p)
    assert np.abs(np.asarray(a.mel) - np.asarray(b.mel)).max() < 4e-3
    # unvoiced sentinel must survive bf16 (quantize tests x <= 0)
    assert (np.asarray(b.f0).min() < -1e9)


@pytest.mark.slow
def test_solver_data_on_device(tmp_path):
    """Solver end-to-end with the resident path: loss logged finite,
    checkpoint written."""
    import os

    from speechsplit_tpu.training.solver import Solver, SolverConfig

    dataset = _corpus(tmp_path)
    rc = SolverConfig(
        num_iters=4, log_step=2, model_save_step=4, sample_step=4,
        data_on_device=True, steps_per_dispatch=2,
        log_dir=str(tmp_path / "l"), model_save_dir=str(tmp_path / "m"),
        sample_dir=str(tmp_path / "s"),
        validation_path=str(tmp_path / "none.pkl"),
    )
    solver = Solver(None, rc, SMALL, dataset=dataset)
    state = solver.train()
    assert int(state.step) == 4
    assert os.path.isdir(tmp_path / "m" / "4-G")


def test_solver_data_on_device_requires_dataset(tmp_path):
    from speechsplit_tpu.training.solver import Solver, SolverConfig

    rc = SolverConfig(data_on_device=True)
    with pytest.raises(ValueError, match="dataset"):
        Solver(None, rc, SMALL)


@pytest.mark.slow
def test_resident_step_on_8_device_mesh(tmp_path):
    """Resident plans shard over the data mesh; features replicate."""
    from speechsplit_tpu.parallel import make_mesh

    dataset = _corpus(tmp_path, n_speakers=4)
    cfg = SMALL.replace(batch_size=8)
    mesh = make_mesh((8,))
    module, state = create_train_state(cfg, jax.random.PRNGKey(0))
    features, utts = build_resident(dataset, cfg)
    step = make_resident_train_step(cfg, module, features, mesh)
    plans = stack_plans(
        plan_batches(utts, np.asarray(features.length), cfg, seed=1), 2
    )
    state, losses = step(state, next(plans), jax.random.PRNGKey(2))
    assert losses.shape == (2,)
    assert np.isfinite(np.asarray(losses)).all()

    # 1-D plans are rejected under a mesh (jit sharding rank check)
    flat = plan_batches(utts, np.asarray(features.length), cfg, seed=1)
    with pytest.raises(ValueError, match="rank at least"):
        step(state, next(flat), jax.random.PRNGKey(3))


@pytest.mark.slow
def test_resident_step_matches_batch_step(tmp_path):
    dataset = _corpus(tmp_path)
    cfg = SMALL
    module, s1 = create_train_state(cfg, jax.random.PRNGKey(0))
    _, s2 = create_train_state(cfg, jax.random.PRNGKey(0))
    batch_step = make_train_step(cfg, module)
    features, utts = build_resident(dataset, cfg)
    res_step = make_resident_train_step(cfg, module, features)

    host = data_loader(dataset, cfg, seed=5)
    plans = plan_batches(utts, np.asarray(features.length), cfg, seed=5)
    key = jax.random.PRNGKey(9)
    for _ in range(2):
        s1, l1 = batch_step(s1, next(host), key)
        s2, l2 = res_step(s2, next(plans), key)
        np.testing.assert_allclose(
            float(l1), float(l2), rtol=1e-6, atol=1e-8
        )
    # multi-step plan dispatch continues the same trajectory
    s2, losses = res_step(
        s2, next(stack_plans(plans, 2)), key
    )
    s1, l3 = batch_step(s1, next(host), key)
    s1, l4 = batch_step(s1, next(host), key)
    np.testing.assert_allclose(
        np.asarray(losses),
        np.asarray([float(l3), float(l4)]),
        rtol=1e-6, atol=1e-8,
    )


@pytest.mark.slow
def test_build_resident_from_wavs_matches_disk_path(tmp_path):
    """Device-direct preprocessing (features scattered into the HBM
    store, never fetched) is BIT-identical to the archival flow
    extract_dir(compress_fetch=True) -> .npy -> build_resident for the
    same seed and a bfloat16 store — batching, dither keys, frame
    masking and padding all line up."""
    import os
    import pickle

    from speechsplit_tpu.data.prepare import build_metadata, extract_dir
    from speechsplit_tpu.data.resident import build_resident_from_wavs
    from speechsplit_tpu.data.synthetic import make_corpus

    wav_dir = tmp_path / "wavs"
    make_corpus(str(wav_dir), 5, n_speakers=2, duration_s=0.6)
    speakers = sorted(os.listdir(wav_dir))
    spk2gen = {
        s: ("M" if i % 2 == 0 else "F") for i, s in enumerate(speakers)
    }
    mel_dir, f0_dir = tmp_path / "spmel", tmp_path / "raptf0"
    # batch_size=2 over 5 utts: jobs [2, 2, 1] -> one full group and one
    # depth-padded leftover group (exercises the uid-drop scatter rows)
    extract_dir(
        str(wav_dir), str(mel_dir), str(f0_dir), spk2gen,
        batch_size=2, batches_per_dispatch=2, seed=5,
        compress_fetch=True,
    )
    build_metadata(str(mel_dir))
    with open(mel_dir / "train.pkl", "rb") as fh:
        meta = pickle.load(fh)
    dataset = SpeakerDataset(str(mel_dir), str(f0_dir), metadata=meta)
    cfg = SMALL
    disk, utts_disk = build_resident(
        dataset, cfg, store_dtype=jnp.bfloat16
    )
    direct, utts_direct = build_resident_from_wavs(
        str(wav_dir), spk2gen, cfg, store_dtype=jnp.bfloat16,
        batch_size=2, batches_per_dispatch=2, seed=5,
    )
    assert utts_disk == utts_direct
    np.testing.assert_array_equal(
        np.asarray(disk.length), np.asarray(direct.length)
    )
    np.testing.assert_array_equal(
        np.asarray(disk.spk_emb), np.asarray(direct.spk_emb)
    )
    np.testing.assert_array_equal(
        np.asarray(disk.mel, np.float32),
        np.asarray(direct.mel, np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(disk.f0, np.float32),
        np.asarray(direct.f0, np.float32),
    )

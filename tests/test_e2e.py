"""End-to-end pipeline test through the CLI surface:

wavs -> preprocess -> metadata -> train (both models, few steps) ->
checkpoint -> convert -> synthesized wav. This is the workflow the
reference README prescribes (README.md:53-57 + demo.ipynb), run at a
small model size for CPU-test speed.
"""

import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full loops / subprocess CLIs (~30-70 s)

SMALL_HPARAMS = (
    "dim_enc=64,dim_enc_2=32,dim_enc_3=64,"
    "dim_neck=4,dim_neck_2=1,dim_neck_3=8,"
    "dim_dec_mel=64,dim_dec_f0=32,batch_size=4,n_repeats=2"
)

FS = 16000


def _tone(f0, n, seed=0):
    t = np.arange(n) / FS
    r = np.random.RandomState(seed)
    sig = sum(
        np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, 4)
    ) + 0.01 * r.randn(n)
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("e2e")
    wav_dir = root / "wavs"
    for spk, f0, gender in [("p226", 110.0, "M"), ("p231", 200.0, "F")]:
        os.makedirs(wav_dir / spk)
        for i in range(2):
            wav = _tone(f0, 2 * FS + i * 1024, seed=i)
            wavfile.write(
                wav_dir / spk / f"utt{i}.wav",
                FS,
                (wav * 32767).astype(np.int16),
            )
    with open(root / "spk2gen.pkl", "wb") as fh:
        pickle.dump({"p226": "M", "p231": "F"}, fh)
    return root


def test_full_cli_pipeline(workspace):
    from speechsplit_tpu.cli import convert as cli_convert
    from speechsplit_tpu.cli import metadata as cli_metadata
    from speechsplit_tpu.cli import preprocess as cli_preprocess
    from speechsplit_tpu.cli import train as cli_train

    root = workspace
    mel_dir = str(root / "spmel")
    f0_dir = str(root / "raptf0")

    # 1. preprocess
    cli_preprocess.main([
        "--wav_dir", str(root / "wavs"),
        "--mel_dir", mel_dir,
        "--f0_dir", f0_dir,
        "--spk2gen", str(root / "spk2gen.pkl"),
    ])
    assert os.path.exists(os.path.join(mel_dir, "p226", "utt0.npy"))

    # 2. metadata
    cli_metadata.main(["--mel_dir", mel_dir])
    assert os.path.exists(os.path.join(mel_dir, "train.pkl"))

    # 3. train generator a few steps (no validation file -> no sampling)
    run = root / "run"
    common = [
        "--num_iters", "4",
        "--log_step", "2",
        "--model_save_step", "4",
        "--sample_step", "100",
        "--model_save_dir", str(run / "models"),
        "--sample_dir", str(run / "samples"),
        "--log_dir", str(run / "logs"),
        "--validation_path", str(root / "nonexistent.pkl"),
        "--hparams",
        SMALL_HPARAMS + f",root_dir={mel_dir},feat_dir={f0_dir}",
        "--num_devices", "1",
    ]
    cli_train.main(common)
    assert os.path.isdir(run / "models" / "4-G")

    # 4. train the F0 converter a few steps
    cli_train.main(common + ["--model", "f0_converter"])
    assert os.path.isdir(run / "models" / "4-P")

    # 5. build a demo-style bundle from the extracted features and convert
    demo = []
    for spk, emb_ix in [("p226", 1), ("p231", 7)]:
        mel = np.load(os.path.join(mel_dir, spk, "utt0.npy"))
        f0 = np.load(os.path.join(f0_dir, spk, "utt0.npy"))
        # keep within max_len_pad
        mel, f0 = mel[:180], f0[:180]
        emb = np.zeros((82,), np.float32)
        emb[emb_ix] = 1.0
        demo.append([spk, emb, (mel, f0, len(mel), "utt0")])
    demo_path = root / "demo.pkl"
    with open(demo_path, "wb") as fh:
        pickle.dump(demo, fh)

    out_dir = str(root / "results")
    cli_convert.main([
        "--generator_ckpt", str(run / "models" / "4-G"),
        "--f0_ckpt", str(run / "models" / "4-P"),
        "--metadata", str(demo_path),
        "--out_dir", out_dir,
        "--conditions", "R,RFU",
        "--synthesize",
        "--hparams", SMALL_HPARAMS,
    ])
    npys = [f for f in os.listdir(out_dir) if f.endswith(".npy")]
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(npys) == 2 and len(wavs) == 2
    mel_out = np.load(os.path.join(out_dir, npys[0]))
    assert mel_out.shape[1] == 80 and np.isfinite(mel_out).all()


def test_learned_mode_cli_pipeline(workspace, tmp_path):
    """Same CLI workflow with spk_emb_mode=learned: training conditions
    on SpeakerEncoder(mel), and conversion derives zero-shot timbre
    targets from the utterances' own mels (the metadata one-hots are
    ignored by design — with_learned_embedding)."""
    from speechsplit_tpu.cli import convert as cli_convert
    from speechsplit_tpu.cli import metadata as cli_metadata
    from speechsplit_tpu.cli import preprocess as cli_preprocess
    from speechsplit_tpu.cli import train as cli_train

    root = workspace  # wavs + spk2gen from the module fixture
    mel_dir = str(tmp_path / "spmel")
    f0_dir = str(tmp_path / "raptf0")
    hparams = SMALL_HPARAMS + ",spk_emb_mode=learned,dim_spk_enc=32"

    cli_preprocess.main([
        "--wav_dir", str(root / "wavs"),
        "--mel_dir", mel_dir,
        "--f0_dir", f0_dir,
        "--spk2gen", str(root / "spk2gen.pkl"),
    ])
    cli_metadata.main(["--mel_dir", mel_dir])

    run = tmp_path / "run"
    common = [
        "--num_iters", "2",
        "--log_step", "2",
        "--model_save_step", "2",
        "--sample_step", "100",
        "--model_save_dir", str(run / "models"),
        "--sample_dir", str(run / "samples"),
        "--log_dir", str(run / "logs"),
        "--validation_path", str(tmp_path / "nonexistent.pkl"),
        "--hparams",
        hparams + f",root_dir={mel_dir},feat_dir={f0_dir}",
        "--num_devices", "1",
    ]
    cli_train.main(common)
    cli_train.main(common + ["--model", "f0_converter"])

    demo = []
    for spk, emb_ix in [("p226", 1), ("p231", 7)]:
        mel = np.load(os.path.join(mel_dir, spk, "utt0.npy"))[:180]
        f0 = np.load(os.path.join(f0_dir, spk, "utt0.npy"))[:180]
        emb = np.zeros((82,), np.float32)
        emb[emb_ix] = 1.0  # ignored in learned mode
        demo.append([spk, emb, (mel, f0, len(mel), "utt0")])
    demo_path = tmp_path / "demo.pkl"
    with open(demo_path, "wb") as fh:
        pickle.dump(demo, fh)

    out_dir = str(tmp_path / "results")
    cli_convert.main([
        "--generator_ckpt", str(run / "models" / "2-G"),
        "--f0_ckpt", str(run / "models" / "2-P"),
        "--metadata", str(demo_path),
        "--out_dir", out_dir,
        "--conditions", "U",
        "--hparams", hparams,
    ])
    mel_out = np.load(os.path.join(out_dir, os.listdir(out_dir)[0]))
    assert mel_out.shape[1] == 80 and np.isfinite(mel_out).all()

"""Config surface tests: defaults, parse shim, JSON round trip."""

import pytest

from speechsplit_tpu.config import SpeechSplitConfig, default_config


def test_defaults_match_reference_hparams():
    """Values pinned to reference hparams.py:7-43."""
    cfg = default_config()
    assert (cfg.freq, cfg.freq_2, cfg.freq_3) == (8, 8, 8)
    assert (cfg.dim_neck, cfg.dim_neck_2, cfg.dim_neck_3) == (8, 1, 32)
    assert (cfg.dim_enc, cfg.dim_enc_2, cfg.dim_enc_3) == (512, 128, 256)
    assert (cfg.dim_freq, cfg.dim_spk_emb, cfg.dim_f0) == (80, 82, 257)
    assert cfg.chs_grp == 16
    assert (cfg.min_len_seg, cfg.max_len_seg) == (19, 32)
    assert (cfg.min_len_seq, cfg.max_len_seq, cfg.max_len_pad) == (
        64, 128, 192,
    )
    assert cfg.batch_size == 16 and cfg.n_repeats == 8
    assert cfg.max_num_seg == 7  # 128//19 + 1, ref model.py:365
    assert cfg.dim_code == 164  # decoder input width, ref model.py:244


def test_parse_overrides():
    cfg = default_config().parse("dim_neck=16,batch_size=4,mode=test")
    assert cfg.dim_neck == 16
    assert cfg.batch_size == 4
    assert cfg.mode == "test"
    # original untouched (frozen dataclass semantics)
    assert default_config().dim_neck == 8


def test_parse_reference_aliases():
    cfg = default_config().parse("samplier=4,num_workers=2,len_raw=64")
    assert cfg.n_repeats == 4  # `samplier` typo mapped (hparams.py:41)


def test_parse_list_values():
    """List grammar parity with HParams.parse (tfcompat/hparam.py:523):
    commas inside brackets do not split overrides."""
    cfg = default_config().parse("batch_size=1,mesh_shape=[2,4]")
    assert cfg.batch_size == 1
    assert cfg.mesh_shape == (2, 4)  # coerced to the field's tuple type
    cfg = default_config().parse("mesh_axes=('data','model'),dim_neck=16")
    assert cfg.mesh_axes == ("data", "model")
    assert cfg.dim_neck == 16


def test_parse_quoted_value_with_comma():
    cfg = default_config().parse("root_dir='a,b',mode=eval")
    assert cfg.root_dir == "a,b"
    assert cfg.mode == "eval"


def test_parse_unknown_key_raises():
    with pytest.raises(ValueError, match="unknown config key"):
        default_config().parse("not_a_key=3")


def test_parse_malformed_raises():
    with pytest.raises(ValueError, match="malformed"):
        default_config().parse("dim_neck")


def test_json_roundtrip():
    cfg = default_config().replace(dim_neck=12, root_dir="/x")
    back = SpeechSplitConfig.from_json(cfg.to_json())
    assert back == cfg


def test_debug_string():
    s = default_config().debug_string()
    assert s.startswith("Hyperparameters:")
    assert "dim_neck: 8" in s

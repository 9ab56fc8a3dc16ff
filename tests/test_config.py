"""Config system tests."""

import pytest

from emotts.utils import Config, load_config, save_config


def test_defaults():
    cfg = Config()
    assert cfg.audio.sampling_rate == 16000
    assert cfg.audio.hop_length == 256
    assert cfg.n_speakers == 4
    assert cfg.n_emotions == 5
    assert cfg.rank_model.hidden_dim == 384
    assert cfg.fastspeech2.enc_ffn_dim == 1536
    assert cfg.train_rank.learning_rate == 1e-6
    assert cfg.train_fs2.learning_rate == 1e-4
    assert cfg.train_fs2.max_iterations == 250_000


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.audio.n_mels = 96
    cfg.data.speakers = ["a", "b"]
    path = tmp_path / "cfg.yaml"
    save_config(cfg, str(path))
    loaded = load_config(str(path))
    assert loaded.audio.n_mels == 96
    assert loaded.data.speakers == ["a", "b"]
    assert loaded.fastspeech2.enc_d_model == 384


def test_cli_overrides():
    cfg = load_config(None, ["audio.n_mels=100", "train_rank.learning_rate=1e-3",
                             "data.speakers=[x,y,z]"])
    assert cfg.audio.n_mels == 100
    assert cfg.train_rank.learning_rate == pytest.approx(1e-3)
    assert cfg.data.speakers == ["x", "y", "z"]


def test_unknown_key_rejected(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("audio:\n  nonexistent: 1\n")
    with pytest.raises(KeyError):
        load_config(str(path))
    with pytest.raises(KeyError):
        load_config(None, ["audio.nope=1"])

"""Full-chain CLI smoke test on the synthetic corpus:
preprocess → pair lists → train-rank → bucketize → train-fs2 → synthesize.

This is the hermetic analogue of the reference's six-script workflow
(readme.md:84-98), exercising every stage through the public CLI surface.
"""

import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

from emotts.utils.config import save_config
from tests.synthetic_corpus import make_corpus


def test_full_chain(tmp_path):
    cfg = make_corpus(str(tmp_path / "corpus"), utts_per_emotion=5)
    # tiny everything
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 3
    f.max_mel_len = 128
    cfg.train_rank.batch_size = cfg.train_fs2.batch_size = 4
    cfg.train_rank.n_epochs = cfg.train_fs2.n_epochs = 1
    cfg.train_rank.compute_dtype = cfg.train_fs2.compute_dtype = "float32"
    cfg.mesh.data_parallel = 1
    cfg.inference.rank_exp = "exp_1"
    cfg.inference.fs2_exp = "exp_1"
    cfg.inference.bucket_size = 2
    cfg.inference.output_path = str(tmp_path / "demo")
    cfg.inference.text = "hello world"
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)

    from emotts.cli.main import main

    assert main(["preprocess", "--config", cfg_path]) == 0
    assert main(["fs2-splits", "--config", cfg_path]) == 0
    assert main(["train-rank", "--config", cfg_path]) == 0
    rank_exp = Path(cfg.data.experiment_path) / "rank_model" / "exp_1"
    assert (rank_exp / "best").exists()

    assert main(["bucketize", "--config", cfg_path]) == 0
    assert (rank_exp / "intensity.npy").exists()

    assert main(["train-fs2", "--config", cfg_path]) == 0
    fs2_exp = Path(cfg.data.experiment_path) / "fastspeech2" / "exp_1"
    assert (fs2_exp / "best").exists()

    # synthesize without a vocoder checkpoint → mel outputs only
    from emotts.infer.synthesize import load_synthesizer

    synth = load_synthesizer(cfg)
    out = synth.intensity_sweep(cfg.inference.text)
    assert len(out) == 2 * 3 * cfg.inference.bucket_size
    for (spk, emo, lv), mel in out.items():
        assert mel.ndim == 2 and mel.shape[1] == cfg.audio.n_mels
        assert np.isfinite(mel).all()

    # evaluate with PROTOTYPE conditioning at an exaggerated contrast —
    # the CLI surface of the --intensity-scale quality trade-off
    assert main(["evaluate", "--config", cfg_path,
                 "--conditioning", "prototype", "--contrast", "1.5"]) == 0
    rep = json.loads((fs2_exp / "eval.json").read_text())
    assert rep["conditioning"] == "prototype"
    assert rep["contrast"] == 1.5
    assert rep["n_utterances"] > 0
    assert "mcd_teacher_forced" in rep["overall"]

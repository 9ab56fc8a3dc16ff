"""End-to-end FastSpeech2 training slice on the synthetic corpus (with a
frozen intensity extractor from a trained rank model)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from emotts.data import build_fs2_splits, build_rank_pair_lists, preprocess_all
from emotts.parallel.mesh import make_mesh
from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
from emotts.train.rank_trainer import RankTrainer, build_rank_model, init_rank_params
from tests.synthetic_corpus import make_corpus


def _small_mesh():
    return make_mesh(devices=jax.devices()[:1])


@pytest.fixture(scope="module")
def corpus_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("fs2_e2e")
    cfg = make_corpus(str(root), utts_per_emotion=5)
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    build_fs2_splits(cfg)
    # tiny models
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 3
    cfg.train_fs2.batch_size = 4
    cfg.train_fs2.n_epochs = 2
    cfg.train_fs2.compute_dtype = "float32"
    cfg.train_rank.compute_dtype = "float32"
    return cfg


def test_fs2_fit_end_to_end(corpus_cfg):
    cfg = corpus_cfg
    # fresh (untrained but real) rank params serve as the frozen extractor
    rank_model = build_rank_model(cfg)
    rank_params = init_rank_params(cfg, rank_model, 0)
    ext_params = extractor_params_from_rank(rank_params)

    trainer = FS2Trainer(cfg, ext_params, mesh=_small_mesh())
    exp_path = trainer.fit(verbose=False)

    metrics = (Path(exp_path) / "metrics.jsonl").read_text().splitlines()
    tags = {json.loads(m)["tag"] for m in metrics}
    for name in ["total_loss", "ssim_loss", "mel_loss", "postnet_mel_loss",
                 "dur_loss", "pitch_loss", "energy_loss"]:
        assert f"Loss/{name}" in tags
        assert f"Valid/Loss/{name}" in tags

    assert (Path(exp_path) / "best").exists()
    assert list((Path(exp_path) / "mels").glob("valid_epoch_*.png"))


def test_fs2_loss_decreases_on_fixed_batch(corpus_cfg):
    cfg = corpus_cfg
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(
        cfg, extractor_params_from_rank(rank_params), mesh=_small_mesh()
    )
    loader = trainer._loader("train", shuffle=False)
    batch = next(iter(loader.epoch(0)))
    from emotts.parallel.mesh import shard_batch

    db = shard_batch(trainer.mesh, trainer._device_batch(batch))
    losses = []
    for _ in range(6):
        trainer.state, metrics = trainer._train_step(
            trainer.state, trainer.extractor_params, dict(db)
        )
        losses.append(float(jax.device_get(metrics["total_loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fs2_vocoded_validation_samples(corpus_cfg, tmp_path):
    """With a vocoder attached, validation dumps pred/GT wavs (the
    reference's synthesize_sample behavior, fastspeech2/util.py:103-119)."""
    import jax.numpy as jnp

    from emotts.nn.hifigan import HiFiGANGenerator

    cfg = corpus_cfg
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    voc = HiFiGANGenerator(
        in_channels=cfg.audio.n_mels,
        upsample_initial_channel=16,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1,),),
    )
    voc_params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))
    trainer = FS2Trainer(
        cfg, extractor_params_from_rank(rank_params), mesh=_small_mesh(),
        vocoder=voc, vocoder_params=voc_params,
    )
    loader = trainer._loader("valid", shuffle=False)
    exp = tmp_path / "exp"
    (exp / "wavs").mkdir(parents=True)
    trainer.valid_epoch(loader, epoch=0, exp_path=str(exp), plot_every=1)
    wavs = list((exp / "wavs").glob("epoch_0_sample_*_*.wav"))
    assert len(wavs) >= 2
    assert any("pred" in w.name for w in wavs)
    assert any("gt" in w.name for w in wavs)

"""Multi-step convergence on the 8-virtual-device dp×tp mesh.

The single-step dryrun (`__graft_entry__.dryrun_multichip`) proves the
sharded step compiles and executes; these tests prove the full training
loop STATE — optimizer moments, batch stats, RNG threading — stays coherent
across steps on a (4 data × 2 model) mesh: loss must strictly decrease when
both trainers overfit one fixed batch (reference loops:
rank_model/train.py:240-262, fastspeech2/train.py:244-264).
"""

import jax
import numpy as np
import pytest

from emotts.parallel.mesh import make_mesh, shard_batch
from emotts.utils.config import Config

pytestmark = pytest.mark.multichip


def _tiny_cfg():
    cfg = Config()
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 2
    f.max_mel_len = 32
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    cfg.train_rank.learning_rate = 1e-3
    cfg.train_fs2.learning_rate = 1e-3
    cfg.train_rank.compute_dtype = "float32"
    cfg.train_fs2.compute_dtype = "float32"
    cfg.mesh.data_parallel = 4
    cfg.mesh.model_parallel = 2
    return cfg


def test_rank_trainer_converges_on_mesh():
    from emotts.train.rank_trainer import RankTrainer

    cfg = _tiny_cfg()
    mesh = make_mesh(cfg.mesh)
    trainer = RankTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    b, t, c = 8, 16, cfg.audio.n_mels + 2
    batch = {
        "emo_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "neu_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "emotions": rng.integers(1, cfg.n_emotions, b).astype(np.int32),
        "lengths": np.full((b,), t, np.int32),
    }
    sharded = dict(shard_batch(mesh, batch))
    losses = []
    for _ in range(12):
        trainer.state, m = trainer._train_step(trainer.state, dict(sharded))
        losses.append(float(jax.device_get(m["loss"])))
    assert all(np.isfinite(losses)), losses
    # overfitting one batch: clear downward trend over the window
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) - 1e-4, losses
    # regression guard: the step must compile exactly once — a second cache
    # entry means the output shardings diverged from the input layout
    # (the silent step-2 recompile fixed in emotts/parallel/tp.py)
    assert trainer._train_step._cache_size() == 1


def test_fs2_trainer_converges_on_mesh():
    from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
    from emotts.train.rank_trainer import build_rank_model, init_rank_params

    cfg = _tiny_cfg()
    mesh = make_mesh(cfg.mesh)
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(cfg, extractor_params_from_rank(rank_params), mesh=mesh)
    rng = np.random.default_rng(0)
    b, p, t = 8, 6, 24
    batch = {
        "phonemes": rng.integers(1, 80, (b, p)).astype(np.int32),
        "durations": np.full((b, p), t // p, np.int32),
        "mel": rng.standard_normal((b, t, cfg.audio.n_mels)).astype(np.float32),
        "pitch": rng.standard_normal((b, t)).astype(np.float32),
        "energy": rng.standard_normal((b, t)).astype(np.float32),
        "rank_x": rng.standard_normal((b, t, cfg.audio.n_mels + 2)).astype(np.float32),
        "phon_len": np.full((b,), p, np.int32),
        "mel_len": np.full((b,), t, np.int32),
        "speakers": rng.integers(0, cfg.n_speakers, b).astype(np.int32),
        "emotions": rng.integers(0, cfg.n_emotions, b).astype(np.int32),
    }
    sharded = dict(shard_batch(mesh, batch))
    losses = []
    for _ in range(12):
        trainer.state, m = trainer._train_step(
            trainer.state, trainer.extractor_params, dict(sharded)
        )
        losses.append(float(jax.device_get(m["total_loss"])))
    assert all(np.isfinite(losses)), losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) - 1e-3, losses
    # step counter threaded through the sharded state
    assert int(jax.device_get(trainer.state.step)) == 12
    # single compile across all steps (recompile regression guard)
    assert trainer._train_step._cache_size() == 1


def test_vocoder_gan_converges_on_mesh(tmp_path):
    """Vocoder GAN training on the (4 data × 2 model) mesh: both optimizer
    chains thread across steps, the mel-only objective descends on a fixed
    batch, and adversarial metrics stay finite."""
    from emotts.train.vocoder_trainer import VocoderTrainer

    cfg = _tiny_cfg()
    vc = cfg.train_vocoder
    vc.batch_size = 8
    vc.segment_frames = 8
    vc.upsample_initial_channel = 16
    vc.resblock_kernel_sizes = [3]
    vc.resblock_dilations = [[1, 3]]
    vc.disc_channel_mult = 0.05
    vc.mpd_periods = [2, 3]
    vc.msd_scales = 2
    vc.compute_dtype = "float32"
    vc.learning_rate = 1e-3
    mesh = make_mesh(cfg.mesh)
    assert mesh.shape == {"data": 4, "model": 2}
    tr = VocoderTrainer(cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    t = np.arange(tr.segment_samples) / cfg.audio.sampling_rate
    y = 0.4 * np.sin(2 * np.pi * (150 + 40 * rng.random((8, 1))) * t)
    y = (y + 0.02 * rng.standard_normal(y.shape)).astype(np.float32)

    mel_losses, d_losses = [], []
    for _ in range(12):
        batch = shard_batch(mesh, {"y": y})
        tr.gen_state, tr.disc_state, metrics = tr._train_step(
            tr.gen_state, tr.disc_state, batch
        )
        m = jax.device_get(metrics)
        mel_losses.append(float(m["mel_l1"]))
        d_losses.append(float(m["d_loss"]))
    assert int(jax.device_get(tr.gen_state.step)) == 12
    assert int(jax.device_get(tr.disc_state.step)) == 12
    assert np.isfinite(mel_losses).all() and np.isfinite(d_losses).all()
    assert np.mean(mel_losses[-3:]) < np.mean(mel_losses[:3]), mel_losses

"""Vocoder GAN-training tests (emotts/train/vocoder_trainer.py,
emotts/nn/hifigan_disc.py, emotts/losses/gan.py): discriminator contracts,
one adversarial step end to end, deterministic mel-only convergence, and the
export → synthesis round trip."""

import os
from glob import glob

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emotts.nn.hifigan_disc import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from emotts.train.vocoder_trainer import SegmentSampler, VocoderTrainer
from emotts.utils.config import Config


def tiny_cfg(tmp_path, adversarial: float) -> Config:
    cfg = Config()
    cfg.data.corpus_path = str(tmp_path / "corpus")
    cfg.data.experiment_path = str(tmp_path / "experiments")
    cfg.mesh.data_parallel = 1
    vc = cfg.train_vocoder
    vc.batch_size = 2
    vc.segment_frames = 8
    vc.upsample_initial_channel = 16
    vc.resblock_kernel_sizes = [3]
    vc.resblock_dilations = [[1, 3]]
    vc.disc_channel_mult = 0.05
    vc.mpd_periods = [2, 3]
    vc.msd_scales = 2
    vc.adversarial_weight = adversarial
    vc.compute_dtype = "float32"
    vc.learning_rate = 1e-3
    vc.checkpoint_every_steps = 5
    vc.log_every_steps = 5
    return cfg


def write_corpus(cfg: Config, n: int = 3, seconds: float = 0.6) -> None:
    from emotts.audio.wavio import write_wav

    sr = cfg.audio.sampling_rate
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(cfg.data.corpus_path, "spk"), exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        f0 = 150.0 + 60 * i
        y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
        write_wav(
            os.path.join(cfg.data.corpus_path, "spk", f"amused_{i:04d}.wav"),
            y.astype(np.float32), sr,
        )


def test_discriminator_contracts():
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 2048)).astype(np.float32)
    )
    mpd = MultiPeriodDiscriminator(periods=(2, 3, 5), channel_mult=0.1)
    params = mpd.init(jax.random.PRNGKey(0), y)
    outs, feats = mpd.apply(params, y)
    assert len(outs) == 3 and len(feats) == 3
    for o, f in zip(outs, feats):
        assert o.shape[0] == 2 and o.ndim == 2
        assert len(f) == 6  # 4 strided + 1 wide + 1 post conv
    msd = MultiScaleDiscriminator(n_scales=3, channel_mult=0.05)
    params = msd.init(jax.random.PRNGKey(0), y)
    outs, feats = msd.apply(params, y)
    assert len(outs) == 3
    # each scale halves the resolution
    assert outs[0].shape[1] > outs[1].shape[1] > outs[2].shape[1]
    for f in feats:
        assert len(f) == 8  # 7 conv layers + post conv


def test_msd_dense_groups_parity():
    """dense_groups re-expresses grouped convs as block-diagonal dense convs:
    identical param tree (names/shapes/init) and identical outputs."""
    y = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 1024)).astype(np.float32)
    )
    grouped = MultiScaleDiscriminator(n_scales=2, channel_mult=0.1)
    dense = MultiScaleDiscriminator(n_scales=2, channel_mult=0.1,
                                    dense_groups=True)
    pg = grouped.init(jax.random.PRNGKey(7), y)
    pd = dense.init(jax.random.PRNGKey(7), y)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), pg, pd)
    og, fg = grouped.apply(pg, y)
    od, fd = dense.apply(pg, y)
    for a, b in zip(og, od):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    for la, lb in zip(fg, fd):
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_msd_group_merge_parity():
    """group_merge=m fuses m original groups into one conv group via a
    partial block-diagonal expansion: identical param tree and identical
    outputs/gradients to the plain grouped conv, for every m that divides
    the group count (dense_groups is the m=g special case)."""
    y = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 1024)).astype(np.float32)
    )
    grouped = MultiScaleDiscriminator(n_scales=2, channel_mult=0.25)
    pg = grouped.init(jax.random.PRNGKey(11), y)
    og, fg = grouped.apply(pg, y)

    def loss(params, model):
        outs, feats = model.apply(params, y)
        return sum(jnp.sum(jnp.square(o)) for o in outs) + sum(
            jnp.sum(jnp.abs(f)) for fl in feats for f in fl)

    gg = jax.grad(loss)(pg, grouped)
    for m in (2, 4, 8):
        merged = MultiScaleDiscriminator(n_scales=2, channel_mult=0.25,
                                         group_merge=m)
        pm = merged.init(jax.random.PRNGKey(11), y)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)), pg, pm)
        om, fm = merged.apply(pg, y)
        for a, b in zip(og, om):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
        for la, lb in zip(fg, fm):
            for a, b in zip(la, lb):
                assert a.shape == b.shape
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-5)
        gm = jax.grad(loss)(pg, merged)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4), gg, gm)


def test_mpd_fold_periods_parity():
    """fold_1d runs the identical conv stack with the period axis folded
    into batch: same param tree, same logits/feature maps (incl. gradients
    through a scalar loss)."""
    y = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1200)).astype(np.float32)
    )
    base = MultiPeriodDiscriminator(periods=(2, 5, 7), channel_mult=0.1)
    fold = MultiPeriodDiscriminator(periods=(2, 5, 7), channel_mult=0.1,
                                    fold_periods=(5, 7))
    pb = base.init(jax.random.PRNGKey(9), y)
    pf = fold.init(jax.random.PRNGKey(9), y)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), pb, pf)
    ob, fb = base.apply(pb, y)
    of, ff = fold.apply(pb, y)
    for a, b in zip(ob, of):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    for la, lb in zip(fb, ff):
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def loss(params, model):
        outs, feats = model.apply(params, y)
        return sum(jnp.sum(jnp.square(o)) for o in outs) + sum(
            jnp.sum(jnp.abs(f)) for fl in feats for f in fl)

    gb = jax.grad(loss)(pb, base)
    gf = jax.grad(loss)(pb, fold)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4), gb, gf)


def test_period_discriminator_pads_non_divisible():
    from emotts.nn.hifigan_disc import PeriodDiscriminator

    y = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1000), ),
                    dtype=jnp.float32)
    d = PeriodDiscriminator(period=3, channels=(4, 8, 8, 8))
    params = d.init(jax.random.PRNGKey(0), y)
    o, _ = d.apply(params, y)  # 1000 % 3 != 0 → reflect pad inside
    assert np.isfinite(np.asarray(o)).all()


def test_adversarial_step_updates_both(tmp_path):
    cfg = tiny_cfg(tmp_path, adversarial=1.0)
    write_corpus(cfg)
    tr = VocoderTrainer(cfg)
    g0 = jax.device_get(tr.gen_state.params)
    d0 = jax.device_get(tr.disc_state.params)
    exp = tr.fit(n_steps=2)
    g1 = jax.device_get(tr.gen_state.params)
    d1 = jax.device_get(tr.disc_state.params)
    assert int(jax.device_get(tr.gen_state.step)) == 2
    assert int(jax.device_get(tr.disc_state.step)) == 2

    def changed(a, b):
        return any(
            not np.allclose(x, y)
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        )

    assert changed(g0, g1) and changed(d0, d1)
    assert os.path.exists(os.path.join(exp, "vocoder.npz"))
    assert os.path.exists(os.path.join(exp, "metrics.jsonl"))


def test_single_forward_vjp_grads_match_double_forward(tmp_path):
    """The adversarial step runs the generator forward ONCE (jax.vjp) and
    reuses it for both the D update and the G pullback.  Its generator
    gradients must match the naive two-forward formulation (forward for the
    detached D input + value_and_grad of the composite G loss) exactly up to
    float32 noise."""
    from emotts.losses.gan import (
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
        mel_l1_loss,
    )
    from emotts.audio.mel import mel_full_jax
    import optax

    cfg = tiny_cfg(tmp_path, adversarial=1.0)
    write_corpus(cfg)
    tr = VocoderTrainer(cfg)
    rng = np.random.default_rng(3)
    y = jnp.asarray(
        rng.standard_normal((2, tr.segment_samples)).astype(np.float32) * 0.1
    )
    batch = {"y": y}

    # --- reference: naive double-forward step on the same initial states ---
    acfg = cfg.audio
    t_frames = cfg.train_vocoder.segment_frames
    gen, mpd, msd = tr.gen, tr.mpd, tr.msd
    gp0 = jax.device_get(tr.gen_state.params)
    dp0 = jax.device_get(tr.disc_state.params)
    mel_in = mel_full_jax(y, acfg)[:, :, :t_frames].transpose(0, 2, 1)
    mel_soft = mel_full_jax(y, acfg, floor="soft")[:, :, :t_frames]

    def disc_all(dp, w):
        op, fp = mpd.apply(dp["mpd"], w)
        os_, fs = msd.apply(dp["msd"], w)
        return op + os_, fp + fs

    y_hat_det = jax.lax.stop_gradient(gen.apply(gp0, mel_in))

    def d_loss_fn(dp):
        real_outs, _ = disc_all(dp, y)
        fake_outs, _ = disc_all(dp, y_hat_det)
        return discriminator_loss(real_outs, fake_outs)

    d_grads = jax.grad(d_loss_fn)(dp0)
    d_updates, _ = tr.disc_tx.update(
        d_grads, jax.device_get(tr.disc_state.opt_state), dp0
    )
    dp1 = optax.apply_updates(dp0, d_updates)

    def g_loss_fn(gp):
        y_hat = gen.apply(gp, mel_in)
        mel_hat = mel_full_jax(y_hat, acfg, floor="soft")[:, :, :t_frames]
        l_mel = mel_l1_loss(mel_hat, mel_soft)
        fake_outs, fake_feats = disc_all(dp1, y_hat)
        _, real_feats = disc_all(dp1, jax.lax.stop_gradient(y))
        return (
            cfg.train_vocoder.mel_loss_weight * l_mel
            + cfg.train_vocoder.adversarial_weight
            * generator_adversarial_loss(fake_outs)
            + cfg.train_vocoder.feature_loss_weight
            * feature_matching_loss(real_feats, fake_feats)
        )

    g_grads_ref = jax.grad(g_loss_fn)(gp0)

    # --- actual: one trainer step from the same states; recover its grads
    # by inverting the Adam update is fragile, so instead compare the
    # updated params against applying the reference grads by hand ---
    g_updates, _ = tr.gen_tx.update(
        g_grads_ref, jax.device_get(tr.gen_state.opt_state), gp0
    )
    gp1_ref = optax.apply_updates(gp0, g_updates)

    gen_state, disc_state, _ = tr._train_step(tr.gen_state, tr.disc_state, batch)
    gp1 = jax.device_get(gen_state.params)
    dp1_actual = jax.device_get(disc_state.params)

    for a, b in zip(jax.tree_util.tree_leaves(gp1_ref),
                    jax.tree_util.tree_leaves(gp1)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(dp1),
                    jax.tree_util.tree_leaves(dp1_actual)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_gen_remat_step_parity(tmp_path):
    """gen_remat=True recomputes the generator forward inside the vjp
    pullback (trading FLOPs for peak HBM); the step's updated params must
    match the non-remat step on the same batch."""
    cfg = tiny_cfg(tmp_path, adversarial=1.0)
    write_corpus(cfg)
    tr0 = VocoderTrainer(cfg)
    cfg_r = tiny_cfg(tmp_path, adversarial=1.0)
    cfg_r.train_vocoder.gen_remat = True
    tr1 = VocoderTrainer(cfg_r)
    rng = np.random.default_rng(17)
    y = jnp.asarray(
        rng.standard_normal((2, tr0.segment_samples)).astype(np.float32) * 0.1
    )
    batch = {"y": y}
    g0, d0, _ = tr0._train_step(tr0.gen_state, tr0.disc_state, batch)
    g1, d1, _ = tr1._train_step(tr1.gen_state, tr1.disc_state, batch)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g0.params)),
                    jax.tree_util.tree_leaves(jax.device_get(g1.params))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-7)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(d0.params)),
                    jax.tree_util.tree_leaves(jax.device_get(d1.params))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-7)


def test_mel_only_convergence_and_export(tmp_path):
    """adversarial_weight=0 → deterministic mel-only objective; the loss must
    decrease over a short run, and the exported .npz must drive the synthesis
    vocoder path."""
    cfg = tiny_cfg(tmp_path, adversarial=0.0)
    write_corpus(cfg)
    tr = VocoderTrainer(cfg)

    from emotts.parallel.mesh import shard_batch

    sampler = SegmentSampler(
        sorted(glob(os.path.join(cfg.data.corpus_path, "*", "*.wav"))),
        cfg.audio.sampling_rate, tr.segment_samples, seed=0,
    )
    fixed = sampler.batch(2)  # overfit one batch: deterministic descent
    losses = []
    for _ in range(40):
        batch = shard_batch(tr.mesh, {"y": fixed})
        tr.gen_state, tr.disc_state, metrics = tr._train_step(
            tr.gen_state, tr.disc_state, batch
        )
        losses.append(float(jax.device_get(metrics["mel_l1"])))
    assert np.mean(losses[-5:]) < 0.95 * np.mean(losses[:5]), losses
    # disc untouched in mel-only mode
    assert int(jax.device_get(tr.disc_state.step)) == 0

    exp = tmp_path / "exp"
    exp.mkdir()
    npz = tr.export(str(exp))
    from emotts.infer.synthesize import load_vocoder_checkpoint
    from emotts.nn.hifigan import generator_structure_from_params

    loaded = load_vocoder_checkpoint(npz, cfg)
    gen2 = type(tr.gen)(**generator_structure_from_params(loaded))
    mel = jnp.zeros((1, 8, cfg.audio.n_mels))
    wav = gen2.apply(loaded, mel)
    assert wav.shape == (1, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_checkpoint_resume(tmp_path):
    cfg = tiny_cfg(tmp_path, adversarial=1.0)
    write_corpus(cfg)
    tr = VocoderTrainer(cfg)
    exp = tr.fit(n_steps=5)  # checkpoint_every_steps=5 → ckpt at step 5
    g5 = jax.device_get(tr.gen_state.params)

    tr2 = VocoderTrainer(cfg)
    assert tr2.restore(exp)
    assert int(jax.device_get(tr2.gen_state.step)) == 5
    g5r = jax.device_get(tr2.gen_state.params)
    for a, b in zip(jax.tree_util.tree_leaves(g5),
                    jax.tree_util.tree_leaves(g5r)):
        np.testing.assert_array_equal(a, b)


def test_train_vocoder_cli(tmp_path):
    from emotts.cli.main import main
    from emotts.utils.config import save_config

    cfg = tiny_cfg(tmp_path, adversarial=1.0)
    cfg.train_vocoder.n_steps = 2
    write_corpus(cfg)
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    rc = main(["train-vocoder", "--config", cfg_path])
    assert rc == 0
    exps = glob(os.path.join(cfg.data.experiment_path, "vocoder", "exp_*"))
    assert len(exps) == 1
    assert os.path.exists(os.path.join(exps[0], "vocoder.npz"))


def test_paired_segment_sampler_alignment():
    """Crops must stay frame-aligned: mel frame k ↔ wav samples [k·hop,(k+1)·hop)."""
    from emotts.train.vocoder_trainer import PairedSegmentSampler

    hop, f = 4, 3
    # mel frame k holds value k; wav sample s holds s // hop
    mel = np.arange(10, dtype=np.float32)[:, None] * np.ones((1, 2), np.float32)
    wav = np.repeat(np.arange(10, dtype=np.float32), hop)
    short_mel = np.zeros((2, 2), np.float32)
    short_wav = np.zeros(2 * hop, np.float32)
    s = PairedSegmentSampler([(mel, wav), (short_mel, short_wav)],
                             segment_frames=f, hop=hop, mel_floor=-11.5, seed=0)
    for _ in range(10):
        b = s.batch(4)
        assert b["y"].shape == (4, f * hop)
        assert b["mel_cond"].shape == (4, f, 2)
        for row in range(4):
            frames = b["mel_cond"][row, :, 0]
            samples = b["y"][row]
            if (frames > 0).any() or samples.max() > 0:  # the long pair
                np.testing.assert_array_equal(
                    np.repeat(frames, hop), samples
                )


def test_finetune_on_fs2_mels(tmp_path):
    """condition=fs2: teacher-forced FS2 mels pair with real audio and the
    GAN step trains end to end through the CLI."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_corpus import make_corpus

    from emotts.cli.main import main
    from emotts.utils.config import save_config

    cfg = make_corpus(str(tmp_path / "corpus"), utts_per_emotion=4)
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
    cfg.inference.rank_exp = cfg.inference.fs2_exp = "exp_1"
    vc = cfg.train_vocoder
    vc.condition = "fs2"
    vc.n_steps = 2
    vc.batch_size = 2
    vc.segment_frames = 8
    vc.upsample_initial_channel = 16
    vc.resblock_kernel_sizes = [3]
    vc.resblock_dilations = [[1, 3]]
    vc.disc_channel_mult = 0.05
    vc.mpd_periods = [2]
    vc.msd_scales = 1
    vc.compute_dtype = "float32"
    vc.checkpoint_every_steps = 2
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)

    assert main(["preprocess", "--config", cfg_path]) == 0
    assert main(["fs2-splits", "--config", cfg_path]) == 0
    assert main(["train-rank", "--config", cfg_path]) == 0
    assert main(["train-fs2", "--config", cfg_path]) == 0
    assert main(["train-vocoder", "--config", cfg_path]) == 0
    exps = glob(os.path.join(cfg.data.experiment_path, "vocoder", "exp_*"))
    assert len(exps) == 1
    assert os.path.exists(os.path.join(exps[0], "vocoder.npz"))

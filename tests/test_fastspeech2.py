"""FastSpeech2 model + composite loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.losses import fs2_loss, ssim_loss
from emotts.nn.fastspeech2 import FastSpeech2, PostNet, VariancePredictor
from emotts.utils.config import FastSpeech2Config, LossConfig

B, P, T, N_MELS = 2, 6, 40, 16


def tiny_cfg():
    return FastSpeech2Config(
        enc_num_layers=1, enc_num_head=2, enc_d_model=32, enc_ffn_dim=64,
        dec_num_layers=1, dec_num_head=2, dec_d_model=32, dec_ffn_dim=64,
        n_char=95, n_mels=N_MELS, postnet_embedding_dim=32,
        postnet_n_convolutions=3, intensity_dim=5, max_mel_len=T,
    )


@pytest.fixture(scope="module")
def model_setup():
    model = FastSpeech2(tiny_cfg(), n_speakers=3)
    tokens = jnp.array([[5, 9, 14, 3, 0, 0], [7, 2, 11, 6, 8, 4]])
    speakers = jnp.array([0, 2])
    durations = jnp.array([[4, 6, 8, 6, 0, 0], [5, 5, 5, 5, 5, 5]])
    pitch = jax.random.normal(jax.random.PRNGKey(0), (B, T))
    energy = jax.random.normal(jax.random.PRNGKey(1), (B, T))
    intensity = jax.random.normal(jax.random.PRNGKey(2), (B, P, 5))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        tokens, speakers, durations, pitch, energy, intensity,
    )
    return model, variables, (tokens, speakers, durations, pitch, energy, intensity)


def test_teacher_forced_shapes(model_setup):
    model, variables, (tokens, speakers, durations, pitch, energy, intensity) = model_setup
    out = model.apply(variables, tokens, speakers, durations, pitch, energy, intensity)
    mel_post, postnet_mel, log_dur, p_pitch, a_pitch, p_energy, a_energy, mel_lens = out
    assert mel_post.shape == (B, T, N_MELS)
    assert postnet_mel.shape == (B, T, N_MELS)
    assert log_dur.shape == (B, P)
    assert p_pitch.shape == (B, P, 1)
    assert a_pitch.shape == (B, P, 1)
    np.testing.assert_array_equal(np.asarray(mel_lens), [24, 30])
    # frames past mel_len are zero
    assert np.abs(np.asarray(mel_post)[0, 24:]).sum() == 0
    # padded phones predict zero
    assert np.abs(np.asarray(log_dur)[0, 4:]).sum() == 0


def test_inference_mode_predicted_everything(model_setup):
    model, variables, (tokens, speakers, *_ ) = model_setup
    out = model.apply(variables, tokens, speakers)  # no durations/pitch/energy
    mel_post, postnet_mel, log_dur, p_pitch, a_pitch, p_energy, a_energy, mel_lens = out
    assert a_pitch is None and a_energy is None
    assert mel_post.shape == (B, T, N_MELS)
    assert (np.asarray(mel_lens) <= T).all()


def test_pace_control(model_setup):
    model, variables, (tokens, speakers, durations, pitch, energy, intensity) = model_setup
    out1 = model.apply(variables, tokens, speakers, durations, pitch, energy, intensity)
    out2 = model.apply(
        variables, tokens, speakers, durations, pitch, energy, intensity, pace=0.5
    )
    # pace scales durations → roughly half the frames
    assert int(out2[7][0]) == 12
    assert int(out1[7][0]) == 24


def test_intensity_conditioning_changes_output(model_setup):
    model, variables, (tokens, speakers, durations, pitch, energy, intensity) = model_setup
    out1 = model.apply(variables, tokens, speakers, durations, pitch, energy, intensity)
    out2 = model.apply(
        variables, tokens, speakers, durations, pitch, energy, intensity * 2.0
    )
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_fs2_loss_matches_torch_semantics():
    """Cross-check the vectorized masked losses against an independent torch
    per-sample loop implementing the published accumulation scheme."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    mel_len = np.array([30, 20])
    phon_len = np.array([4, 6])
    mel_out = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    postnet_out = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    mel_tgt = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    log_dur = rng.standard_normal((B, P)).astype(np.float32)
    tgt_dur = rng.integers(0, 9, (B, P)).astype(np.int32)
    pred_pitch = rng.standard_normal((B, P, 1)).astype(np.float32)
    avg_pitch = rng.standard_normal((B, P, 1)).astype(np.float32)
    pred_energy = rng.standard_normal((B, P, 1)).astype(np.float32)
    avg_energy = rng.standard_normal((B, P, 1)).astype(np.float32)

    preds = (
        jnp.asarray(mel_out), jnp.asarray(postnet_out), jnp.asarray(log_dur),
        jnp.asarray(pred_pitch), jnp.asarray(avg_pitch),
        jnp.asarray(pred_energy), jnp.asarray(avg_energy), jnp.asarray(mel_len),
    )
    cfg = LossConfig(ssim_loss_weight=0.0)  # compare the MSE terms exactly
    total, parts = fs2_loss(
        preds, jnp.asarray(mel_tgt), jnp.asarray(tgt_dur),
        jnp.asarray(mel_len), jnp.asarray(phon_len), cfg,
    )

    mse = torch.nn.MSELoss()
    t_mel = t_post = t_dur = t_pitch = t_energy = 0.0
    log_tgt = torch.log1p(torch.tensor(tgt_dur, dtype=torch.float32))
    for i in range(B):
        ml, pl = mel_len[i], phon_len[i]
        t_mel = t_mel + mse(torch.tensor(mel_out[i, :ml]), torch.tensor(mel_tgt[i, :ml]))
        t_post = t_post + mse(torch.tensor(postnet_out[i, :ml]), torch.tensor(mel_tgt[i, :ml]))
        t_dur = t_dur + mse(torch.tensor(log_dur[i, :pl]), log_tgt[i, :pl])
        t_pitch = t_pitch + mse(
            torch.tensor(pred_pitch[i, :pl, 0]), torch.tensor(avg_pitch[i, :pl, 0])
        )
        t_energy = t_energy + mse(
            torch.tensor(pred_energy[i, :pl, 0]), torch.tensor(avg_energy[i, :pl, 0])
        )
    assert float(parts["mel_loss"]) == pytest.approx(float(t_mel) / B, rel=1e-5)
    assert float(parts["postnet_mel_loss"]) == pytest.approx(float(t_post) / B, rel=1e-5)
    assert float(parts["dur_loss"]) == pytest.approx(float(t_dur) / B, rel=1e-5)
    assert float(parts["pitch_loss"]) == pytest.approx(float(t_pitch) / B, rel=1e-5)
    assert float(parts["energy_loss"]) == pytest.approx(float(t_energy) / B, rel=1e-5)


def test_ssim_properties():
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    valid = jnp.arange(T)[None, :] < jnp.array([30, 25])[:, None]
    # identical mels → loss 0
    assert float(ssim_loss(jnp.asarray(mel), jnp.asarray(mel), valid)) == pytest.approx(0.0, abs=1e-5)
    # unrelated mels → loss substantially > 0, <= 1
    other = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    val = float(ssim_loss(jnp.asarray(mel), jnp.asarray(other), valid))
    assert 0.3 < val <= 1.0
    # padding content must not affect the loss
    mel2 = mel.copy()
    mel2[0, 30:] = 123.0
    v1 = float(ssim_loss(jnp.asarray(mel2), jnp.asarray(other), valid))
    # (window leakage across the boundary is bounded by the 11-wide kernel)
    assert val == pytest.approx(v1, abs=0.05)


def test_variance_predictor_masks():
    vp = VariancePredictor(d_model=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    valid = jnp.arange(8)[None, :] < 5
    params = vp.init(jax.random.PRNGKey(0), x, valid)
    y = vp.apply(params, x, valid)
    assert y.shape == (1, 8, 1)
    assert np.abs(np.asarray(y)[0, 5:]).sum() == 0


def test_postnet_batchnorm_collections():
    pn = PostNet(n_mels=N_MELS, embedding_dim=24, n_convs=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, N_MELS))
    variables = pn.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    # train mode mutates batch stats
    y, mutated = pn.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    assert y.shape == (B, T, N_MELS)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))

"""Synthesis pipeline tests: batched text→mel→wav sweep on tiny models."""

import numpy as np
import pytest

from emotts.infer.synthesize import Synthesizer, save_vocoder_params_npz
from emotts.nn.hifigan import HiFiGANGenerator
from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables
from emotts.utils.config import Config

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def synth():
    cfg = Config()
    cfg.data.speakers = ["a", "b"]
    cfg.data.emotions = ["neutral", "amused", "angry"]
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 3
    f.max_mel_len = 128
    cfg.bucketing.phone_buckets = [16, 32]
    cfg.inference.bucket_size = 2

    model = build_fastspeech2(cfg)
    variables = init_fs2_variables(cfg, model, 0)

    voc = HiFiGANGenerator(
        in_channels=cfg.audio.n_mels,
        upsample_initial_channel=16,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    voc_params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))

    bank = np.random.default_rng(0).standard_normal((2, 3, 2, 3)).astype(np.float32)
    s = Synthesizer(cfg, variables, voc_params, bank)
    s.vocoder = voc  # small test vocoder
    s._voc_fn = jax.jit(s._vocode)
    return cfg, s


def test_intensity_lookup(synth):
    cfg, s = synth
    z = s.intensity_for(0, 0, 1, 5)  # neutral → zeros
    assert z.shape == (5, 3) and (z == 0).all()
    p = s.intensity_for(1, 2, 0, 5)
    assert p.shape == (5, 3)
    assert (p == p[0]).all()  # broadcast over phones
    np.testing.assert_array_equal(p[0], s.intensity_bank[1, 2, 0])


def test_sweep_produces_all_combos(synth, tmp_path):
    cfg, s = synth
    out = s.intensity_sweep("hello world", out_dir=str(tmp_path))
    assert len(out) == 2 * 3 * 2  # spk × emo × level
    for (spk, emo, lv), wav in out.items():
        assert wav.ndim == 1
        assert len(wav) > 0
        assert len(wav) % cfg.audio.hop_length == 0
    wavs = list(tmp_path.glob("*.wav"))
    assert len(wavs) == 12


def test_mel_lens_respect_bucket(synth):
    cfg, s = synth
    ids = s.text_to_phoneme_ids("the quick brown fox")
    speakers = np.zeros(3, np.int32)
    intensity = np.zeros((3, len(ids), 3), np.float32)
    mel, lens = s.synthesize_mels(ids, speakers, intensity)
    assert mel.shape[1] == cfg.fastspeech2.max_mel_len
    assert (np.asarray(lens) <= cfg.fastspeech2.max_mel_len).all()


def test_vocoder_npz_roundtrip(synth, tmp_path):
    cfg, s = synth
    from emotts.infer.synthesize import load_vocoder_checkpoint

    path = tmp_path / "voc.npz"
    save_vocoder_params_npz(
        {"params": jax.device_get(s.vocoder_params)["params"]}, str(path)
    )
    loaded = load_vocoder_checkpoint(str(path), cfg)
    orig_leaves = jax.tree_util.tree_leaves(jax.device_get(s.vocoder_params))
    new_leaves = jax.tree_util.tree_leaves(loaded)
    assert len(orig_leaves) == len(new_leaves)
    # apply must produce identical output
    mel = jnp.zeros((1, 8, cfg.audio.n_mels))
    w1 = np.asarray(s.vocoder.apply(s.vocoder_params, mel))
    w2 = np.asarray(s.vocoder.apply(loaded, mel))
    np.testing.assert_allclose(w1, w2, rtol=1e-6)


def test_prosody_controls(synth):
    cfg, s = synth
    ids = s.text_to_phoneme_ids("testing prosody controls")
    speakers = np.zeros(2, np.int32)
    intensity = np.zeros((2, len(ids), 3), np.float32)
    _, lens_fast = s.synthesize_mels(ids, speakers, intensity, pace=0.5)
    _, lens_norm = s.synthesize_mels(ids, speakers, intensity, pace=1.0)
    # pace scales predicted durations → fewer frames at pace 0.5
    assert (np.asarray(lens_fast) <= np.asarray(lens_norm)).all()
    assert np.asarray(lens_fast).sum() < np.asarray(lens_norm).sum()

    mel1, _ = s.synthesize_mels(ids, speakers, intensity, pitch_rate=1.0)
    mel2, _ = s.synthesize_mels(ids, speakers, intensity, pitch_rate=2.0)
    assert not np.allclose(np.asarray(mel1), np.asarray(mel2))

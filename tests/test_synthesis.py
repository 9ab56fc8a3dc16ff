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


def test_generator_structure_inference(synth):
    """A Synthesizer built from vocoder params alone must infer the
    generator's structure (non-V1 fixture here) and vocode identically to
    the hand-constructed module."""
    cfg, s = synth
    from emotts.nn.hifigan import generator_structure_from_params

    st = generator_structure_from_params(s.vocoder_params)
    assert st["upsample_rates"] == (8, 8, 2, 2)
    assert st["upsample_kernel_sizes"] == (16, 16, 4, 4)
    assert st["resblock_kernel_sizes"] == (3,)
    assert st["resblock_dilations"] == ((1, 3),)
    assert st["upsample_initial_channel"] == 16
    s2 = Synthesizer(cfg, s.fs2_variables, s.vocoder_params,
                     s.intensity_bank, g2p=s.g2p)
    mel = jnp.zeros((1, 8, cfg.audio.n_mels))
    w1 = np.asarray(jax.device_get(s.vocode(mel)))
    w2 = np.asarray(jax.device_get(s2.vocode(mel)))
    np.testing.assert_array_equal(w1, w2)

    # hop validation: matching hop passes, mismatched hop raises loudly
    # instead of silently loading a wrong-architecture generator
    st_ok = generator_structure_from_params(
        s.vocoder_params, expected_upsample=cfg.audio.hop_length
    )
    assert st_ok["upsample_rates"] == (8, 8, 2, 2)
    import pytest

    with pytest.raises(ValueError, match="hop length"):
        generator_structure_from_params(
            s.vocoder_params, expected_upsample=300
        )


def test_long_text_synthesis(synth):
    cfg, s = synth
    text = "The fox ran. It was quick! A long winding sentence follows here?"
    wav = s.synthesize_text(text, speaker_id=1, emotion_id=2, level=1,
                            gap_s=0.1)
    assert wav.ndim == 1 and wav.dtype == np.float32
    gap = int(0.1 * cfg.audio.sampling_rate)
    # three sentences, two gaps; every sentence contributes > 0 samples
    assert len(wav) > 2 * gap
    # stitched output equals per-sentence synthesis in order: sentence 1
    # alone must reproduce the head of the stitched waveform
    ids = s.text_to_phoneme_ids("The fox ran.")
    inten = s.intensity_for(1, 2, 1, len(ids))[None]
    mel, lens = s.synthesize_mels(ids, np.array([1], np.int32), inten)
    pcm = np.asarray(jax.device_get(s.vocode(mel)))
    head = pcm[0, : int(np.asarray(lens)[0]) * cfg.audio.hop_length]
    head = head.astype(np.float32) / 32767.0
    np.testing.assert_allclose(wav[: len(head)], head, atol=1e-6)


def test_long_text_requires_vocoder(synth):
    cfg, s = synth
    import copy
    bare = Synthesizer(cfg, s.fs2_variables, None, s.intensity_bank, g2p=s.g2p)
    with pytest.raises(RuntimeError):
        bare.synthesize_text("hello there.", 0, 0)


def test_long_text_cli(synth, tmp_path, monkeypatch):
    """CLI long-form path over the tiny fixture models (no real ckpts:
    patch load_synthesizer)."""
    cfg, s = synth
    import emotts.infer.synthesize as syn_mod
    from emotts.utils.config import save_config
    from emotts.cli.main import main

    cfg.inference.output_path = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    text_path = tmp_path / "story.txt"
    text_path.write_text("A tiny tale. It ends well!")
    monkeypatch.setattr(syn_mod, "load_synthesizer", lambda c, **kw: s)
    rc = main(["synthesize", "--config", cfg_path,
               "--text-file", str(text_path),
               "--speaker", "b", "--emotion", "angry", "--level", "1"])
    assert rc == 0
    wavs = list((tmp_path / "out").glob("longform_b_angry_1.wav"))
    assert len(wavs) == 1
    import emotts.audio.wavio as wavio
    data, sr = wavio.read_wav(str(wavs[0]))
    assert sr == cfg.audio.sampling_rate and len(data) > 0

    # blended-control flags parse and synthesize through the same path
    rc = main(["synthesize", "--config", cfg_path,
               "--text-file", str(text_path),
               "--speaker-mix", "a:0.5,b:0.5",
               "--emotion-mix", "amused@1:0.6,angry:0.4", "--level", "2"])
    assert rc == 0
    blend = list((tmp_path / "out").glob("longform_a0.5+b0.5_*.wav"))
    assert len(blend) == 1
    # unknown mix name → clean error, not a crash
    assert main(["synthesize", "--config", cfg_path,
                 "--text-file", str(text_path),
                 "--speaker-mix", "nobody:1", "--emotion", "angry"]) == 2


def test_mesh_parallel_synthesis_matches_single_device(synth):
    """Data-parallel synthesis over the 8-virtual-device mesh: batches pad
    to the data-axis size, shard, and produce the same mels/waveforms as the
    unsharded path (fp32, so exact up to XLA reduction order)."""
    from emotts.parallel.mesh import make_mesh
    from emotts.utils.config import MeshConfig

    cfg, s = synth
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=1))
    s2 = Synthesizer(cfg, s.fs2_variables, s.vocoder_params,
                     s.intensity_bank, g2p=s.g2p, mesh=mesh)
    s2.vocoder = s.vocoder
    s2._voc_fn = jax.jit(s2._vocode)

    ids = s.text_to_phoneme_ids("the mesh speaks")
    speakers = np.array([0, 1, 0], np.int32)  # 3 rows → pads to 4
    inten = np.stack([s.intensity_for(int(sp), 2, 1, len(ids))
                      for sp in speakers])
    mel1, lens1 = s.synthesize_mels(ids, speakers, inten)
    mel2, lens2 = s2.synthesize_mels(ids, speakers, inten)
    assert mel2.shape[0] == 4 and int(np.asarray(lens2)[3]) == 0  # padded row
    np.testing.assert_array_equal(np.asarray(lens1), np.asarray(lens2)[:3])
    np.testing.assert_allclose(
        np.asarray(mel1), np.asarray(mel2)[:3], rtol=1e-5, atol=1e-5
    )
    w1 = np.asarray(jax.device_get(s.vocode(mel1)))
    w2 = np.asarray(jax.device_get(s2.vocode(mel2)))[:3]
    np.testing.assert_allclose(w1, w2, atol=1)  # int16 PCM, ±1 LSB

    out = s2.intensity_sweep("the mesh speaks")
    assert len(out) == cfg.n_speakers * 3 * cfg.inference.bucket_size
    for v in out.values():
        assert np.isfinite(v).all()


def test_continuous_intensity_interpolation(synth):
    """Fractional levels lerp between bucket prototypes; scale multiplies;
    out-of-range clamps; neutral stays zero (fine-grained control beyond the
    reference's discrete levels, fastspeech2/inference.py:12-21)."""
    cfg, s = synth
    p0 = s.intensity_for(1, 2, 0, 4)
    p1 = s.intensity_for(1, 2, 1, 4)
    np.testing.assert_allclose(
        s.intensity_for(1, 2, 0.5, 4), 0.5 * (p0 + p1), rtol=1e-6
    )
    np.testing.assert_allclose(
        s.intensity_for(1, 2, 0.25, 4), 0.75 * p0 + 0.25 * p1, rtol=1e-5
    )
    np.testing.assert_array_equal(s.intensity_for(1, 2, 99.0, 4), p1)
    np.testing.assert_allclose(
        s.intensity_for(1, 2, 1, 4, scale=2.0), 2.0 * p1, rtol=1e-6
    )
    assert (s.intensity_for(1, 0, 0.5, 4, scale=3.0) == 0).all()
    wav_lo = s.synthesize_text("Try it.", 1, 2, level=0.0)
    wav_mid = s.synthesize_text("Try it.", 1, 2, level=0.5)
    assert not np.array_equal(wav_lo, wav_mid)


def test_synthesize_requests_batches_across_requests(synth):
    """A batch of heterogeneous requests (different speakers/emotions/levels)
    produces per-request waveforms identical to serving each request alone —
    segments from different requests share device batches."""
    cfg, s = synth
    reqs = [
        {"text": "One short line.", "speaker": 0, "emotion": 1, "level": 0},
        {"text": "Two lines here. Second one!", "speaker": 1, "emotion": 2,
         "level": 1, "scale": 1.5},
        {"text": "Third request speaks.", "speaker": 1, "emotion": 0},
    ]
    outs = s.synthesize_requests(reqs, gap_s=0.05)
    assert len(outs) == 3
    for wav in outs:
        assert wav.dtype == np.float32 and len(wav) > 0
    solo = [
        s.synthesize_text(r["text"], r["speaker"], r["emotion"],
                          level=r.get("level", 0),
                          intensity_scale=r.get("scale", 1.0), gap_s=0.05)
        for r in reqs
    ]
    for batched, alone in zip(outs, solo):
        np.testing.assert_array_equal(batched, alone)


def test_synthesize_requests_rejects_empty_text(synth):
    cfg, s = synth
    with pytest.raises(ValueError):
        s.synthesize_requests([{"text": "   ", "speaker": 0, "emotion": 1}])


def test_speaker_blend_one_hot_matches_id_path(synth):
    """One-hot blend weights through the weights@table path reproduce the
    integer-id embedding lookup bit-for-bit (same mel)."""
    cfg, s = synth
    ids = s.text_to_phoneme_ids("hello world")
    inten = np.zeros((2, len(ids), cfg.n_emotions), np.float32)
    mel_id, lens_id = s.synthesize_mels(ids, np.array([0, 1]), inten)
    onehot = np.eye(cfg.n_speakers, dtype=np.float32)[[0, 1]]
    phon, spk_w, inten_d = s._bucket_pad(ids, onehot, inten)
    mel_w, lens_w = s._mel_fn(
        s.fs2_variables, phon, spk_w, inten_d,
        max_mel_len=cfg.fastspeech2.max_mel_len,
        pace=1.0, pitch_rate=1.0, energy_rate=1.0,
    )
    np.testing.assert_array_equal(np.asarray(lens_id), np.asarray(lens_w))
    np.testing.assert_allclose(
        np.asarray(mel_id), np.asarray(mel_w), rtol=0, atol=1e-6
    )


def test_emotion_mix_conditioning(synth):
    """intensity_for_mix: single-entry mix == intensity_for; a 50/50 mix is
    the average of the two prototypes; neutral contributes zeros."""
    cfg, s = synth
    pure = s.intensity_for(1, 2, 1.0, 4)
    mix1 = s.intensity_for_mix(1, [(2, 1.0, 1.0)], 4)
    np.testing.assert_allclose(mix1, pure, atol=1e-7)
    half = s.intensity_for_mix(1, [(1, 0.0, 0.5), (2, 0.0, 0.5)], 4)
    expect = 0.5 * (s._proto(1, 1, 0.0) + s._proto(1, 2, 0.0))
    np.testing.assert_allclose(half[0], expect, atol=1e-7)
    with_neutral = s.intensity_for_mix(1, [(0, 0.0, 0.5), (2, 0.0, 0.5)], 4)
    np.testing.assert_allclose(with_neutral[0], 0.5 * s._proto(1, 2, 0.0),
                               atol=1e-7)
    # blended speaker blends the per-speaker prototype banks
    w = np.array([0.25, 0.75], np.float32)
    sp = s.intensity_for_mix(w, [(2, 0.0, 1.0)], 4)
    np.testing.assert_allclose(
        sp[0], 0.25 * s._proto(0, 2, 0.0) + 0.75 * s._proto(1, 2, 0.0),
        atol=1e-7)


def test_synthesize_text_with_mixes(synth):
    """End-to-end long-form synthesis with blended speaker AND emotion.

    The difference assertion runs at the MEL level: the untrained test
    vocoder collapses distinct mels to near-identical int16 PCM, so
    waveform equality is not a valid probe here."""
    cfg, s = synth
    text = "The quick brown fox."
    ids = s.text_to_phoneme_ids(text)
    inten_pure = s.intensity_for(0, 2, 1.0, len(ids))[None]
    inten_mix = s.intensity_for_mix(
        np.array([0.5, 0.5], np.float32),
        [(1, 1.0, 0.5), (2, 1.0, 0.5)], len(ids))[None]
    mel_pure, _ = s.synthesize_mels(ids, np.array([0]), inten_pure)
    mel_mix, _ = s.synthesize_mels(
        ids, np.array([[0.5, 0.5]], np.float32), inten_mix)
    assert not np.allclose(np.asarray(mel_pure), np.asarray(mel_mix))
    mixed = s.synthesize_text(
        text, 0, 2, level=1.0,
        speaker_mix=[(0, 0.5), (1, 0.5)],
        emotion_mix=[(1, 1.0, 0.5), (2, 1.0, 0.5)],
    )
    assert np.isfinite(mixed).all() and len(mixed) > 0
    # a batch mixing pure and blended rows still works (one weights dispatch)
    outs = s.synthesize_requests([
        {"text": text, "speaker": 1, "emotion": 2, "level": 1.0},
        {"text": text, "speaker": 0, "emotion": 0,
         "speaker_mix": [(0, 0.3), (1, 0.7)],
         "emotion_mix": [(1, 0.0, 0.4), (2, 1.0, 0.6)]},
    ])
    assert len(outs) == 2 and all(np.isfinite(o).all() for o in outs)


def test_synthesize_ssml(synth):
    """SSML-lite end-to-end: spans with voice/emotion/rate/phoneme/break
    render to one finite waveform; the explicit break adds its silence."""
    cfg, s = synth
    markup = (
        'Plain span. <voice name="b"><emotion name="angry" level="1">'
        "Angry bea span.</emotion></voice>"
        '<break time="400ms"/>'
        '<prosody rate="1.3">A faster span.</prosody>'
        '<phoneme ph="HH AH0 L OW1">hello</phoneme>'
    )
    wav = s.synthesize_ssml(markup, speaker=0, emotion=1)
    assert np.isfinite(wav).all() and len(wav) > 0
    sr = cfg.audio.sampling_rate
    no_break = s.synthesize_ssml(
        markup.replace('<break time="400ms"/>', ""), speaker=0, emotion=1)
    # the break contributes ~0.4 s of extra output (span gaps differ by one)
    assert len(wav) - len(no_break) >= int(0.3 * sr)
    from emotts.text.ssml import SSMLError
    with pytest.raises(SSMLError):
        s.synthesize_ssml('<voice name="nobody">x</voice>')
    with pytest.raises(SSMLError):
        s.synthesize_ssml('<break time="1s"/>')  # nothing to speak


def test_phoneme_request_input(synth):
    """Raw-ARPABET requests bypass G2P and match the equivalent id path."""
    cfg, s = synth
    from emotts.text.vocab import phoneme_to_sequence

    phones = ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]
    out = s.synthesize_requests(
        [{"phonemes": " ".join(phones), "speaker": 1, "emotion": 2,
          "level": 1.0}]
    )[0]
    assert np.isfinite(out).all() and len(out) > 0
    ids = np.asarray(phoneme_to_sequence(phones), np.int32)
    inten = s.intensity_for(1, 2, 1.0, len(ids))[None]
    mel, lens = s.synthesize_mels(ids, np.array([1]), inten)
    assert len(out) == int(np.asarray(lens)[0]) * cfg.audio.hop_length


def test_ssml_cli(synth, tmp_path, monkeypatch):
    cfg, s = synth
    import emotts.infer.synthesize as syn_mod
    from emotts.utils.config import save_config
    from emotts.cli.main import main

    cfg.inference.output_path = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    ssml_path = tmp_path / "in.ssml"
    ssml_path.write_text(
        'Hello. <voice name="b">Other voice.</voice><break time="250ms"/>')
    monkeypatch.setattr(syn_mod, "load_synthesizer", lambda c, **kw: s)
    rc = main(["synthesize", "--config", cfg_path,
               "--ssml-file", str(ssml_path),
               "--speaker", "a", "--emotion", "amused"])
    assert rc == 0
    assert (tmp_path / "out" / "ssml.wav").exists()
    # malformed markup → clean error exit
    ssml_path.write_text("<nope>x</nope>")
    assert main(["synthesize", "--config", cfg_path,
                 "--ssml-file", str(ssml_path)]) == 2


def test_ssml_rate_direction(synth):
    """SSML rate is a SPEED multiplier: rate>1 must yield FEWER samples
    (FS2 pace multiplies durations, so the mapping is pace/rate)."""
    cfg, s = synth
    slow = s.synthesize_ssml('<prosody rate="0.7">A sentence here.</prosody>')
    fast = s.synthesize_ssml('<prosody rate="1.5">A sentence here.</prosody>')
    base = s.synthesize_ssml("A sentence here.")
    assert len(fast) < len(base) < len(slow)
    from emotts.text.ssml import SSMLError
    with pytest.raises(SSMLError):
        s.synthesize_ssml('<prosody rate="0">x</prosody>')


def test_speaker_mix_duplicates_accumulate(synth):
    """Repeated mix entries sum instead of overwriting."""
    cfg, s = synth
    text = "Hello."
    a = s.synthesize_text(text, 0, 2, speaker_mix=[(0, 0.3), (1, 0.4),
                                                   (0, 0.3)])
    b = s.synthesize_text(text, 0, 2, speaker_mix=[(0, 0.6), (1, 0.4)])
    np.testing.assert_array_equal(a, b)


def test_invalid_phoneme_request_rejected(synth):
    cfg, s = synth
    with pytest.raises(ValueError, match="non-ARPABET"):
        s.synthesize_requests(
            [{"phonemes": "HH AH0 QQ", "speaker": 0, "emotion": 0}])


def test_vocode_chunking_matches_single_dispatch(synth):
    """Oversized batches are vocoded in equal row-chunks of one compiled
    shape (inference.vocode_row_frames) with bit-identical PCM — the fix
    for the round-4 campaign OOM (a 52x512-frame single dispatch compiled
    to a 23.25G program on a 15.75G chip)."""
    cfg, s = synth
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((7, 24, cfg.audio.n_mels)).astype(np.float32)

    whole = np.asarray(jax.device_get(s.vocode(mel, row_frame_budget=0)))
    # budget 60 at t=24 allows 2 rows/chunk (48 row-frames); every dispatch
    # must honor the budget — ceil(b/n_chunks) alone overshot it (3x24=72)
    seen = []
    inner = s._voc_fn
    s._voc_fn = lambda p, m: (seen.append(tuple(m.shape)), inner(p, m))[1]
    try:
        chunked = np.asarray(jax.device_get(s.vocode(mel, row_frame_budget=60)))
    finally:
        s._voc_fn = inner
    assert chunked.shape == whole.shape
    np.testing.assert_array_equal(chunked, whole)
    assert len(set(seen)) == 1, seen  # one compiled shape
    assert all(b_ * t_ <= 60 for (b_, t_, _) in seen), seen

    # config default drives the same path
    cfg.inference.vocode_row_frames = 60
    via_cfg = np.asarray(jax.device_get(s.vocode(mel)))
    np.testing.assert_array_equal(via_cfg, whole)
    cfg.inference.vocode_row_frames = 16384

    # a batch under the budget stays a single dispatch (shape preserved)
    small = np.asarray(jax.device_get(s.vocode(mel[:2])))
    np.testing.assert_array_equal(small, whole[:2])

    # a single row longer than the budget dispatches alone (never dropped)
    lone = np.asarray(jax.device_get(s.vocode(mel[:3], row_frame_budget=10)))
    np.testing.assert_array_equal(lone, whole[:3])

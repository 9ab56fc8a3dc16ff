"""Streaming vocoder tests (emotts/infer/streaming.py): chunked vocoding is
lossless, stream_text yields playable chunks, and the --stream CLI works."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emotts.infer.streaming import stream_text, vocode_streaming
from emotts.nn.hifigan import HiFiGANGenerator

from tests.test_synthesis import synth  # noqa: F401  (module-scoped fixture)


def test_vocode_streaming_bitexact():
    """Chunk-vocoded PCM equals the unchunked vocode bit for bit, with the
    full V1 kernel/dilation/rate geometry (receptive field ≈14 mel frames;
    default halo 16)."""
    voc = HiFiGANGenerator(in_channels=8, upsample_initial_channel=32)
    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))
    fn = jax.jit(lambda p, m: voc.apply(p, m))
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 150, 8)).astype(np.float32)
    )
    full = np.asarray(fn(params, mel))
    streamed = np.concatenate(
        list(vocode_streaming(fn, params, mel, hop=256, chunk_frames=48)),
        axis=1,
    )
    assert streamed.shape == full.shape
    np.testing.assert_array_equal(streamed, full)


def test_vocode_streaming_odd_tail():
    """Stream lengths not divisible by chunk_frames emit a short final chunk
    and still reconstruct exactly."""
    voc = HiFiGANGenerator(
        in_channels=4, upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    params = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 4)))
    fn = jax.jit(lambda p, m: voc.apply(p, m))
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 37, 4)).astype(np.float32)
    )
    full = np.asarray(fn(params, mel))
    chunks = list(vocode_streaming(fn, params, mel, hop=256, chunk_frames=16))
    assert [c.shape[1] for c in chunks] == [16 * 256, 16 * 256, 5 * 256]
    np.testing.assert_array_equal(np.concatenate(chunks, axis=1), full)


def test_stream_text_matches_content_vocode(synth):  # noqa: F811
    """Each sentence's streamed audio equals unchunked vocoding of its
    content-trimmed mel; chunk boundaries are inaudible by construction."""
    cfg, s = synth
    chunks = list(
        stream_text(s, "The fox ran.", speaker_id=1, emotion_id=2, level=1,
                    chunk_frames=8)
    )
    streamed = np.concatenate(chunks)
    ids = s.text_to_phoneme_ids("The fox ran.")
    inten = s.intensity_for(1, 2, 1, len(ids))[None]
    mel, lens = s.synthesize_mels(ids, np.array([1], np.int32), inten)
    n = int(np.asarray(lens)[0])
    pcm = np.asarray(jax.device_get(s.vocode(mel[:, :n])))
    ref = pcm[0].astype(np.float32) / 32767.0
    assert streamed.shape == ref.shape
    np.testing.assert_array_equal(streamed, ref)


def test_stream_text_fused_first_chunk_paths(synth):  # noqa: F811
    """The fused FS2+first-window program serves the first chunk when the
    sentence is long enough (content ≥ chunk+halo), and the short-sentence
    fallback re-vocodes content-trimmed — both bit-equal to the reference
    unchunked vocode."""
    cfg, s = synth

    def ref_wave(text):
        ids = s.text_to_phoneme_ids(text)
        inten = s.intensity_for(1, 2, 1, len(ids))[None]
        mel, lens = s.synthesize_mels(ids, np.array([1], np.int32), inten)
        n = int(np.asarray(lens)[0])
        pcm = np.asarray(jax.device_get(s.vocode(mel[:, :n])))
        return pcm[0].astype(np.float32) / 32767.0, n

    calls = []
    real_first = s.synthesize_first_chunk
    s.synthesize_first_chunk = (  # spy: count fused dispatches
        lambda *a, **k: calls.append(k["window"]) or real_first(*a, **k)
    )
    try:
        # long path: content ≥ chunk+halo ⇒ the fused PCM serves chunk 0
        # and vocode_streaming resumes from start_frame=chunk
        text = "The fox ran over the hill."
        ref, n = ref_wave(text)
        assert n >= 4 + 16, "test premise: content must cover chunk+halo"
        streamed = np.concatenate(
            list(stream_text(s, text, speaker_id=1, emotion_id=2, level=1,
                             chunk_frames=4))
        )
        np.testing.assert_array_equal(streamed, ref)
        assert len(calls) == 1

        # short path: window larger than the content → fused PCM discarded,
        # content-trimmed fallback vocode (still exact, still one FS2 pass)
        ref, n = ref_wave("Go.")
        big = min(cfg.fastspeech2.max_mel_len, n + 64)
        assert n < big
        streamed = np.concatenate(
            list(stream_text(s, "Go.", speaker_id=1, emotion_id=2, level=1,
                             chunk_frames=big - 16, halo_frames=16))
        )
        np.testing.assert_array_equal(streamed, ref)
        assert len(calls) == 2
    finally:
        s.synthesize_first_chunk = real_first


def test_stream_text_multi_sentence_gaps(synth):  # noqa: F811
    cfg, s = synth
    gap = int(0.1 * cfg.audio.sampling_rate)
    chunks = list(
        stream_text(s, "One two. Three four!", speaker_id=0, emotion_id=1,
                    gap_s=0.1, chunk_frames=8)
    )
    wav = np.concatenate(chunks)
    assert wav.dtype == np.float32 and len(wav) > gap
    # exactly one gap chunk of silence between the two sentences
    gap_chunks = [c for c in chunks if c.size == gap and not c.any()]
    assert len(gap_chunks) == 1


def test_stream_text_requires_vocoder(synth):  # noqa: F811
    cfg, s = synth
    from emotts.infer.synthesize import Synthesizer

    bare = Synthesizer(cfg, s.fs2_variables, None, s.intensity_bank, g2p=s.g2p)
    with pytest.raises(RuntimeError):
        next(stream_text(bare, "hello.", 0, 0))


def test_stream_cli(synth, tmp_path, monkeypatch):  # noqa: F811
    cfg, s = synth
    import emotts.infer.synthesize as syn_mod
    from emotts.cli.main import main
    from emotts.utils.config import save_config

    cfg.inference.output_path = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)
    text_path = tmp_path / "story.txt"
    text_path.write_text("A tiny tale. It streams well!")
    monkeypatch.setattr(syn_mod, "load_synthesizer", lambda c, **kw: s)
    rc = main(["synthesize", "--config", cfg_path,
               "--text-file", str(text_path), "--stream",
               "--speaker", "b", "--emotion", "angry", "--level", "1"])
    assert rc == 0
    import emotts.audio.wavio as wavio

    data, sr = wavio.read_wav(str(tmp_path / "out" / "longform_b_angry_1.wav"))
    assert sr == cfg.audio.sampling_rate and len(data) > 0


def test_generator_halo_covers_structure():
    """The structure-derived halo must cover the receptive field for
    non-V1 generators (review finding: DEFAULT_HALO was V1-tuned)."""
    from emotts.infer.streaming import generator_halo_frames

    v1 = HiFiGANGenerator()
    h_v1 = generator_halo_frames(v1)
    assert 14 <= h_v1 <= 20  # matches the measured ~14-frame V1 RF + margin

    big = HiFiGANGenerator(
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5, 7),) * 3,  # extra dilation step
    )
    h_big = generator_halo_frames(big)
    assert h_big > h_v1

    # exactness holds with the derived halo on a non-V1 structure
    gen = HiFiGANGenerator(
        in_channels=4, upsample_initial_channel=16,
        resblock_kernel_sizes=(11,), resblock_dilations=((1, 3, 5, 7),),
    )
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)))
    fn = jax.jit(lambda p, m: gen.apply(p, m))
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 120, 4)).astype(np.float32)
    )
    full = np.asarray(fn(params, mel))
    halo = generator_halo_frames(gen)
    streamed = np.concatenate(
        list(vocode_streaming(fn, params, mel, hop=256, chunk_frames=40,
                              halo_frames=halo)), axis=1)
    np.testing.assert_array_equal(streamed, full)

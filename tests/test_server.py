"""HTTP serving frontend tests (emotts/infer/server.py) over tiny models.

Real sockets, real HTTP: the server runs in a thread on a free port and the
tests speak urllib against it — health, full-wav synthesis, name/id
resolution, input validation, the chunked-PCM streaming path, and the
bucket-batched /batch endpoint.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.infer.server import make_server
from emotts.infer.synthesize import Synthesizer
from emotts.nn.hifigan import HiFiGANGenerator
from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables
from emotts.utils.config import Config


def _tiny_stack():
    """(cfg, synth) — the tiny FS2+vocoder serving stack the tests share."""
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
    voc_params = voc.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, cfg.audio.n_mels)))
    bank = np.random.default_rng(0).standard_normal((2, 3, 2, 3)).astype(
        np.float32
    )
    synth = Synthesizer(cfg, variables, voc_params, bank)
    synth.vocoder = voc
    synth._voc_fn = jax.jit(synth._vocode)
    return cfg, synth


def _serve(cfg, synth, **kw):
    httpd = make_server(cfg, synth, port=0, **kw)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


@pytest.fixture(scope="module")
def served():
    cfg, synth = _tiny_stack()
    httpd, base = _serve(cfg, synth)
    yield cfg, base
    httpd.shutdown()
    httpd.server_close()


def _post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def _wav_samples(data: bytes):
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        return np.frombuffer(w.readframes(w.getnframes()), "<i2"), \
            w.getframerate()


def test_health(served):
    cfg, base = served
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["speakers"] == ["a", "b"]
    assert info["sample_rate"] == cfg.audio.sampling_rate
    assert info["vocoder"] is True


def test_synthesize_returns_wav(served):
    cfg, base = served
    with _post(base, "/synthesize",
               {"text": "Hello there.", "speaker": "a",
                "emotion": "amused", "level": 1}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        pcm, sr = _wav_samples(r.read())
    assert sr == cfg.audio.sampling_rate
    assert len(pcm) > sr // 10  # at least 100 ms of audio came back


def test_name_and_id_equivalent(served):
    _, base = served
    a = _wav_samples(_post(base, "/synthesize",
                           {"text": "Same.", "speaker": "b",
                            "emotion": 2}).read())[0]
    b = _wav_samples(_post(base, "/synthesize",
                           {"text": "Same.", "speaker": 1,
                            "emotion": "angry"}).read())[0]
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("bad", [
    {"speaker": "a", "emotion": "amused"},               # no text
    {"text": "x", "speaker": "nope", "emotion": 0},       # unknown speaker
    {"text": "x", "speaker": 0, "emotion": 99},           # emotion range
])
def test_validation_errors_are_400(served, bad):
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/synthesize", bad)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())


def test_streaming_chunked_pcm(served):
    cfg, base = served
    with _post(base, "/synthesize",
               {"text": "Stream me now. Second sentence here.",
                "speaker": "a", "emotion": "angry", "stream": True}) as r:
        assert r.headers["Content-Type"] == "audio/L16"
        assert int(r.headers["X-Sample-Rate"]) == cfg.audio.sampling_rate
        data = r.read()  # urllib reassembles the chunked body
    pcm = np.frombuffer(data, "<i2")
    assert len(pcm) > cfg.audio.sampling_rate // 10


def test_batch_shares_buckets(served):
    cfg, base = served
    reqs = [
        {"text": "One short line.", "speaker": "a", "emotion": "amused",
         "level": 1},
        {"text": "Another line entirely.", "speaker": "b",
         "emotion": "angry", "level": 0, "intensity_scale": 1.2},
    ]
    with _post(base, "/batch", {"requests": reqs}) as r:
        out = json.loads(r.read())
    assert out["sample_rate"] == cfg.audio.sampling_rate
    assert len(out["wavs_b64"]) == 2
    for b64 in out["wavs_b64"]:
        pcm, _ = _wav_samples(base64.b64decode(b64))
        assert len(pcm) > 0
    # batch result equals the single-request result for the same input
    single = _wav_samples(_post(base, "/synthesize", reqs[0]).read())[0]
    batched = _wav_samples(base64.b64decode(out["wavs_b64"][0]))[0]
    np.testing.assert_array_equal(single, batched)


def test_blended_controls(served):
    """speaker_mix / emotion_mix fields synthesize successfully (names map
    through the same resolver as pure requests)."""
    cfg, base = served
    with _post(base, "/synthesize",
               {"text": "Blend me.", "level": 1,
                "speaker_mix": {"a": 0.5, "b": 0.5},
                "emotion_mix": {"amused": 0.6, "angry": 0.4}}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        pcm, _ = _wav_samples(r.read())
    assert len(pcm) > 0 and np.isfinite(pcm).all()


def test_blend_validation_errors(served):
    _, base = served
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/synthesize",
              {"text": "x", "speaker_mix": {"nobody": 1.0},
               "emotion": "amused"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/synthesize",
              {"text": "x", "speaker_mix": ["a", 1.0], "emotion": "amused"})
    assert e.value.code == 400


def test_ssml_endpoint(served):
    """/synthesize with 'ssml' renders span-level controls to one wav."""
    cfg, base = served
    body = {"ssml": ('Hi there. <voice name="b"><emotion name="angry" '
                     'level="1">Span.</emotion></voice>'
                     '<break time="200ms"/><prosody rate="1.2">Quick.'
                     "</prosody>"),
            "speaker": "a", "emotion": "amused"}
    with _post(base, "/synthesize", body) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        pcm, sr = _wav_samples(r.read())
    assert sr == cfg.audio.sampling_rate and len(pcm) > 0

    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/synthesize", {"ssml": "<blink>no</blink>"})
    assert e.value.code == 400


def test_microbatch_concurrent_load(served):
    """16 concurrent /synthesize clients coalesce into a handful of engine
    dispatches (the TPU throughput statement: device work drops >=3x vs the
    one-call-per-request serialized path) and every response is bit-equal
    to its solo serialized result."""
    cfg, _ = served

    # two fresh servers over ONE shared tiny stack: serialized (batching
    # disabled) as the reference, and a wide-window batched one so all
    # concurrent arrivals deterministically join one collection window
    cfg2, synth = _tiny_stack()
    ser_httpd, ser_base = _serve(cfg2, synth, microbatch_window_ms=-1)
    bat_httpd, bat_base = _serve(cfg2, synth, microbatch_window_ms=100.0)
    try:
        reqs = [
            {"text": f"Load test line {i}.",
             "speaker": ["a", "b"][i % 2],
             "emotion": ["amused", "angry", "neutral"][i % 3],
             "level": i % 2}
            for i in range(16)
        ]

        # solo references (also compiles the b=1 shapes)
        solo = [_wav_samples(_post(ser_base, "/synthesize", r).read())[0]
                for r in reqs]

        def hammer(n_expected):
            out = [None] * len(reqs)

            def worker(i):
                out[i] = _wav_samples(
                    _post(bat_base, "/synthesize", reqs[i]).read()
                )[0]

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(len(reqs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert all(o is not None for o in out)
            return out

        hammer(len(reqs))  # warmup: compiles the batched shapes

        # counted run: wrap the shared engine entry point
        calls = []
        real = synth.synthesize_requests

        def counting(requests, **kw):
            calls.append(len(requests))
            return real(requests, **kw)

        synth.synthesize_requests = counting
        try:
            got = hammer(len(reqs))
        finally:
            synth.synthesize_requests = real

        # coalescing: 16 requests -> at most 5 engine calls (>=3.2x fewer
        # device round trips than the serialized path's 16)
        assert sum(calls) == len(reqs)
        assert len(calls) <= 5, calls
        # per-request correctness: batched == solo, bit-exact
        for i, (a, b) in enumerate(zip(solo, got)):
            np.testing.assert_array_equal(a, b, err_msg=f"request {i}")
    finally:
        for httpd in (ser_httpd, bat_httpd):
            httpd.shutdown()
            httpd.server_close()


def test_microbatch_groups_by_prosody_rates(served):
    """pace/pitch/energy rates are jit-static: concurrent requests with
    different rates split into one engine call per rate tuple, each with
    the right rates applied."""
    from emotts.infer.server import TTSService

    cfg, synth = _tiny_stack()
    svc = TTSService(cfg, synth, microbatch_window_ms=100.0)

    calls = []
    real = synth.synthesize_requests

    def counting(requests, **kw):
        calls.append((len(requests), kw["pace"]))
        return real(requests, **kw)

    synth.synthesize_requests = counting
    try:
        reqs = [
            {"text": "Rate group one.", "speaker": "a", "emotion": "amused"},
            {"text": "Rate group two.", "speaker": "a", "emotion": "amused",
             "pace": 1.25},
            {"text": "Rate group one again.", "speaker": "b",
             "emotion": "angry"},
        ]
        out = [None] * len(reqs)

        def worker(i):
            out[i] = svc.synthesize(reqs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        synth.synthesize_requests = real

    assert all(o is not None for o in out)
    assert sorted(calls) == [(1, 1.25), (2, 1.0)]
    # the pace=1.25 request really used its own rate
    solo = synth.synthesize_text("Rate group two.", 0, 1, pace=1.25)
    np.testing.assert_array_equal(out[1], solo)


def test_stream_and_batch_reject_unsupported(served):
    """Validation surfaces as clean 400s: streaming with mixes/ssml fails
    BEFORE the chunked response starts, /batch rejects ssml, and
    ssml+mix conflicts are named."""
    _, base = served
    import urllib.error
    for body in (
        {"stream": True, "text": "hi", "speaker_mix": {"a": 1.0},
         "emotion": "amused"},
        {"stream": True, "ssml": "hi"},
        {"ssml": "Hello.", "speaker_mix": {"a": 0.5, "b": 0.5}},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/synthesize", body)
        assert e.value.code == 400, body
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/batch",
              {"requests": [{"ssml": "Hello.", "speaker": "a",
                             "emotion": "amused"}]})
    assert e.value.code == 400

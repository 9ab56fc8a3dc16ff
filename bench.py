"""End-to-end synthesis benchmark (BASELINE.json config 5).

Measures the RTF-critical path on one chip: batched FastSpeech2 inference
(full-size: 6+6 FFT layers, d=384) + full-size HiFi-GAN V1 vocoding for the
reference's demo sweep (4 speakers × 5 emotions × 3 intensity levels = 60
utterances in ONE device batch), bf16 matmuls.

Prints one JSON line: e2e synthesis RTF per chip.  ``vs_baseline`` is the
BASELINE.md target (0.01 RTF) divided by the measured RTF (>1 = better than
target; the PyTorch reference publishes no numbers of its own, SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: the synthesis graph compiles through the
# remote-TPU tunnel in ~10 min cold; warm runs start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def wait_for_device(max_wait_s: float = 2400.0, probe_timeout_s: float = 90.0,
                    interval_s: float = 120.0) -> None:
    """Block until a JAX backend answers, polling in a subprocess.

    The axon tunnel can be down for stretches (see BENCH_NOTES.md); a bare
    ``jax.devices()`` then hangs *in-process* with no recourse.  Probing in
    a killable subprocess lets the benchmark wait for recovery instead of
    hanging opaquely, and fail loudly (non-zero exit, message on stderr —
    never a fake metric line) if the tunnel stays dead past ``max_wait_s``.
    CPU runs (JAX_PLATFORMS=cpu) skip the probe.
    """
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] device reachable after {attempt} probes",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(
                f"[bench] no JAX device after {max_wait_s:.0f}s "
                "(axon tunnel down?) — aborting without a metric",
                file=sys.stderr,
            )
            raise SystemExit(2)
        print(f"[bench] device probe {attempt} failed; retrying in "
              f"{interval_s:.0f}s", file=sys.stderr)
        time.sleep(interval_s)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from emotts.nn.hifigan import HiFiGANGenerator
    from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables
    from emotts.utils.config import Config

    cfg = Config()
    # 256-frame capacity ≈ 4.1 s per utterance — the demo-sentence bucket
    # (the reference sentence is ~3-4 s); every padded frame is genuinely
    # synthesized, so audio seconds are counted at capacity.
    cfg.fastspeech2.max_mel_len = 256
    n_phones = 64  # ~ the reference demo sentence after G2P
    batch = cfg.n_speakers * cfg.n_emotions * cfg.inference.bucket_size  # 60

    from emotts.nn.fastspeech2 import FastSpeech2

    compute_dtype = jnp.bfloat16
    cfg.fastspeech2.intensity_dim = cfg.n_emotions
    model = FastSpeech2(cfg.fastspeech2, n_speakers=cfg.n_speakers, dtype=compute_dtype)
    variables = init_fs2_variables(cfg, model, seed=0)

    # fastest measured variant: sub-pixel upsampling + polyphase-packed
    # narrow MRF stages (BENCH_NOTES.md)
    vocoder = HiFiGANGenerator(
        in_channels=cfg.audio.n_mels, time_packed_resblocks=True
    )
    voc_params = vocoder.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels))
    )

    rng = np.random.default_rng(0)
    phonemes = jnp.asarray(rng.integers(1, 80, (batch, n_phones)).astype(np.int32))
    speakers = jnp.asarray(
        (np.arange(batch) % cfg.n_speakers).astype(np.int32)
    )
    intensity = jnp.asarray(
        rng.standard_normal((batch, n_phones, cfg.n_emotions)).astype(np.float32)
    )

    # whole-batch vocoding: at 256-frame capacity the activations fit HBM and
    # avoiding lax.map serialization is ~22% faster (measured; BENCH_NOTES.md)
    voc_chunk = 60

    @jax.jit
    def synth(variables, voc_params, phonemes, speakers, intensity):
        preds = model.apply(
            variables, phonemes, speakers, intensity=intensity,
            max_mel_len=cfg.fastspeech2.max_mel_len,
        )
        mel, mel_lens = preds[0], preds[7]
        chunks = mel.astype(compute_dtype).reshape(
            batch // voc_chunk, voc_chunk, *mel.shape[1:]
        )
        wav = jax.lax.map(lambda m: vocoder.apply(voc_params, m), chunks)
        return wav.reshape(batch, -1), mel_lens

    # warmup / compile (device_get forces a real execution round trip —
    # block_until_ready alone under-reports on the tunneled axon platform)
    for _ in range(2):
        wav, mel_lens = synth(variables, voc_params, phonemes, speakers, intensity)
    jax.device_get(mel_lens)

    # timed runs: chain n_iters async dispatches and sync ONCE — a per-iter
    # device_get costs a ~25 ms tunnel round trip (measured; see
    # benchmarks/vocoder_profile.py::_sync_ms) that would inflate every
    # iteration.  The single trailing sync amortizes to ~1 ms/iter.
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        wav, mel_lens = synth(variables, voc_params, phonemes, speakers, intensity)
    jax.device_get(mel_lens)
    wall = (time.perf_counter() - t0) / n_iters

    # audio seconds synthesized per pass: every frame of the static capacity
    # is computed and vocoded (batch × max_mel_len × hop / sr)
    audio_secs = (
        batch * cfg.fastspeech2.max_mel_len * cfg.audio.hop_length
        / cfg.audio.sampling_rate
    )
    rtf = wall / audio_secs
    target = 0.01

    print(
        json.dumps(
            {
                "metric": "e2e_synthesis_rtf_per_chip",
                "value": rtf,
                "unit": "rtf",
                "vs_baseline": target / rtf,
            }
        )
    )


def _artifact_synthesizer(cfg):
    """Build a Synthesizer through the real artifact path (best-params
    export + intensity bank + vocoder npz written to disk, then loaded the
    way the CLI loads them).  Returns (synthesizer, artifact_load_secs)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from emotts.infer.synthesize import Synthesizer, save_vocoder_params_npz, \
        load_vocoder_checkpoint
    from emotts.nn.hifigan import HiFiGANGenerator
    from emotts.train.checkpoint import CheckpointManager, load_best_params
    from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables

    root = tempfile.mkdtemp(prefix="emotts_bench_")
    model = build_fastspeech2(cfg)
    variables = init_fs2_variables(cfg, model, seed=0)
    mgr = CheckpointManager(f"{root}/fs2_exp")
    mgr.save_best(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    mgr.close()
    rng = np.random.default_rng(0)
    bank = rng.standard_normal(
        (cfg.n_speakers, cfg.n_emotions, cfg.inference.bucket_size, cfg.n_emotions)
    ).astype(np.float32)
    np.save(f"{root}/intensity.npy", bank)
    vocoder = HiFiGANGenerator(in_channels=cfg.audio.n_mels)
    voc = vocoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))
    save_vocoder_params_npz(
        jax.tree_util.tree_map(np.asarray, voc), f"{root}/vocoder.npz"
    )

    t_load = time.perf_counter()
    fs2_vars = load_best_params(f"{root}/fs2_exp")
    voc_params = load_vocoder_checkpoint(f"{root}/vocoder.npz", cfg)
    voc_params = jax.tree_util.tree_map(jnp.asarray, voc_params)
    synth = Synthesizer(
        cfg,
        jax.tree_util.tree_map(jnp.asarray, fs2_vars),
        voc_params,
        np.load(f"{root}/intensity.npy"),
    )
    return synth, time.perf_counter() - t_load


def bench_ttfa() -> None:
    """Streaming serving latency: warm time-to-first-audio for one sentence
    through `emotts.infer.streaming.stream_text` (FastSpeech2 forward on the
    sentence bucket + the first vocoder chunk + host transfer — includes the
    real per-dispatch tunnel latency, which a served request also pays).

    Run via ``python bench.py --ttfa``."""
    from emotts.infer.streaming import stream_text
    from emotts.utils.config import Config

    cfg = Config()
    cfg.fastspeech2.max_mel_len = 256
    cfg.fastspeech2.intensity_dim = cfg.n_emotions
    synth, _ = _artifact_synthesizer(cfg)
    text = cfg.inference.text
    chunk = 32  # frames → 512 ms of audio per chunk

    def run_once():
        t0 = time.perf_counter()
        gen = stream_text(synth, text, 1, 2, level=1, chunk_frames=chunk)
        first = next(gen)
        ttfa = time.perf_counter() - t0
        n = first.size
        for piece in gen:
            n += piece.size
        total = time.perf_counter() - t0
        return ttfa, total, n

    run_once()  # compile all chunk shapes
    runs = [run_once() for _ in range(10)]
    ttfas = sorted(r[0] for r in runs)
    sr = cfg.audio.sampling_rate
    print(
        json.dumps(
            {
                "metric": "streaming_time_to_first_audio",
                "value": ttfas[len(ttfas) // 2] * 1000.0,
                "unit": "ms",
                "ttfa_min_ms": ttfas[0] * 1000.0,
                "full_sentence_ms": np.median([r[1] for r in runs]) * 1000.0,
                "audio_secs": runs[0][2] / sr,
                "chunk_frames": chunk,
                "note": "warm; single sentence, FS2 + first vocoder chunk + host transfer",
            }
        )
    )


def bench_cli_path() -> None:
    """Time the REAL user synthesis path (reference: fastspeech2/inference.py
    :40-84): experiment artifacts loaded from disk (best FS2 checkpoint,
    intensity.npy bank, converted vocoder .npz), G2P on the demo sentence,
    the whole intensity sweep batched through both models, and the waveform
    batch transferred back to the host.  Reports capacity- and content-RTF.

    Run via ``python bench.py --cli-path``; not the driver headline (which
    must stay a single JSON line)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from emotts.infer.synthesize import Synthesizer, save_vocoder_params_npz, \
        load_vocoder_checkpoint
    from emotts.nn.hifigan import HiFiGANGenerator
    from emotts.train.checkpoint import CheckpointManager, load_best_params
    from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables
    from emotts.utils.config import Config

    cfg = Config()
    cfg.fastspeech2.max_mel_len = 256
    cfg.fastspeech2.intensity_dim = cfg.n_emotions

    root = tempfile.mkdtemp(prefix="emotts_bench_")
    # experiment fixture: best-params export + intensity bank + vocoder npz,
    # exactly the artifact set a trained run leaves behind
    model = build_fastspeech2(cfg)
    variables = init_fs2_variables(cfg, model, seed=0)
    mgr = CheckpointManager(f"{root}/fs2_exp")
    mgr.save_best(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    mgr.close()
    rng = np.random.default_rng(0)
    bank = rng.standard_normal(
        (cfg.n_speakers, cfg.n_emotions, cfg.inference.bucket_size, cfg.n_emotions)
    ).astype(np.float32)
    np.save(f"{root}/intensity.npy", bank)
    vocoder = HiFiGANGenerator(in_channels=cfg.audio.n_mels)
    voc = vocoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))
    save_vocoder_params_npz(
        jax.tree_util.tree_map(np.asarray, voc), f"{root}/vocoder.npz"
    )

    t_load = time.perf_counter()
    fs2_vars = load_best_params(f"{root}/fs2_exp")
    voc_params = load_vocoder_checkpoint(f"{root}/vocoder.npz", cfg)
    voc_params = jax.tree_util.tree_map(jnp.asarray, voc_params)
    synth = Synthesizer(
        cfg,
        jax.tree_util.tree_map(jnp.asarray, fs2_vars),
        voc_params,
        np.load(f"{root}/intensity.npy"),
    )
    t_load = time.perf_counter() - t_load

    text = cfg.inference.text
    out = synth.intensity_sweep(text)  # warmup + compile
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = synth.intensity_sweep(text)
    wall = (time.perf_counter() - t0) / n_iters

    hop, sr = cfg.audio.hop_length, cfg.audio.sampling_rate
    content_secs = sum(len(w) for w in out.values()) / sr
    capacity_secs = len(out) * cfg.fastspeech2.max_mel_len * hop / sr
    print(
        json.dumps(
            {
                "metric": "cli_synthesis_rtf_per_chip",
                "value": wall / capacity_secs,
                "unit": "rtf",
                "vs_baseline": 0.01 / (wall / capacity_secs),
                "content_rtf": wall / max(content_secs, 1e-9),
                "content_audio_secs": content_secs,
                "wall_ms_per_sweep": wall * 1000.0,
                "artifact_load_secs": t_load,
                "n_wavs": len(out),
                "note": "full user path: ckpt load + G2P + sweep + host wav transfer",
            }
        )
    )


if __name__ == "__main__":
    import sys

    wait_for_device()
    if "--cli-path" in sys.argv:
        bench_cli_path()
    elif "--ttfa" in sys.argv:
        bench_ttfa()
    else:
        main()

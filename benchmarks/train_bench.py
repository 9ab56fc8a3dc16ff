"""Training-step throughput benchmarks (BASELINE.json configs 2 and 4).

Measures steps/sec, mel-frames/sec/chip, and an MFU estimate for:
* the rank model's mixup forward/backward (full-size model; reference
  budget rank_model/parameter.yaml:41-46), and
* the FastSpeech2 teacher-forced train step with the fused frozen-extractor
  intensity bridge (full-size model; fastspeech2/parameter.yaml:42-47).

Synthetic fixed-shape batches (bucket 512 frames / 96 phones), bf16 compute.
Timing: N async-dispatched steps chained through the carried train state,
ONE device_get at the end — a per-step sync costs a ~25 ms tunnel round
trip on the axon platform (see benchmarks/vocoder_profile.py::_sync_ms).
Prints one JSON line per config.  Each config runs at the reference batch
size (8) and a TPU-shaped batch (64).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e bf16 peak; used only for the MFU column
_PEAK_TFLOPS = 197.0


def _timed_steps(step, state, *args, n=100):
    """Chain n steps through the carried state; sync once at the end.

    The pre-t0 step is SYNCED so its device time cannot leak into the timed
    window (an unsynced dispatch there would make every reported step ~1/n
    slower than reality).

    n=100: with a short chain (n=20) the first dispatches race the device
    through the remote tunnel and the device idles ~2 ms/step waiting for
    the host to catch up (measured: FS2 B=8 16.9 ms at n=20 vs 14.6 ms at
    n=200 with identical graphs).  Steady-state training dispatches
    continuously, so the long chain is the honest number."""
    import jax

    state, m = step(state, *args)
    jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, *args)
    jax.device_get(m)
    return (time.perf_counter() - t0) / n, state


def _flops_per_step(step, *args) -> float:
    """XLA's own FLOP count for the compiled step (0.0 if unavailable)."""
    import jax

    try:
        compiled = jax.jit(step).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_rank(cfg, mesh, batch_size) -> dict:
    import jax

    from emotts.parallel.mesh import shard_batch
    from emotts.train.rank_trainer import RankTrainer

    cfg.train_rank.batch_size = batch_size
    trainer = RankTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    b, t, c = batch_size, 512, cfg.audio.n_mels + 2
    batch = {
        "emo_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "neu_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "emotions": rng.integers(1, cfg.n_emotions, b).astype(np.int32),
        "lengths": np.full((b,), t, np.int32),
    }
    sharded = shard_batch(mesh, batch)
    step = trainer._train_step
    trainer.state, m = step(trainer.state, dict(sharded))
    jax.device_get(m)  # compile + sync
    dt, trainer.state = _timed_steps(step, trainer.state, dict(sharded))
    flops = _flops_per_step(step, trainer.state, dict(sharded))
    return {
        "metric": "rank_train_step",
        "value": b * t / dt,
        "unit": "mel-frames/sec/chip",
        "steps_per_sec": 1.0 / dt,
        "step_ms": dt * 1000.0,
        "batch": b,
        "frames": t,
        "mfu": (flops / dt) / (_PEAK_TFLOPS * 1e12) if flops else None,
    }


def bench_fs2(cfg, mesh, batch_size) -> dict:
    import jax

    from emotts.parallel.mesh import shard_batch
    from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
    from emotts.train.rank_trainer import build_rank_model, init_rank_params

    cfg.train_fs2.batch_size = batch_size
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(cfg, extractor_params_from_rank(rank_params), mesh=mesh)
    rng = np.random.default_rng(0)
    b, p, t = batch_size, 96, 512
    durations = np.full((b, p), t // p, np.int32)
    batch = {
        "phonemes": rng.integers(1, 80, (b, p)).astype(np.int32),
        "durations": durations,
        "mel": rng.standard_normal((b, t, cfg.audio.n_mels)).astype(np.float32),
        "pitch": rng.standard_normal((b, t)).astype(np.float32),
        "energy": rng.standard_normal((b, t)).astype(np.float32),
        "rank_x": rng.standard_normal((b, t, cfg.audio.n_mels + 2)).astype(np.float32),
        "phon_len": np.full((b,), p, np.int32),
        "mel_len": np.full((b,), t, np.int32),
        "speakers": rng.integers(0, cfg.n_speakers, b).astype(np.int32),
        "emotions": rng.integers(0, cfg.n_emotions, b).astype(np.int32),
    }
    sharded = shard_batch(mesh, batch)

    def step(state, batch):
        return trainer._train_step(state, trainer.extractor_params, batch)

    trainer.state, m = step(trainer.state, dict(sharded))
    jax.device_get(m)
    dt, trainer.state = _timed_steps(step, trainer.state, dict(sharded))
    flops = _flops_per_step(step, trainer.state, dict(sharded))
    return {
        "metric": "fs2_train_step",
        "value": b * t / dt,
        "unit": "mel-frames/sec/chip",
        "steps_per_sec": 1.0 / dt,
        "step_ms": dt * 1000.0,
        "batch": b,
        "frames": t,
        "mfu": (flops / dt) / (_PEAK_TFLOPS * 1e12) if flops else None,
    }


def bench_vocoder(cfg, mesh, batch_size) -> dict:
    """Full-size HiFi-GAN GAN step (V1 generator + paper-size MPD/MSD):
    D update + G update, one jitted program."""
    import jax

    from emotts.parallel.mesh import shard_batch
    from emotts.train.vocoder_trainer import VocoderTrainer

    vc = cfg.train_vocoder
    vc.batch_size = batch_size
    trainer = VocoderTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    b, s = batch_size, trainer.segment_samples
    batch = {"y": rng.standard_normal((b, s)).astype(np.float32) * 0.1}
    sharded = shard_batch(mesh, batch)

    gs, ds, m = trainer._train_step(trainer.gen_state, trainer.disc_state,
                                    dict(sharded))
    jax.device_get(m)  # compile + sync
    gs, ds, m = trainer._train_step(gs, ds, dict(sharded))
    jax.device_get(m)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        gs, ds, m = trainer._train_step(gs, ds, dict(sharded))
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / n
    flops = _flops_per_step(trainer._train_step_fn, gs, ds, dict(sharded))
    sr = cfg.audio.sampling_rate
    n_chips = mesh.size  # global batch / time is aggregate; report per chip
    return {
        "metric": "vocoder_train_step",
        "value": b * s / sr / dt / n_chips,
        "unit": "audio-sec/sec/chip",
        "steps_per_sec": 1.0 / dt,
        "step_ms": dt * 1000.0,
        "batch": b,
        "segment_samples": s,
        "mfu": (flops / dt) / (_PEAK_TFLOPS * 1e12) if flops else None,
    }


def main() -> None:
    import sys

    import jax

    from emotts.parallel.mesh import make_mesh
    from emotts.utils.config import Config

    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = Config()
    # pin the A/B baseline: the config default is auto (TPU && batch>=32
    # enables the Pallas kernel), which would contaminate the XLA side
    cfg.rank_model.fused_attention = False
    cfg.fastspeech2.fused_attention = False
    if "--fused-attention" in sys.argv:
        # head-to-head vs the XLA attention: same models, Pallas kernel on
        cfg.rank_model.fused_attention = True
        cfg.fastspeech2.fused_attention = True
        print(json.dumps({"variant": "fused_attention"}))
    if "--no-dense-groups" in sys.argv:
        # A/B: XLA's native grouped-conv lowering in the MSD
        cfg.train_vocoder.disc_dense_groups = False
        print(json.dumps({"variant": "grouped_msd"}))
    if "--msd-group-merge" in sys.argv:
        # A/B: partial block-diagonal merge (m groups -> one conv group,
        # m× MACs; disc_dense_groups is the m=16 point) in the full GAN step
        m = int(sys.argv[sys.argv.index("--msd-group-merge") + 1])
        cfg.train_vocoder.msd_group_merge = m
        print(json.dumps({"variant": f"msd_group_merge_{m}"}))
    if "--mpd-fold" in sys.argv:
        # A/B: selective period-axis batch folding for the larger MPD
        # periods inside the full GAN step (disc_profile.py found p∈{5,7}
        # win in isolation; the full-step winner sets the config default)
        periods = [int(p) for p in
                   sys.argv[sys.argv.index("--mpd-fold") + 1].split(",")]
        cfg.train_vocoder.mpd_fold_periods = periods
        print(json.dumps({"variant": f"mpd_fold_{periods}"}))
    only_rank = "--rank-only" in sys.argv
    only_fs2 = "--fs2-only" in sys.argv
    only_vocoder = "--vocoder-only" in sys.argv
    if only_rank or not (only_fs2 or only_vocoder):
        for batch in (8, 64):
            print(json.dumps(bench_rank(cfg, mesh, batch)))
    if not (only_vocoder or only_rank):
        for batch in (8, 64):
            print(json.dumps(bench_fs2(cfg, mesh, batch)))
    if not (only_fs2 or only_rank):
        print(json.dumps(bench_vocoder(cfg, mesh, 16)))


if __name__ == "__main__":
    main()

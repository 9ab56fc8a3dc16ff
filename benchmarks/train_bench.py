"""Training-step throughput benchmarks (BASELINE.json configs 2 and 4).

Measures steps/sec and mel-frames/sec/chip for:
* the rank model's mixup forward/backward (batch 8, full-size model), and
* the FastSpeech2 teacher-forced train step with the fused frozen-extractor
  intensity bridge (batch 8, full-size model).

Synthetic fixed-shape batches (bucket 512 frames / 96 phones), bf16 compute.
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_rank(cfg, mesh) -> dict:
    import jax

    from emotts.parallel.mesh import shard_batch
    from emotts.train.rank_trainer import RankTrainer

    trainer = RankTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    b, t, c = cfg.train_rank.batch_size, 512, cfg.audio.n_mels + 2
    batch = {
        "emo_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "neu_x": rng.standard_normal((b, t, c)).astype(np.float32),
        "emotions": rng.integers(1, cfg.n_emotions, b).astype(np.int32),
        "lengths": np.full((b,), t, np.int32),
    }
    sharded = shard_batch(mesh, batch)
    trainer.state, m = trainer._train_step(trainer.state, dict(sharded))
    jax.device_get(m)  # full round trip; block_until_ready under-reports on axon
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        trainer.state, m = trainer._train_step(trainer.state, dict(sharded))
        jax.device_get(m)
    dt = (time.perf_counter() - t0) / n
    return {
        "metric": "rank_train_step",
        "value": b * t / dt,
        "unit": "mel-frames/sec/chip",
        "steps_per_sec": 1.0 / dt,
        "batch": b,
        "frames": t,
    }


def bench_fs2(cfg, mesh) -> dict:
    import jax

    from emotts.parallel.mesh import shard_batch
    from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
    from emotts.train.rank_trainer import build_rank_model, init_rank_params

    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(cfg, extractor_params_from_rank(rank_params), mesh=mesh)
    rng = np.random.default_rng(0)
    b, p, t = cfg.train_fs2.batch_size, 96, 512
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
    trainer.state, m = trainer._train_step(
        trainer.state, trainer.extractor_params, dict(sharded)
    )
    jax.device_get(m)  # full round trip; block_until_ready under-reports on axon
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        trainer.state, m = trainer._train_step(
            trainer.state, trainer.extractor_params, dict(sharded)
        )
        jax.device_get(m)
    dt = (time.perf_counter() - t0) / n
    return {
        "metric": "fs2_train_step",
        "value": b * t / dt,
        "unit": "mel-frames/sec/chip",
        "steps_per_sec": 1.0 / dt,
        "batch": b,
        "frames": t,
    }


def main() -> None:
    from emotts.parallel.mesh import make_mesh
    from emotts.utils.config import Config

    import jax

    cfg = Config()
    mesh = make_mesh(devices=jax.devices()[:1])
    print(json.dumps(bench_rank(cfg, mesh)))
    print(json.dumps(bench_fs2(cfg, mesh)))


if __name__ == "__main__":
    main()

"""Op-level TPU profile of a train step (FS2 / rank / vocoder).

Captures a jax.profiler trace of N chained steps on the real chip, parses
the raw xplane proto, and prints per-op self time aggregated by HLO op
name — the tool that found the fp32-extractor and SSIM-conv regressions
(BENCH_NOTES.md).  Layout copies show up as ``copy`` / ``transpose`` /
``bitcast-convert`` fusions; optimizer traffic as the big ``fusion`` ops
whose name carries ``adam``/``update``.

Run (default axon env, real TPU):
    python tools/profile_step.py --step fs2 --batch 8
    python tools/profile_step.py --step fs2 --batch 8 --contains copy
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_fs2(cfg, mesh, batch_size):
    from emotts.parallel.mesh import shard_batch
    from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
    from emotts.train.rank_trainer import build_rank_model, init_rank_params

    cfg.train_fs2.batch_size = batch_size
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(cfg, extractor_params_from_rank(rank_params), mesh=mesh)
    rng = np.random.default_rng(0)
    b, p, t = batch_size, 96, 512
    batch = {
        "phonemes": rng.integers(1, 80, (b, p)).astype(np.int32),
        "durations": np.full((b, p), t // p, np.int32),
        "mel": rng.standard_normal((b, t, cfg.audio.n_mels)).astype(np.float32),
        "pitch": rng.standard_normal((b, t)).astype(np.float32),
        "energy": rng.standard_normal((b, t)).astype(np.float32),
        "rank_x": rng.standard_normal((b, t, cfg.audio.n_mels + 2)).astype(
            np.float32
        ),
        "phon_len": np.full((b,), p, np.int32),
        "mel_len": np.full((b,), t, np.int32),
        "speakers": rng.integers(0, cfg.n_speakers, b).astype(np.int32),
        "emotions": rng.integers(0, cfg.n_emotions, b).astype(np.int32),
    }
    sharded = shard_batch(mesh, batch)

    def step(state, _batch=dict(sharded)):
        return trainer._train_step(state, trainer.extractor_params, dict(_batch))

    return step, trainer.state


def build_rank(cfg, mesh, batch_size):
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

    def step(state, _batch=dict(sharded)):
        return trainer._train_step(state, dict(_batch))

    return step, trainer.state


def build_vocoder(cfg, mesh, batch_size):
    from emotts.parallel.mesh import shard_batch
    from emotts.train.vocoder_trainer import VocoderTrainer

    cfg.train_vocoder.batch_size = batch_size
    trainer = VocoderTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = {"y": rng.standard_normal(
        (batch_size, trainer.segment_samples)).astype(np.float32) * 0.1}
    sharded = shard_batch(mesh, batch)

    # fold (gen, disc) into one pytree so the generic step-driver below can
    # thread a single "state" through chained steps
    def step(state, _batch=dict(sharded)):
        gs, ds, m = trainer._train_step(state[0], state[1], dict(_batch))
        return (gs, ds), m

    return step, (trainer.gen_state, trainer.disc_state)


def parse_xplane(logdir: str, n_steps: int):
    """Aggregate device-plane self time by op name. Returns [(us, name)]."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(Path(logdir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane under {logdir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(paths[-1].read_bytes())
    totals = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        # only XLA op lines (not steps/modules); self time per leaf event
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # exact match: 'Async XLA Ops' carries overlapped DMA durations
            # that would double-count against compute self time
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e6 / n_steps  # -> us/step
    return sorted(((us, n) for n, us in totals.items()), reverse=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", choices=["fs2", "rank", "vocoder"],
                    default="fs2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=35)
    ap.add_argument("--contains", default=None,
                    help="only print ops whose name matches this regex")
    args = ap.parse_args()

    import jax

    from emotts.parallel.mesh import make_mesh
    from emotts.utils.config import Config

    cfg = Config()
    mesh = make_mesh(devices=jax.devices()[:1])
    build = {"fs2": build_fs2, "rank": build_rank,
             "vocoder": build_vocoder}[args.step]
    step, state = build(cfg, mesh, args.batch)

    state, m = step(state)
    jax.device_get(m)  # compile + sync
    logdir = tempfile.mkdtemp(prefix="emotts_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, m = step(state)
        jax.device_get(m)

    rows = parse_xplane(logdir, args.steps)
    total = sum(us for us, _ in rows)
    print(f"device self time: {total / 1e3:.2f} ms/step "
          f"({args.step}, B={args.batch}, {args.steps} steps)")
    pat = re.compile(args.contains) if args.contains else None
    shown = 0
    for us, name in rows:
        if pat and not pat.search(name):
            continue
        print(f"  {us:9.1f} us  {us / total:6.2%}  {name[:110]}")
        shown += 1
        if shown >= args.top:
            break
    if pat:
        sel = sum(us for us, n in rows if pat.search(n))
        print(f"matched total: {sel / 1e3:.3f} ms/step ({sel / total:.2%})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

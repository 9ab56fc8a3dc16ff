"""Subprocess worker for the real multi-process integration test.

Launched by tests/test_multiprocess.py as one process of an
``jax.distributed`` SPMD job (2 processes x 4 virtual CPU devices each).
Every process builds the SAME FS2Trainer (seeded init, identical config),
plans the SAME global batches through the process-sharded BucketLoader,
loads only its own rows, assembles global arrays via
``make_array_from_process_local_data`` (emotts/parallel/mesh.py:66), and
drives real pjit train steps.  The parent asserts the per-step losses are
identical across processes (lockstep SPMD) and equal to a single-process
run on the same 8-device topology.

The reference has no distributed support at all (SURVEY.md SS2.3); this
exercises the rebuild's multi-host path end-to-end, which unit tests with
mocked process counts cannot.
"""

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    a = ap.parse_args()

    import jax

    if a.nprocs > 1:
        jax.distributed.initialize(
            a.coord, num_processes=a.nprocs, process_id=a.pid
        )

    from emotts.parallel.mesh import shard_batch
    from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
    from emotts.train.rank_trainer import build_rank_model, init_rank_params
    from emotts.utils.config import load_config

    cfg = load_config(a.config)
    rank_params = init_rank_params(cfg, build_rank_model(cfg), 0)
    trainer = FS2Trainer(cfg, extractor_params_from_rank(rank_params))

    loader = trainer._loader("train", shuffle=False)
    losses = []
    it = iter(loader.epoch(0))
    for _ in range(a.steps):
        batch = next(it)
        db = shard_batch(trainer.mesh, trainer._device_batch(batch))
        trainer.state, metrics = trainer._train_step(
            trainer.state, trainer.extractor_params, db
        )
        losses.append(float(jax.device_get(metrics["total_loss"])))

    result = {
        "pid": a.pid,
        "nprocs": a.nprocs,
        "n_global_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "step": int(jax.device_get(trainer.state.step)),
        "losses": losses,
    }
    with open(a.out, "w") as f:
        json.dump(result, f)
    print(f"[mp_fs2_worker pid={a.pid}] ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()

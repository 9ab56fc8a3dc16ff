"""Intensity-prototype bucketization.

Produces the controllable conditioning bank consumed at synthesis time
(reference: rank_model/inference.py:11-119): the trained rank model scores
every training utterance with λ≡1 (pure emotional input); per (speaker,
emotion) the utterances are sorted by rank score, their frame-level
intensity vectors concatenated, split into `bucket_size` contiguous chunks
and averaged — yielding prototypes of shape
(n_speakers, n_emotions, bucket_size, n_emotions) saved as ``intensity.npy``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emotts.data.datasets import RankPairDataset, collate_rank_pairs
from emotts.data.loader import BucketLoader
from emotts.train.rank_trainer import build_rank_model
from emotts.parallel.mesh import make_mesh, shard_batch
from emotts.utils.config import Config


def compute_intensity_prototypes(
    cfg: Config,
    params,
    mesh=None,
    split: str = "train",
) -> np.ndarray:
    """Run the rank model over the split and build the prototype bank."""
    mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
    model = build_rank_model(cfg, dtype=jnp.float32)
    # checkpoint-loaded params live on the default device; batches shard
    # over the mesh — replicate explicitly or jit rejects the device mix
    from emotts.parallel.mesh import replicated

    params = jax.device_put(params, replicated(mesh))
    bucket_size = cfg.inference.bucket_size
    n_spk, n_emo = cfg.n_speakers, cfg.n_emotions

    @jax.jit
    def forward(params, batch):
        b = batch["emo_x"].shape[0]
        lambdas = jnp.ones((2, b))
        preds = model.apply(
            params,
            batch["emo_x"],
            batch["neu_x"],
            batch["emotions"],
            batch["lengths"],
            lambdas,
        )
        return preds[2], preds[6]  # I_i (B, T, n_emo), r_i (B,)

    loader = BucketLoader(
        RankPairDataset(cfg, split),
        buckets=cfg.bucketing.frame_buckets,
        batch_size=cfg.train_rank.batch_size,
        collate=collate_rank_pairs,
        shuffle=False,
        drop_last=False,
    )

    from emotts.parallel.mesh import data_axis_size, round_up_to_multiple

    data_size = data_axis_size(mesh)
    storage: Dict[Tuple[int, int], List[Tuple[float, np.ndarray]]] = {}
    for batch in loader.epoch(0):
        b_true = batch["emo_x"].shape[0]
        if b_true % data_size:
            # zero-pad rows so the final partial batch shards evenly; padded
            # rows are sliced off below (never duplicated into the bank)
            b_pad = round_up_to_multiple(b_true, data_size)
            batch = {
                k: np.concatenate(
                    [v, np.zeros((b_pad - b_true, *v.shape[1:]), v.dtype)]
                )
                if isinstance(v, np.ndarray) else v
                for k, v in batch.items()
            }
        sharded = shard_batch(mesh, batch)
        intensity, scores = jax.device_get(forward(params, sharded))
        for i in range(b_true):
            t = int(batch["lengths"][i])
            key = (int(batch["speakers"][i]), int(batch["emotions"][i]))
            storage.setdefault(key, []).append(
                (float(scores[i]), intensity[i, :t, :])
            )

    prototypes = np.zeros((n_spk, n_emo, bucket_size, n_emo), dtype=np.float32)
    for (si, ei), entries in storage.items():
        entries.sort(key=lambda x: x[0])
        all_feats = np.concatenate([fr for _, fr in entries], axis=0)
        for bi, idxs in enumerate(np.array_split(np.arange(len(all_feats)), bucket_size)):
            if len(idxs):
                prototypes[si, ei, bi] = all_feats[idxs].mean(axis=0)
    return prototypes


def bucketize(cfg: Config, exp_path: Optional[str] = None, mesh=None) -> str:
    """Load best rank params from an experiment and save intensity.npy."""
    from emotts.train.checkpoint import load_best_params
    from emotts.train.rank_trainer import init_rank_params

    if exp_path is None:
        exp_path = os.path.join(
            cfg.data.experiment_path, "rank_model", cfg.inference.rank_exp
        )
    model = build_rank_model(cfg, dtype=jnp.float32)
    template = init_rank_params(cfg, model, 0)
    params = load_best_params(exp_path, template)
    prototypes = compute_intensity_prototypes(cfg, params, mesh=mesh)
    out_path = os.path.join(exp_path, "intensity.npy")
    np.save(out_path, prototypes)
    return out_path

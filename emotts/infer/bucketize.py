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
    return_storage: bool = False,
):
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

    bank = _bank_from_storage(storage, n_spk, n_emo, bucket_size)
    return (bank, storage) if return_storage else bank


def spread_significance(
    storage,
    n_spk: int,
    n_emo: int,
    bucket_size: int,
    n_perm: int = 20,
    seed: int = 0,
    bank: Optional[np.ndarray] = None,
) -> Dict:
    """Observed level-prototype spread vs its random-bucketing null.

    The absolute spread number is scale-dependent (few utterances per cell
    ⇒ large incidental spread even with a random sort), so the usable-axis
    question is whether sorting by rank score separates levels MORE than a
    random utterance order does.  Returns the observed spread, the null
    mean/p95 over ``n_perm`` permutations, and their ratio."""
    from emotts.eval.intensity_eval import prototype_spread

    observed = prototype_spread(
        _bank_from_storage(storage, n_spk, n_emo, bucket_size)
        if bank is None else bank  # caller may pass the bank it just built
    )
    rng = np.random.default_rng(seed)
    null = []
    for _ in range(n_perm):
        sp = prototype_spread(
            _bank_from_storage(storage, n_spk, n_emo, bucket_size, order=rng)
        )
        if sp is not None:
            null.append(sp["mean_pairwise_over_norm"])
    out = {
        "observed": None if observed is None
        else observed["mean_pairwise_over_norm"],
        "null_mean": round(float(np.mean(null)), 5) if null else None,
        "null_p95": round(float(np.percentile(null, 95)), 5) if null else None,
        "n_perm": n_perm,
    }
    if out["observed"] is not None and out["null_mean"]:
        out["ratio_over_null_mean"] = round(out["observed"] / out["null_mean"], 4)
    return out


def _bank_from_storage(
    storage: Dict[Tuple[int, int], List[Tuple[float, np.ndarray]]],
    n_spk: int,
    n_emo: int,
    bucket_size: int,
    order: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Prototype bank from per-cell (score, frames) entries.  Default order
    is the reference's sort-by-rank-score; passing a Generator instead
    shuffles the utterances — the permutation NULL used to judge whether the
    sorted bank's level spread exceeds what random bucketing produces."""
    prototypes = np.zeros((n_spk, n_emo, bucket_size, n_emo), dtype=np.float32)
    for (si, ei), entries in storage.items():
        if order is None:
            entries = sorted(entries, key=lambda x: x[0])
        else:
            entries = [entries[i] for i in order.permutation(len(entries))]
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
    prototypes, storage = compute_intensity_prototypes(
        cfg, params, mesh=mesh, return_storage=True
    )
    out_path = os.path.join(exp_path, "intensity.npy")
    np.save(out_path, prototypes)
    # sidecar: is the sorted bank's level spread more than random bucketing
    # produces?  Consumed by the intensity-efficacy eval's verdict gate.
    import json

    meta = spread_significance(
        storage, cfg.n_speakers, cfg.n_emotions, cfg.inference.bucket_size,
        bank=prototypes,
    )
    with open(os.path.join(exp_path, "intensity_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_path

"""Rank-model trainer: jitted train/eval steps + epoch loop.

End-to-end slice covering the reference's rank training driver
(rank_model/train.py:19-262): AdamW, epoch loop with early stopping on
validation loss, deterministic λ=linspace validation, per-epoch TensorBoard
scalars and a t-SNE artifact, best-checkpoint export.

TPU design:
* one jit-compiled train step per frame bucket (static shapes), params
  replicated over the mesh, batch sharded on the data axis — XLA inserts the
  gradient all-reduce over ICI;
* mixup sampling and dropout run on-device from a per-step folded PRNG key;
* state is donated into the step so HBM is not double-buffered.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emotts.data.datasets import RankPairDataset, collate_rank_pairs
from emotts.data.loader import BucketLoader
from emotts.losses.rank import rank_loss
from emotts.nn.intensity import RankModel
from emotts.parallel.mesh import make_mesh, shard_batch
from emotts.train.checkpoint import CheckpointManager
from emotts.train.metrics import EpochAverager, MetricsWriter, StepTimer
from emotts.train.state import TrainState, create_train_state, make_optimizer
from emotts.utils.config import Config
from emotts.utils.experiment import increment_path, set_seed
from emotts.utils.plotting import DEFAULT_COLORS, DEFAULT_MARKERS, plot_tsne


def build_rank_model(cfg: Config, dtype=None, batch_size=None) -> RankModel:
    from emotts.ops.attention import resolve_fused_attention

    rm = cfg.rank_model
    if dtype is None:
        dtype = jnp.dtype(cfg.train_rank.compute_dtype)
    return RankModel(
        n_mels=cfg.audio.n_mels,
        n_heads=rm.n_heads,
        n_emotions=cfg.n_emotions,
        n_layers=rm.n_encoder_layers,
        hidden_dim=rm.hidden_dim,
        kernel_size=rm.kernel_size,
        ffn_mult=rm.ffn_mult,
        dropout=rm.dropout,
        remat=rm.remat,
        fused_attention=resolve_fused_attention(rm.fused_attention,
                                                batch_size),
        dtype=dtype,
    )


def init_rank_params(cfg: Config, model: RankModel, seed: int = 0):
    c = cfg.audio.n_mels + 2
    dummy = jnp.zeros((1, 8, c), jnp.float32)
    return model.init(
        {"params": jax.random.PRNGKey(seed), "mixup": jax.random.PRNGKey(1)},
        dummy, dummy, jnp.zeros((1,), jnp.int32), jnp.full((1,), 8, jnp.int32),
    )


class RankTrainer:
    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.model = build_rank_model(cfg,
                                      batch_size=cfg.train_rank.batch_size)
        self.tx = make_optimizer(cfg.train_rank)
        params = init_rank_params(cfg, self.model, cfg.train_rank.seed)
        # heavy weights shard over the model axis (no-op layout at model=1);
        # the optimizer state inherits the placement from the params
        from emotts.parallel.tp import shard_params_tp

        from emotts.parallel.tp import state_shardings

        params = shard_params_tp(params, self.mesh)
        state = create_train_state(
            params, self.tx, cfg.train_rank.seed, rng_impl=cfg.train_rank.rng_impl
        )
        self._state_sh = state_shardings(state, self.mesh)
        self.state = jax.device_put(state, self._state_sh)
        alpha, beta = cfg.rank_model.alpha, cfg.rank_model.beta

        def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
            rngs = state.next_rngs("mixup", "dropout")

            def loss_fn(params):
                preds = self.model.apply(
                    params,
                    batch["emo_x"],
                    batch["neu_x"],
                    batch["emotions"],
                    batch["lengths"],
                    None,
                    deterministic=False,
                    rngs=rngs,
                )
                return rank_loss(preds, batch["emotions"], alpha, beta)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            )
            return new_state, metrics

        def eval_step(params, batch) -> Tuple[Dict, jnp.ndarray]:
            b = batch["emo_x"].shape[0]
            rv = batch.get("row_valid")
            # 1) reference-parity pass: BOTH branches share the same
            #    λ=linspace row (faithful to rank_model/train.py:92), which
            #    pins the RankNet BCE at ln 2 for any model — kept for
            #    parity, logged as valid/loss etc.
            lambdas = jnp.tile(jnp.linspace(0.0, 1.0, b)[None, :], (2, 1))
            preds = self.model.apply(
                params,
                batch["emo_x"],
                batch["neu_x"],
                batch["emotions"],
                batch["lengths"],
                lambdas,
            )
            # row_valid masks rows duplicated by the loader's
            # pad_to_multiple out of the eval reductions (unbiased,
            # topology-independent validation loss)
            _, metrics = rank_loss(
                preds, batch["emotions"], alpha, beta, row_weights=rv,
            )
            # 2) informative pass: a REAL pair — branch i gets the pure
            #    emotional input (λ≡1), branch j the pure neutral (λ≡0), so
            #    the ranking BCE target is 1 and the metric moves with the
            #    model's actual margin.  valid/pair_order_acc is the held-out
            #    real-pair order accuracy (chance 0.5); valid/loss_informative
            #    is the α/β-weighted loss on this pass and (by default) drives
            #    patience/best-checkpoint selection instead of the pinned
            #    quirk loss.
            lam_pairs = jnp.stack(
                [jnp.ones((b,), jnp.float32), jnp.zeros((b,), jnp.float32)]
            )
            preds_p = self.model.apply(
                params,
                batch["emo_x"],
                batch["neu_x"],
                batch["emotions"],
                batch["lengths"],
                lam_pairs,
            )
            _, m_inf = rank_loss(
                preds_p, batch["emotions"], alpha, beta, row_weights=rv,
            )
            ri = preds_p[6].reshape(-1)
            rj = preds_p[7].reshape(-1)
            order = (ri > rj).astype(jnp.float32)
            w = (jnp.ones_like(order) if rv is None
                 else rv.astype(jnp.float32))
            metrics = dict(metrics)
            metrics["loss_informative"] = m_inf["loss"]
            metrics["mixup_loss_pairs"] = m_inf["mixup_loss"]
            metrics["rank_loss_pairs"] = m_inf["rank_loss"]
            metrics["pair_order_acc"] = (
                (order * w).sum() / jnp.maximum(w.sum(), 1.0)
            )
            return metrics, preds[4]  # pooled h_i

        # out_shardings pinned to the input layout: without it, a size-1
        # model axis lets XLA canonicalize the output specs and the second
        # step recompiles (see emotts.parallel.tp.state_shardings)
        self._train_step = jax.jit(
            train_step, donate_argnums=0, out_shardings=(self._state_sh, None)
        )
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------

    def _loader(self, split: str, shuffle: bool) -> BucketLoader:
        cfg = self.cfg
        return BucketLoader(
            RankPairDataset(cfg, split),
            buckets=cfg.bucketing.frame_buckets,
            batch_size=cfg.train_rank.batch_size,
            collate=collate_rank_pairs,
            shuffle=shuffle,
            seed=cfg.data.split_seed,
            drop_last=shuffle,  # keep all eval data
            # eval partial batches pad (cyclic repeat) to shard over the mesh
            pad_to_multiple=self.mesh.shape[self.mesh.axis_names[0]],
            # multi-host: each process consumes a disjoint plan slice
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    def train_epoch(self, loader: BucketLoader, epoch: int, writer=None) -> Dict:
        avg = EpochAverager()
        timer = StepTimer()
        for batch in loader.epoch(epoch):
            batch = shard_batch(self.mesh, batch)
            self.state, metrics = self._train_step(self.state, batch)
            avg.update(jax.device_get(metrics))
            timer.tick()
        means = avg.means()
        if writer is not None:
            writer.scalars(means, epoch, prefix="train/")
            st = timer.mean_step_time()
            if st:
                writer.scalar("train/step_time_s", st, epoch)
        return means

    def validate_epoch(
        self, loader: BucketLoader, epoch: int, writer=None, exp_path=None
    ) -> Dict:
        avg = EpochAverager()
        h_all, emo_all, spk_all, lam_all = [], [], [], []
        for batch in loader.epoch(epoch):
            sharded = shard_batch(self.mesh, batch)
            metrics, h = self._eval_step(self.state.params, sharded)
            rv = batch.get("row_valid")
            keep = rv > 0 if rv is not None else slice(None)
            w = float(rv.sum()) if rv is not None else 1.0
            avg.update(jax.device_get(metrics), weight=w)
            h_all.append(np.asarray(jax.device_get(h))[keep])
            emo_all.append(batch["emotions"][keep])
            spk_all.append(batch["speakers"][keep])
            lam_all.append(np.linspace(0, 1, len(batch["emotions"]))[keep])
        means = avg.means()
        if writer is not None:
            writer.scalars(means, epoch, prefix="valid/")
        if exp_path is not None and h_all:
            plot_tsne(
                np.concatenate(h_all),
                np.concatenate(emo_all),
                np.concatenate(spk_all),
                np.concatenate(lam_all),
                self.cfg.data.emotions,
                self.cfg.data.speakers,
                DEFAULT_COLORS,
                DEFAULT_MARKERS,
                os.path.join(exp_path, f"tsne_epoch_{epoch}.png"),
            )
        return means

    def restore(self, exp_path: str) -> bool:
        """Resume full train state (params+opt+step+rng) from an experiment's
        latest checkpoint; returns True if one was found.  (The reference has
        no resume at all — weights-only best_model.pth, SURVEY.md §5.)"""
        from emotts.train.state import restore_with_rng_compat

        ckpt = CheckpointManager(exp_path, keep=self.cfg.train_rank.keep_checkpoints)
        restored = restore_with_rng_compat(ckpt, jax.device_get(self.state))
        ckpt.close()
        if restored is None:
            return False
        self.state = jax.device_put(restored, self._state_sh)
        return True

    def fit(
        self,
        exp_path: Optional[str] = None,
        verbose: bool = True,
        resume: bool = False,
    ) -> str:
        """Full training loop; returns the experiment directory."""
        cfg = self.cfg
        set_seed(cfg.train_rank.seed)
        if exp_path is None:
            exp_path = increment_path(
                os.path.join(cfg.data.experiment_path, "rank_model")
            )
        elif resume:
            self.restore(exp_path)
        writer = MetricsWriter(exp_path)
        ckpt = CheckpointManager(exp_path, keep=cfg.train_rank.keep_checkpoints)

        train_loader = self._loader("train", shuffle=True)
        valid_loader = self._loader("test", shuffle=False)

        best_val = float("inf")
        patience = 0
        global_step = 0
        ve = max(1, cfg.train_rank.validate_every_epochs)
        ae = max(1, cfg.train_rank.artifact_every_epochs)
        if cfg.train_rank.debug_nans:
            jax.config.update("jax_debug_nans", True)
        for epoch in range(cfg.train_rank.n_epochs):
            if epoch == cfg.train_rank.profile_epoch:
                with jax.profiler.trace(os.path.join(exp_path, "profile")):
                    train_means = self.train_epoch(train_loader, epoch, writer)
            else:
                train_means = self.train_epoch(train_loader, epoch, writer)
            next_step = global_step + train_loader.batches_per_epoch(epoch)
            # the final epoch always validates so best/ is always exported
            last = (next_step >= cfg.train_rank.max_iterations
                    or epoch == cfg.train_rank.n_epochs - 1)
            if last or (epoch + 1) % ve == 0:
                val_means = self.validate_epoch(
                    valid_loader, epoch, writer,
                    exp_path if (last or (epoch + 1) % ae == 0) else None,
                )
                sel_key = ("loss_informative"
                           if cfg.train_rank.selection_metric == "informative"
                           else "loss")
                val_loss = val_means.get(
                    sel_key, val_means.get("loss", float("inf"))
                )
                if verbose:
                    print(
                        f"[rank] epoch {epoch}: "
                        f"train {train_means.get('loss', 0):.4f} "
                        f"valid {val_means.get('loss', 0):.4f} "
                        f"informative {val_means.get('loss_informative', 0):.4f} "
                        f"pair_acc {val_means.get('pair_order_acc', 0):.3f}"
                    )
                ckpt.save(self.state)
                if val_loss < best_val:
                    best_val = val_loss
                    patience = 0
                    ckpt.save_best(self.state.params)
                else:
                    patience += 1
                    if patience >= cfg.train_rank.patience:
                        break
            global_step = next_step
            if global_step >= cfg.train_rank.max_iterations:
                break
        ckpt.close()
        writer.close()
        return exp_path

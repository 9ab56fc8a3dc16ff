"""FastSpeech2 trainer: teacher-forced steps conditioned on a frozen
IntensityExtractor.

Covers the reference FS2 training driver (fastspeech2/train.py:54-264):
AdamW, per-epoch TB scalars for every loss component, best/last checkpoints,
early stopping, pred-vs-GT mel grids every N epochs, and the train-time
intensity bridge — the frozen rank-model extractor's frame-level output
scatter-meaned to phone level over ground-truth durations
(fastspeech2/train.py:16-51; here a batched segment_mean, no Python loops,
and with the rank_x layout fixed per SURVEY.md §3.6-B1).

TPU design: one jit per (phone, frame) bucket pair; extractor runs inside
the same jit under stop_gradient (no separate no_grad pass, XLA fuses the
whole step); PostNet BatchNorm stats thread through TrainState.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emotts.data.datasets import FS2Dataset, collate_fs2, pick_bucket
from emotts.data.loader import BucketLoader
from emotts.losses.fs2 import fs2_loss
from emotts.nn.fastspeech2 import FastSpeech2
from emotts.nn.intensity import IntensityExtractor
from emotts.nn.length_regulator import segment_mean
from emotts.parallel.mesh import make_mesh, replicate, shard_batch
from emotts.train.checkpoint import CheckpointManager
from emotts.train.metrics import EpochAverager, MetricsWriter, StepTimer
from emotts.train.state import TrainState, create_train_state, make_optimizer
from emotts.utils.config import Config
from emotts.utils.experiment import increment_path, set_seed
from emotts.utils.plotting import plot_mel_grid


def build_fastspeech2(cfg: Config, dtype=None, batch_size=None) -> FastSpeech2:
    import dataclasses

    from emotts.ops.attention import resolve_fused_attention

    # the intensity conditioning vector is the extractor's per-emotion logit,
    # so its width is always n_emotions (cfg default 5 matches EmoV-DB)
    cfg.fastspeech2.intensity_dim = cfg.n_emotions
    if dtype is None:
        dtype = jnp.dtype(cfg.train_fs2.compute_dtype)
    fs2_cfg = dataclasses.replace(
        cfg.fastspeech2,
        fused_attention=resolve_fused_attention(
            cfg.fastspeech2.fused_attention, batch_size),
    )
    return FastSpeech2(fs2_cfg, n_speakers=cfg.n_speakers, dtype=dtype)


def build_intensity_extractor(cfg: Config, dtype=None,
                              batch_size=None) -> IntensityExtractor:
    from emotts.ops.attention import resolve_fused_attention

    rm = cfg.rank_model
    if dtype is None:
        # the extractor is FROZEN during FS2 training (inference-only under
        # stop_gradient), so it runs at the train compute dtype: profiled at
        # bf16 this moves ~3.3 ms/step of f32 convs onto the bf16 MXU path
        # (params stay fp32; only activations cast)
        dtype = jnp.dtype(cfg.train_fs2.compute_dtype)
    return IntensityExtractor(
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


def extractor_params_from_rank(rank_params) -> dict:
    """Slice the IntensityExtractor subtree out of trained RankModel params
    (the reference loads the whole RankModel and keeps .intensity_extractor,
    fastspeech2/train.py:218-221)."""
    return {"params": rank_params["params"]["intensity_extractor"]}


def init_fs2_variables(cfg: Config, model: FastSpeech2, seed: int = 0):
    p, t = 8, 16
    v = model.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.ones((1, p), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.full((1, p), 2, jnp.int32),
        jnp.zeros((1, t), jnp.float32),
        jnp.zeros((1, t), jnp.float32),
        jnp.zeros((1, p, cfg.fastspeech2.intensity_dim), jnp.float32),
        max_mel_len=t,
    )
    # batch_stats is always present so checkpoint templates keep one shape
    # regardless of postnet_style (the speechbrain postnet has no BatchNorm)
    return {"params": v["params"], "batch_stats": dict(v.get("batch_stats", {}))}


class FS2Trainer:
    """``vocoder``/``vocoder_params`` (optional) enable vocoded validation
    samples — the reference dumps 4 pred/GT wavs every 10 epochs
    (fastspeech2/train.py:141-148, util.py:103-119)."""

    def __init__(
        self,
        cfg: Config,
        extractor_params: dict,
        mesh=None,
        vocoder=None,
        vocoder_params=None,
    ):
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self._voc_fn = None
        if vocoder is not None and vocoder_params is not None:
            self._voc_fn = jax.jit(vocoder.apply)
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.model = build_fastspeech2(cfg,
                                       batch_size=cfg.train_fs2.batch_size)
        self.extractor = build_intensity_extractor(
            cfg, batch_size=cfg.train_fs2.batch_size)
        self.extractor_params = replicate(self.mesh, extractor_params)
        self.tx = make_optimizer(cfg.train_fs2)

        variables = init_fs2_variables(cfg, self.model, cfg.train_fs2.seed)
        # heavy weights shard over the model axis (no-op layout at model=1)
        from emotts.parallel.tp import shard_params_tp

        params = shard_params_tp(variables["params"], self.mesh)
        state = create_train_state(
            params,
            self.tx,
            cfg.train_fs2.seed,
            batch_stats=replicate(self.mesh, variables["batch_stats"]),
            rng_impl=cfg.train_fs2.rng_impl,
        )
        from emotts.parallel.tp import state_shardings

        self._state_sh = state_shardings(state, self.mesh)
        self.state = jax.device_put(state, self._state_sh)
        loss_cfg = cfg.loss

        def intensity_rep(ext_params, batch):
            """Frozen extractor → phone-level conditioning (B, P, n_emotions)."""
            frames = self.extractor.apply(
                ext_params, batch["rank_x"], batch["mel_len"], batch["emotions"]
            )  # (B, T, n_emo)
            rep = segment_mean(frames, batch["durations"])  # (B, P, n_emo)
            return jax.lax.stop_gradient(rep)

        def train_step(state: TrainState, ext_params, batch):
            rngs = state.next_rngs("dropout")
            rep = intensity_rep(ext_params, batch)
            max_len = batch["mel"].shape[1]

            def loss_fn(params):
                preds, mutated = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["phonemes"],
                    batch["speakers"],
                    batch["durations"],
                    batch["pitch"],
                    batch["energy"],
                    rep,
                    max_mel_len=max_len,
                    deterministic=False,
                    rngs=rngs,
                    mutable=["batch_stats"],
                )
                total, parts = fs2_loss(
                    preds,
                    batch["mel"],
                    batch["durations"],
                    batch["mel_len"],
                    batch["phon_len"],
                    loss_cfg,
                )
                return total, (parts, mutated["batch_stats"])

            (_, (metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1,
                    params=params,
                    opt_state=opt_state,
                    batch_stats=new_bs,
                ),
                metrics,
            )

        def eval_step(state: TrainState, ext_params, batch):
            rep = intensity_rep(ext_params, batch)
            preds = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["phonemes"],
                batch["speakers"],
                batch["durations"],
                batch["pitch"],
                batch["energy"],
                rep,
                max_mel_len=batch["mel"].shape[1],
            )
            # row_valid masks rows duplicated by the loader's
            # pad_to_multiple out of the eval reductions (unbiased,
            # topology-independent validation loss)
            _, metrics = fs2_loss(
                preds,
                batch["mel"],
                batch["durations"],
                batch["mel_len"],
                batch["phon_len"],
                loss_cfg,
                row_weights=batch.get("row_valid"),
            )
            return metrics, preds[0]

        # out_shardings pinned to the input layout — otherwise a size-1 model
        # axis canonicalizes the output specs and step 2 silently recompiles
        # (emotts.parallel.tp.state_shardings)
        self._train_step_fn = train_step  # raw fn (benchmarks/layout probes)
        self._train_step = jax.jit(
            train_step, donate_argnums=0, out_shardings=(self._state_sh, None)
        )
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------

    def _collate(self, examples, frame_bucket):
        phone_max = max(len(e.phonemes) for e in examples)
        phone_bucket = pick_bucket(phone_max, self.cfg.bucketing.phone_buckets)
        if phone_bucket < 0:
            phone_bucket = self.cfg.bucketing.phone_buckets[-1]
        return collate_fs2(examples, phone_bucket, frame_bucket)

    def _loader(self, split: str, shuffle: bool) -> BucketLoader:
        cfg = self.cfg
        return BucketLoader(
            FS2Dataset(cfg, split),
            buckets=cfg.bucketing.frame_buckets,
            batch_size=cfg.train_fs2.batch_size,
            collate=self._collate,
            shuffle=shuffle,
            seed=cfg.data.split_seed,
            drop_last=shuffle,
            # eval partial batches pad (cyclic repeat) to shard over the mesh
            pad_to_multiple=self.mesh.shape[self.mesh.axis_names[0]],
            # multi-host: each process consumes a disjoint plan slice
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    @staticmethod
    def _device_batch(batch):
        return {k: v for k, v in batch.items() if k not in ("texts", "wavs")}

    def train_epoch(self, loader, epoch: int, writer=None, exp_path=None) -> Dict:
        avg = EpochAverager()
        timer = StepTimer()
        frames = 0
        for i, batch in enumerate(loader.epoch(epoch)):
            db = shard_batch(self.mesh, self._device_batch(batch))
            self.state, metrics = self._train_step(
                self.state, self.extractor_params, db
            )
            avg.update(jax.device_get(metrics))
            frames += int(batch["mel_len"].sum())
            timer.tick()
        means = avg.means()
        if writer is not None:
            writer.scalars(means, epoch, prefix="Loss/")
            st = timer.mean_step_time()
            if st:
                writer.scalar("train/step_time_s", st, epoch)
        return means

    def valid_epoch(self, loader, epoch: int, writer=None, exp_path=None,
                    plot_every: int = 10) -> Dict:
        avg = EpochAverager()
        plotted = False
        for batch in loader.epoch(epoch):
            db = shard_batch(self.mesh, self._device_batch(batch))
            metrics, mel_pred = self._eval_step(self.state, self.extractor_params, db)
            rv = batch.get("row_valid")
            avg.update(
                jax.device_get(metrics),
                weight=float(rv.sum()) if rv is not None else 1.0,
            )
            if exp_path and not plotted and epoch % plot_every == 0:
                mels_dir = Path(exp_path) / "mels"
                mels_dir.mkdir(exist_ok=True)
                mel_pred_np = np.asarray(jax.device_get(mel_pred))
                plot_mel_grid(
                    mel_pred_np,
                    batch["mel"],
                    str(mels_dir / f"valid_epoch_{epoch}.png"),
                )
                self._vocode_samples(batch, mel_pred_np, epoch, exp_path)
                plotted = True
        means = avg.means()
        if writer is not None:
            writer.scalars(means, epoch, prefix="Valid/Loss/")
        return means

    def restore(self, exp_path: str) -> bool:
        """Resume full train state (params+opt+step+rng+batch_stats) from an
        experiment's latest checkpoint; returns True if one was found."""
        from emotts.train.state import restore_with_rng_compat

        ckpt = CheckpointManager(exp_path, keep=self.cfg.train_fs2.keep_checkpoints)
        restored = restore_with_rng_compat(ckpt, jax.device_get(self.state))
        ckpt.close()
        if restored is None:
            return False
        self.state = jax.device_put(restored, self._state_sh)
        return True

    def _vocode_samples(self, batch, mel_pred: np.ndarray, epoch: int,
                        exp_path: str, max_samples: int = 4) -> None:
        """Vocode pred vs GT mels for the first few validation samples."""
        if self._voc_fn is None:
            return
        from emotts.audio.wavio import write_wav

        wav_dir = Path(exp_path) / "wavs"
        wav_dir.mkdir(exist_ok=True)
        n = min(max_samples, mel_pred.shape[0])
        hop = self.cfg.audio.hop_length
        sr = self.cfg.audio.sampling_rate
        pred_wavs = np.asarray(
            jax.device_get(self._voc_fn(self.vocoder_params, jnp.asarray(mel_pred[:n])))
        )
        gt_wavs = np.asarray(
            jax.device_get(
                self._voc_fn(self.vocoder_params, jnp.asarray(batch["mel"][:n]))
            )
        )
        for i in range(n):
            t = int(batch["mel_len"][i]) * hop
            write_wav(str(wav_dir / f"epoch_{epoch}_sample_{i + 1}_pred.wav"),
                      pred_wavs[i, :t], sr)
            write_wav(str(wav_dir / f"epoch_{epoch}_sample_{i + 1}_gt.wav"),
                      gt_wavs[i, :t], sr)

    def fit(
        self,
        exp_path: Optional[str] = None,
        verbose: bool = True,
        resume: bool = False,
    ) -> str:
        cfg = self.cfg
        set_seed(cfg.train_fs2.seed)
        if cfg.train_fs2.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if exp_path is None:
            exp_path = increment_path(
                os.path.join(cfg.data.experiment_path, "fastspeech2"),
                subdirs=("wavs", "mels"),
            )
        elif resume:
            self.restore(exp_path)
        writer = MetricsWriter(exp_path)
        ckpt = CheckpointManager(exp_path, keep=cfg.train_fs2.keep_checkpoints)

        train_loader = self._loader("train", shuffle=True)
        valid_loader = self._loader("valid", shuffle=False)

        best_val = float("inf")
        patience = 0
        global_step = 0
        ve = max(1, cfg.train_fs2.validate_every_epochs)
        ae = max(1, cfg.train_fs2.artifact_every_epochs)
        for epoch in range(cfg.train_fs2.n_epochs):
            if epoch == cfg.train_fs2.profile_epoch:
                with jax.profiler.trace(os.path.join(exp_path, "profile")):
                    train_means = self.train_epoch(train_loader, epoch, writer, exp_path)
            else:
                train_means = self.train_epoch(train_loader, epoch, writer, exp_path)
            next_step = global_step + train_loader.batches_per_epoch(epoch)
            # the final epoch always validates so best/ is always exported
            last = (next_step >= cfg.train_fs2.max_iterations
                    or epoch == cfg.train_fs2.n_epochs - 1)
            if last or (epoch + 1) % ve == 0:
                # artifact_every_epochs=1 keeps the historical default (the
                # inner epoch%10 mel-grid gate); an explicit cadence takes
                # over the gating entirely
                val_means = self.valid_epoch(
                    valid_loader, epoch, writer,
                    exp_path if (last or (epoch + 1) % ae == 0) else None,
                    plot_every=10 if ae == 1 else 1,
                )
                val_loss = val_means.get("total_loss", float("inf"))
                if verbose:
                    print(
                        f"[fs2] epoch {epoch}: "
                        f"train {train_means.get('total_loss', 0):.4f} "
                        f"valid {val_loss:.4f}"
                    )
                ckpt.save(self.state)
                if val_loss < best_val:
                    best_val = val_loss
                    patience = 0
                    ckpt.save_best(
                        {"params": self.state.params, "batch_stats": self.state.batch_stats}
                    )
                else:
                    patience += 1
                    if patience >= cfg.train_fs2.patience:
                        break
            global_step = next_step
            if global_step >= cfg.train_fs2.max_iterations:
                break
        ckpt.close()
        writer.close()
        return exp_path

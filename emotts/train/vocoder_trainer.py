"""HiFi-GAN vocoder trainer: adversarial training of the V1 generator.

The reference never trains a vocoder — it downloads SpeechBrain's pretrained
`tts-hifigan-libritts-16kHz` and runs it inference-only
(fastspeech2/train.py:225, readme.md:41).  This trainer removes that
external dependency: the same Flax generator used for synthesis
(emotts/nn/hifigan.py) is trained from corpus wavs with the HiFi-GAN
objective (LSGAN adversarial + feature matching + L1 log-mel), then exported
as the .npz the synthesis pipeline already consumes.

TPU design:
* ONE jitted step updates discriminators then generator (D first, G against
  the updated D, as in the paper) — two optimizer applications, zero host
  round trips inside the step;
* the conditioning mel and the mel-reconstruction loss are computed
  on-device with the same fused DFT frontend the data pipeline uses
  (emotts/audio/mel.py::mel_energy_jax), so training is self-consistent with
  synthesis-time features and fully differentiable;
* fixed-size random segments (segment_frames × hop samples) keep every step
  the same XLA program; batch shards over the data axis, params replicate,
  XLA inserts both gradient all-reduces;
* ``adversarial_weight: 0`` drops the GAN terms for deterministic mel-only
  pretraining (also what the convergence tests use).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from emotts.audio.mel import mel_full_jax
from emotts.audio.wavio import load_wav
from emotts.losses.gan import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_l1_loss,
)
from emotts.nn.hifigan import HiFiGANGenerator
from emotts.nn.hifigan_disc import MultiPeriodDiscriminator, MultiScaleDiscriminator
from emotts.parallel.mesh import make_mesh, shard_batch
from emotts.parallel.tp import state_shardings
from emotts.train.metrics import EpochAverager, MetricsWriter, StepTimer
from emotts.train.state import TrainState, create_train_state
from emotts.utils.config import Config
from emotts.utils.experiment import increment_path, set_seed


def build_vocoder_generator(cfg: Config) -> HiFiGANGenerator:
    vc = cfg.train_vocoder
    return HiFiGANGenerator(
        in_channels=cfg.audio.n_mels,
        upsample_initial_channel=vc.upsample_initial_channel,
        upsample_rates=tuple(vc.upsample_rates),
        upsample_kernel_sizes=tuple(vc.upsample_kernel_sizes),
        resblock_kernel_sizes=tuple(vc.resblock_kernel_sizes),
        resblock_dilations=tuple(tuple(d) for d in vc.resblock_dilations),
    )


class SegmentSampler:
    """In-memory random-crop sampler over corpus wavs.

    Short utterances are zero-padded to one segment; crops are uniform over
    (utterance, offset).  Multi-host: pass a process-sliced ``paths`` list.
    """

    def __init__(self, paths: List[str], sr: int, segment_samples: int,
                 seed: int = 0):
        if not paths:
            raise ValueError("no wav files to train on")
        self.segment = segment_samples
        self.wavs = []
        for p in paths:
            y = load_wav(p, sr).astype(np.float32)
            if len(y) < segment_samples:
                y = np.pad(y, (0, segment_samples - len(y)))
            self.wavs.append(y)
        self.rng = np.random.default_rng(seed)

    def batch(self, b: int) -> np.ndarray:
        out = np.empty((b, self.segment), np.float32)
        idx = self.rng.integers(0, len(self.wavs), b)
        for row, i in enumerate(idx):
            y = self.wavs[i]
            t0 = self.rng.integers(0, len(y) - self.segment + 1)
            out[row] = y[t0 : t0 + self.segment]
        return out


class PairedSegmentSampler:
    """Random crops over aligned (conditioning mel, waveform) pairs — the
    fine-tuning path where the conditioning mel is a FastSpeech2 prediction
    rather than the analysis mel of the audio."""

    def __init__(self, pairs, segment_frames: int, hop: int, mel_floor: float,
                 seed: int = 0):
        if not pairs:
            raise ValueError("no (mel, wav) pairs to train on")
        self.f = segment_frames
        self.hop = hop
        self.pairs = []
        for mel, wav in pairs:
            n = min(mel.shape[0], len(wav) // hop)
            mel, wav = mel[:n], wav[: n * hop]
            if n < segment_frames:  # pad short utterances to one segment
                pad_m = np.full((segment_frames, mel.shape[1]), mel_floor,
                                np.float32)
                pad_m[:n] = mel
                pad_w = np.zeros(segment_frames * hop, np.float32)
                pad_w[: n * hop] = wav
                mel, wav = pad_m, pad_w
            self.pairs.append((mel.astype(np.float32), wav.astype(np.float32)))
        self.rng = np.random.default_rng(seed)

    def batch(self, b: int):
        m_dim = self.pairs[0][0].shape[1]
        y = np.empty((b, self.f * self.hop), np.float32)
        mel = np.empty((b, self.f, m_dim), np.float32)
        idx = self.rng.integers(0, len(self.pairs), b)
        for row, i in enumerate(idx):
            m, w = self.pairs[i]
            f0 = self.rng.integers(0, m.shape[0] - self.f + 1)
            mel[row] = m[f0 : f0 + self.f]
            y[row] = w[f0 * self.hop : (f0 + self.f) * self.hop]
        return {"y": y, "mel_cond": mel}


def predicted_mel_pairs(
    cfg: Config,
    fs2_exp: Optional[str] = None,
    rank_exp: Optional[str] = None,
    split: Optional[str] = None,
    max_utts: Optional[int] = None,
):
    """Teacher-forced FastSpeech2 mels aligned with the ground-truth audio:
    the fine-tuning dataset from the HiFi-GAN paper (predicted mel in,
    real waveform out)."""
    from pathlib import Path

    from emotts.audio.textgrid import process_textgrid
    from emotts.audio.wavio import load_wav, trim_audio
    from emotts.data.datasets import FS2Dataset, collate_fs2
    from emotts.data.loader import BucketLoader
    from emotts.eval.evaluate import Evaluator, pick_phone_bucket

    split = split or cfg.train_vocoder.fs2_split
    ev = Evaluator(cfg, fs2_exp, rank_exp)
    loader = BucketLoader(
        FS2Dataset(cfg, split),
        buckets=cfg.bucketing.frame_buckets,
        batch_size=cfg.train_fs2.batch_size,
        collate=lambda ex, fb: collate_fs2(ex, pick_phone_bucket(ex, cfg), fb),
        shuffle=False,
        seed=0,
        drop_last=False,
    )
    sr, hop = cfg.audio.sampling_rate, cfg.audio.hop_length
    pairs = []
    for batch in loader.epoch(0):
        mel, _, _ = jax.device_get(ev._tf(ev._arrays_only(batch)))
        for i in range(mel.shape[0]):
            t = int(batch["mel_len"][i])
            if t == 0:
                continue
            wav_path = Path(str(batch["wavs"][i]))
            tg = (Path(cfg.data.textgrid_path) / wav_path.parent.name
                  / f"{wav_path.stem}.TextGrid")
            if not tg.exists():
                continue
            _, _, t0, t1 = process_textgrid(
                str(tg), sr, hop, cfg.data.sil_phones
            )
            y = trim_audio(load_wav(str(wav_path), sr), t0, t1, sr)
            n = min(t, len(y) // hop)
            if n <= 0:
                continue
            pairs.append((np.asarray(mel[i, :n]), y[: n * hop]))
            if max_utts is not None and len(pairs) >= max_utts:
                return pairs
    return pairs


class VocoderTrainer:
    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        vc = cfg.train_vocoder
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        dtype = jnp.dtype(vc.compute_dtype)
        hop = cfg.audio.hop_length
        self.segment_samples = vc.segment_frames * hop
        self.adversarial = vc.adversarial_weight > 0.0
        self.condition = vc.condition  # "gt" | "fs2" (static graph switch)

        self.gen = build_vocoder_generator(cfg)
        self.mpd = MultiPeriodDiscriminator(
            tuple(vc.mpd_periods), vc.disc_channel_mult,
            fold_periods=tuple(vc.mpd_fold_periods), dtype=dtype
        )
        self.msd = MultiScaleDiscriminator(
            vc.msd_scales, vc.disc_channel_mult,
            dense_groups=vc.disc_dense_groups and vc.msd_group_merge <= 1,
            group_merge=vc.msd_group_merge, dtype=dtype
        )

        key = jax.random.PRNGKey(vc.seed)
        mel_dummy = jnp.zeros((1, vc.segment_frames, cfg.audio.n_mels))
        wav_dummy = jnp.zeros((1, self.segment_samples))
        gen_params = self.gen.init(key, mel_dummy)
        disc_params = {
            "mpd": self.mpd.init(key, wav_dummy),
            "msd": self.msd.init(key, wav_dummy),
        }

        schedule = optax.exponential_decay(
            vc.learning_rate, vc.lr_decay_every, vc.lr_decay, staircase=True
        )
        self.gen_tx = optax.adamw(schedule, b1=vc.adam_b1, b2=vc.adam_b2,
                                  weight_decay=0.01)
        self.disc_tx = optax.adamw(schedule, b1=vc.adam_b1, b2=vc.adam_b2,
                                   weight_decay=0.01)
        gen_state = create_train_state(
            gen_params, self.gen_tx, vc.seed, rng_impl=vc.rng_impl
        )
        disc_state = create_train_state(
            disc_params, self.disc_tx, vc.seed + 1, rng_impl=vc.rng_impl
        )
        self._gen_sh = state_shardings(gen_state, self.mesh)
        self._disc_sh = state_shardings(disc_state, self.mesh)
        self.gen_state = jax.device_put(gen_state, self._gen_sh)
        self.disc_state = jax.device_put(disc_state, self._disc_sh)

        acfg = cfg.audio
        t_frames = vc.segment_frames
        adv_w, fm_w, mel_w = (
            vc.adversarial_weight, vc.feature_loss_weight, vc.mel_loss_weight
        )

        def device_mel(y, floor="hard"):
            # segments are always exactly segment_samples long → the
            # gather-free full-length path (same mel values, ~15 ms/step
            # cheaper through the loss gradient)
            return mel_full_jax(y, acfg, floor=floor)[:, :, :t_frames]

        def gen_fwd(gp, mel_in):
            return self.gen.apply(gp, mel_in.astype(dtype)).astype(jnp.float32)

        def disc_all(dp, y):
            outs_p, feats_p = self.mpd.apply(dp["mpd"], y)
            outs_s, feats_s = self.msd.apply(dp["msd"], y)
            return outs_p + outs_s, feats_p + feats_s

        def train_step(
            gen_state: TrainState, disc_state: TrainState, batch
        ) -> Tuple[TrainState, TrainState, Dict]:
            y = batch["y"]  # (B, S) float32
            if self.condition == "fs2":
                # fine-tuning: condition on the FS2-predicted mel; the
                # reconstruction target below stays the real audio's mel
                mel_in = batch["mel_cond"]  # (B, T, M)
            else:
                mel_in = device_mel(y).transpose(0, 2, 1)  # (B, T, M)

            metrics: Dict = {}
            # soft-floored log-mels on BOTH sides of the L1: gradient exists
            # even while the early generator's spectrum is under the clip
            # floor (the hard contract floor would silently stall training)
            mel_soft = device_mel(y, floor="soft")

            if self.adversarial:
                # Single generator forward for the whole step: every G-loss
                # term depends on gen params only through y_hat, so run the
                # forward ONCE under jax.vjp, feed its (stop-gradient) value
                # to the D update, take grad of the G losses w.r.t. y_hat
                # against the UPDATED discriminator, and pull back through
                # the saved vjp.  Structurally guarantees the dedup instead
                # of relying on XLA CSE across the two value_and_grad traces.
                # gen_remat: the vjp's residuals otherwise stay live across
                # the whole D forward/backward/update before the pullback
                # runs; jax.checkpoint drops them and recomputes the G
                # forward inside the pullback — identical math, second
                # forward's FLOPs traded back for peak HBM
                fwd = (jax.checkpoint(gen_fwd) if vc.gen_remat else gen_fwd)
                y_hat, gen_vjp = jax.vjp(
                    lambda gp: fwd(gp, mel_in), gen_state.params
                )
                y_hat_det = jax.lax.stop_gradient(y_hat)

                def d_loss_fn(dp):
                    real_outs, _ = disc_all(dp, y)
                    fake_outs, _ = disc_all(dp, y_hat_det)
                    return discriminator_loss(real_outs, fake_outs)

                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_state.params)
                d_updates, d_opt = self.disc_tx.update(
                    d_grads, disc_state.opt_state, disc_state.params
                )
                disc_params_new = optax.apply_updates(disc_state.params, d_updates)
                disc_state = disc_state.replace(
                    step=disc_state.step + 1,
                    params=disc_params_new,
                    opt_state=d_opt,
                )
                metrics["d_loss"] = d_loss

                def g_loss_from_yhat(yh):
                    mel_hat = device_mel(yh, floor="soft")
                    l_mel = mel_l1_loss(mel_hat, mel_soft)
                    fake_outs, fake_feats = disc_all(disc_state.params, yh)
                    _, real_feats = disc_all(
                        disc_state.params, jax.lax.stop_gradient(y)
                    )
                    l_adv = generator_adversarial_loss(fake_outs)
                    l_fm = feature_matching_loss(real_feats, fake_feats)
                    total = mel_w * l_mel + adv_w * l_adv + fm_w * l_fm
                    parts = {"mel_l1": l_mel, "g_adv": l_adv,
                             "feature_match": l_fm, "g_total": total}
                    return total, parts

                (_, parts), dl_dyhat = jax.value_and_grad(
                    g_loss_from_yhat, has_aux=True
                )(y_hat)
                (g_grads,) = gen_vjp(dl_dyhat)
            else:
                def g_loss_fn(gp):
                    y_hat = gen_fwd(gp, mel_in)
                    mel_hat = device_mel(y_hat, floor="soft")
                    l_mel = mel_l1_loss(mel_hat, mel_soft)
                    total = mel_w * l_mel
                    parts = {"mel_l1": l_mel, "g_total": total}
                    return total, parts

                (_, parts), g_grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True
                )(gen_state.params)
            g_updates, g_opt = self.gen_tx.update(
                g_grads, gen_state.opt_state, gen_state.params
            )
            gen_state = gen_state.replace(
                step=gen_state.step + 1,
                params=optax.apply_updates(gen_state.params, g_updates),
                opt_state=g_opt,
            )
            metrics.update(parts)
            return gen_state, disc_state, metrics

        self._train_step_fn = train_step  # un-jitted (benchmarks: FLOP count)
        self._train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1),
            out_shardings=(self._gen_sh, self._disc_sh, None),
        )

    # ------------------------------------------------------------------

    def _ckpt_mgr(self, exp_path: str) -> ocp.CheckpointManager:
        from emotts.train.checkpoint import make_orbax_manager

        return make_orbax_manager(
            os.path.join(os.path.abspath(exp_path), "checkpoints"),
            keep=self.cfg.train_vocoder.keep_checkpoints,
        )

    def restore(self, exp_path: str) -> bool:
        mgr = self._ckpt_mgr(exp_path)
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            return False
        template = {
            "gen": jax.device_get(self.gen_state),
            "disc": jax.device_get(self.disc_state),
        }
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        mgr.close()
        self.gen_state = jax.device_put(restored["gen"], self._gen_sh)
        self.disc_state = jax.device_put(restored["disc"], self._disc_sh)
        return True

    def export(self, exp_path: str) -> str:
        """Write the generator params as the .npz the synthesis pipeline
        consumes (inference.vocoder_checkpoint)."""
        from emotts.infer.synthesize import save_vocoder_params_npz

        out = os.path.join(exp_path, "vocoder.npz")
        params = jax.device_get(self.gen_state.params)
        save_vocoder_params_npz(
            {"params": params.get("params", params)}, out
        )
        return out

    def fit(
        self,
        wav_paths: Optional[List[str]] = None,
        n_steps: Optional[int] = None,
        exp_path: Optional[str] = None,
        resume: bool = False,
        pairs=None,
    ) -> str:
        """``pairs``: pre-computed (predicted-mel, waveform) pairs for the
        fs2-condition path — chained fine-tune legs share one FS2, so the
        caller can compute ``predicted_mel_pairs`` once instead of
        re-running the teacher-forced pass per leg."""
        cfg, vc = self.cfg, self.cfg.train_vocoder
        set_seed(vc.seed)
        if exp_path is None:
            exp_path = increment_path(
                os.path.join(cfg.data.experiment_path, "vocoder")
            )
        os.makedirs(exp_path, exist_ok=True)
        if resume:
            self.restore(exp_path)
        # the sampler seed folds in the (restored) step counter, so
        # continued training — a resume or a chained fine-tune leg — draws
        # a fresh crop sequence instead of replaying the first run's
        # batches (fresh runs start at step 0: seed unchanged)
        start0 = int(jax.device_get(self.gen_state.step))
        sampler_seed = vc.seed + jax.process_index() + start0
        if self.condition == "fs2":
            if pairs is None:
                pairs = predicted_mel_pairs(cfg)
            # multi-host: disjoint utterance shards per process
            pairs = pairs[jax.process_index() :: jax.process_count()]
            sampler = PairedSegmentSampler(
                pairs, vc.segment_frames, cfg.audio.hop_length,
                mel_floor=float(np.log(cfg.audio.clip_val)),
                seed=sampler_seed,
            )
        else:
            if wav_paths is None:
                wav_paths = sorted(
                    glob(os.path.join(cfg.data.corpus_path, "*", "*.wav"))
                )
            wav_paths = wav_paths[jax.process_index() :: jax.process_count()]
            sampler = SegmentSampler(
                wav_paths, cfg.audio.sampling_rate, self.segment_samples,
                seed=sampler_seed,
            )
        mgr = self._ckpt_mgr(exp_path)
        writer = MetricsWriter(exp_path)
        avg = EpochAverager()
        timer = StepTimer()
        total = n_steps if n_steps is not None else vc.n_steps
        start = int(jax.device_get(self.gen_state.step))
        for step in range(start, total):
            raw = sampler.batch(vc.batch_size)
            if not isinstance(raw, dict):
                raw = {"y": raw}
            batch = shard_batch(self.mesh, raw)
            self.gen_state, self.disc_state, metrics = self._train_step(
                self.gen_state, self.disc_state, batch
            )
            avg.update(jax.device_get(metrics))
            timer.tick()
            if (step + 1) % vc.log_every_steps == 0 or step + 1 == total:
                means = avg.means()
                writer.scalars(means, step + 1, prefix="train/")
                st = timer.mean_step_time()
                if st:
                    writer.scalar("train/step_time_s", st, step + 1)
                avg = EpochAverager()
            if (step + 1) % vc.checkpoint_every_steps == 0 or step + 1 == total:
                mgr.save(
                    step + 1,
                    args=ocp.args.StandardSave(
                        {
                            "gen": jax.device_get(self.gen_state),
                            "disc": jax.device_get(self.disc_state),
                        }
                    ),
                )
        mgr.wait_until_finished()
        mgr.close()
        self.export(exp_path)
        writer.close()
        return exp_path

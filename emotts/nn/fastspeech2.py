"""FastSpeech2 acoustic model with speaker + emotion-intensity conditioning.

Capability parity with the reference model (fastspeech2/model.py:32-441,
itself derived from SpeechBrain's FastSpeech2 lobes), re-designed in Flax:

  tokens → EncoderPreNet → +pos-enc → FFT encoder →
  concat(token feats, speaker emb, intensity rep) → bias-free projection →
  duration/pitch/energy variance adaptors (pitch/energy embedded via Conv1d
  and *added* to the states; energy predictor sees pitch-conditioned feats) →
  gather-based length regulation (teacher-forced durations at training,
  clamp(expm1(log_dur)) at inference, with pace/pitch_rate/energy_rate
  controls) → FFT decoder → mel head → PostNet residual.

Intensity conditioning dim is ``n_emotions`` (deriving what the reference
hard-codes as 5 and mismatches at fastspeech2/inference.py:14 — SURVEY.md
§3.6-B2).

Returns the reference's 8-tuple: (mel_post, postnet_mel, log_durations,
pred_pitch, avg_pitch, pred_energy, avg_energy, mel_lens).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from emotts.nn.blocks import FFTStack, PositionalEncoding, sequence_mask
from emotts.nn.length_regulator import average_over_durations, length_regulate
from emotts.utils.config import FastSpeech2Config


class EncoderPreNet(nn.Module):
    """Token embedding + convolutional context (SpeechBrain EncoderPreNet
    capability, consumed at fastspeech2/model.py:205-207,335)."""

    n_char: int
    d_model: int
    padding_idx: int = 0
    n_convs: int = 3
    kernel_size: int = 5
    dropout: float = 0.15
    # "conv": embedding + conv context stack (this framework's default);
    # "embedding": bare token embedding, the SpeechBrain EncoderPreNet layout
    # the reference instantiates (fastspeech2/model.py:205-207) — required
    # for running imported reference checkpoints.
    style: str = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Embed(self.n_char, self.d_model, dtype=self.dtype, name="embed")(tokens)
        if self.style == "embedding":
            return x
        for i in range(self.n_convs):
            y = nn.Conv(
                self.d_model, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm_{i}")(y).astype(self.dtype)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + y  # residual keeps the embedding signal
        x = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(x)
        return x


class VariancePredictor(nn.Module):
    """Conv-stack scalar predictor for duration/pitch/energy (SpeechBrain
    DurationPredictor capability, fastspeech2/model.py:208-225)."""

    d_model: int
    kernel_size: int = 3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        m = valid[..., None].astype(x.dtype)
        y = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv1")(x * m)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(y).astype(self.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv2")(y * m)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(y).astype(self.dtype)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(1, dtype=self.dtype, name="out")(y)  # (B, P, 1)
        return y * m


class PostNet(nn.Module):
    """5-layer conv residual refiner over the mel output (SpeechBrain PostNet
    capability, fastspeech2/model.py:269-276): tanh+BatchNorm hidden convs,
    linear+BatchNorm final conv."""

    n_mels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convs: int = 5
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = mel.astype(self.dtype)
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            features = self.n_mels if last else self.embedding_dim
            x = nn.Conv(features, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=jnp.float32,
                name=f"bn_{i}",
            )(x).astype(self.dtype)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SpeechBrainPostNet(nn.Module):
    """The reference's actual PostNet layout (SpeechBrain FastSpeech2 lobe,
    consumed at fastspeech2/model.py:270-276): conv_pre → LN → tanh →
    (n−2) intermediate convs → LN → tanh → conv_post → LN, dropout after
    each norm group.  Kept alongside the tanh+BatchNorm :class:`PostNet`
    so imported reference checkpoints run with identical math
    (``fastspeech2.postnet_style: speechbrain``)."""

    n_mels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convs: int = 5
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        k = (self.kernel_size,)
        x = mel.astype(self.dtype)
        x = nn.Conv(self.embedding_dim, k, padding="SAME", dtype=self.dtype,
                    name="conv_pre")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        x = jnp.tanh(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.n_convs - 2):
            x = nn.Conv(self.embedding_dim, k, padding="SAME", dtype=self.dtype,
                        name=f"conv_mid_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        x = jnp.tanh(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.n_mels, k, padding="SAME", dtype=self.dtype,
                    name="conv_post")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln3")(x).astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class FastSpeech2(nn.Module):
    cfg: FastSpeech2Config
    n_speakers: int = 4
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 on TPU); params fp32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # (B, P) int, 0 = pad
        speakers: jnp.ndarray,  # (B,) int ids, OR (B, n_speakers) float
        #   blend weights — a weighted mix over the speaker-embedding table
        #   (one-hot weights reproduce the id path exactly); enables
        #   continuous speaker interpolation at synthesis time
        durations: Optional[jnp.ndarray] = None,  # (B, P) int (teacher forcing)
        pitch: Optional[jnp.ndarray] = None,  # (B, T) frame-level target
        energy: Optional[jnp.ndarray] = None,  # (B, T)
        intensity: Optional[jnp.ndarray] = None,  # (B, P, n_emotions)
        pace: float = 1.0,
        pitch_rate: float = 1.0,
        energy_rate: float = 1.0,
        max_mel_len: Optional[int] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        c = self.cfg
        dtype = jnp.float32  # glue math stays fp32; heavy modules use self.dtype
        b, p = tokens.shape
        token_valid = tokens != c.padding_idx  # (B, P)
        tmask = token_valid[..., None].astype(dtype)

        # ---------------- encoder ----------------
        feats = EncoderPreNet(
            c.n_char, c.enc_d_model, c.padding_idx, dropout=0.15,
            style=c.prenet_style, dtype=self.dtype, name="prenet",
        )(tokens, deterministic).astype(dtype)
        pos = PositionalEncoding(c.enc_d_model, name="pos_enc")(feats)
        feats = (feats + pos) * tmask
        feats = FFTStack(
            num_layers=c.enc_num_layers,
            d_model=c.enc_d_model,
            n_heads=c.enc_num_head,
            ffn_dim=c.enc_ffn_dim,
            kernel_sizes=tuple(c.ffn_kernel_sizes),
            activation=nn.relu,
            dropout=c.enc_dropout,
            normalize_before=c.normalize_before,
            final_norm=True,
            remat=c.remat,
            fused_attention=c.fused_attention,
            dtype=self.dtype,
            name="encoder",
        )(feats, key_valid=token_valid, deterministic=deterministic).astype(dtype)
        feats = feats * tmask

        # ------------- conditioning: speaker ⊕ intensity -------------
        spk_emb = nn.Embed(self.n_speakers, c.enc_d_model, name="speaker_emb")
        if speakers.ndim == 2:
            # blended speakers: weights over the full embedding table
            table = spk_emb(jnp.arange(self.n_speakers))  # (n_spk, D)
            spk = speakers.astype(table.dtype) @ table
        else:
            spk = spk_emb(speakers)
        spk = jnp.broadcast_to(spk[:, None, :], (b, p, c.enc_d_model))
        if intensity is None:
            intensity = jnp.zeros((b, p, c.intensity_dim), dtype)
        feats = nn.Dense(c.enc_d_model, use_bias=False, name="concat_proj")(
            jnp.concatenate([feats, spk, intensity.astype(dtype)], axis=-1)
        )
        feats = feats * tmask

        # ---------------- variance adaptors ----------------
        log_durations = VariancePredictor(
            c.enc_d_model, c.dur_pred_kernel_size, c.variance_predictor_dropout,
            dtype=self.dtype, name="duration_predictor",
        )(feats, token_valid, deterministic)[..., 0]  # (B, P)

        pred_pitch = VariancePredictor(
            c.enc_d_model, c.pitch_pred_kernel_size, c.variance_predictor_dropout,
            dtype=self.dtype, name="pitch_predictor",
        )(feats, token_valid, deterministic)  # (B, P, 1)
        pred_pitch = pred_pitch * pitch_rate

        pitch_embed = nn.Conv(
            c.enc_d_model, (c.pitch_pred_kernel_size,), padding="SAME",
            name="pitch_embed",
        )
        avg_pitch = None
        if pitch is not None and durations is not None:
            avg_pitch = average_over_durations(pitch, durations)  # (B, P)
            feats = feats + pitch_embed(avg_pitch[..., None]) * tmask
            avg_pitch = avg_pitch[..., None]  # (B, P, 1) like the reference
        else:
            feats = feats + pitch_embed(pred_pitch) * tmask

        pred_energy = VariancePredictor(
            c.enc_d_model, c.energy_pred_kernel_size, c.variance_predictor_dropout,
            dtype=self.dtype, name="energy_predictor",
        )(feats, token_valid, deterministic)  # (B, P, 1)
        pred_energy = pred_energy * energy_rate

        energy_embed = nn.Conv(
            c.enc_d_model, (c.energy_pred_kernel_size,), padding="SAME",
            name="energy_embed",
        )
        avg_energy = None
        if energy is not None and durations is not None:
            avg_energy = average_over_durations(energy, durations)
            feats = feats + energy_embed(avg_energy[..., None]) * tmask
            avg_energy = avg_energy[..., None]
        else:
            feats = feats + energy_embed(pred_energy) * tmask

        # ---------------- length regulation ----------------
        max_len = max_mel_len or c.max_mel_len
        if durations is not None:
            dur_frames = durations
            if pace != 1.0:
                dur_frames = jnp.round(durations.astype(dtype) * pace).astype(
                    durations.dtype
                )
        else:
            dur = jnp.clip(jnp.expm1(log_durations), 0.0)  # frames, float
            dur_frames = jnp.round(dur * pace).astype(jnp.int32)
        dur_frames = dur_frames * token_valid.astype(dur_frames.dtype)
        spec, mel_lens = length_regulate(feats, dur_frames, max_len)

        # ---------------- decoder ----------------
        frame_valid = sequence_mask(mel_lens, max_len)
        fmask = frame_valid[..., None].astype(dtype)
        pos_d = PositionalEncoding(c.dec_d_model, name="pos_dec")(spec)
        spec = (spec + pos_d) * fmask
        spec = FFTStack(
            num_layers=c.dec_num_layers,
            d_model=c.dec_d_model,
            n_heads=c.dec_num_head,
            ffn_dim=c.dec_ffn_dim,
            kernel_sizes=tuple(c.ffn_kernel_sizes),
            activation=nn.relu,
            dropout=c.dec_dropout,
            normalize_before=c.normalize_before,
            final_norm=True,
            remat=c.remat,
            fused_attention=c.fused_attention,
            dtype=self.dtype,
            name="decoder",
        )(spec, key_valid=frame_valid, deterministic=deterministic).astype(dtype)

        mel_post = nn.Dense(c.n_mels, name="mel_head")(spec) * fmask
        postnet_cls = (
            SpeechBrainPostNet if c.postnet_style == "speechbrain" else PostNet
        )
        residual = postnet_cls(
            n_mels=c.n_mels,
            embedding_dim=c.postnet_embedding_dim,
            kernel_size=c.postnet_kernel_size,
            n_convs=c.postnet_n_convolutions,
            dropout=c.postnet_dropout,
            dtype=self.dtype,
            name="postnet",
        )(mel_post, deterministic)
        postnet_mel = (mel_post + residual) * fmask

        return (
            mel_post,
            postnet_mel,
            log_durations,
            pred_pitch,
            avg_pitch,
            pred_energy,
            avg_energy,
            mel_lens,
        )

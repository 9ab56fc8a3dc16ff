"""Mel-spectrogram + energy frontend.

TPU-native re-design of the reference feature extractor
(rank_model/audio_util.py:24-42, which wraps SpeechBrain/torchaudio):
16 kHz audio → framed STFT (as MXU matmuls) → magnitude (power=1) →
Slaney-normalized Slaney-scale mel filterbank → log compression, plus the
per-utterance min-max-normalized L2 frame energy.

Conventions matched to the torchaudio/SpeechBrain behavior the reference
relies on:

* center=True with reflect padding of ``n_fft // 2`` samples on both sides,
* periodic Hann window of ``win_length`` (zero-padded to ``n_fft`` if shorter),
* one-sided spectrum (``n_fft // 2 + 1`` bins), ``normalized=False``,
* magnitude spectrogram (power=1),
* mel filterbank with Slaney mel scale + Slaney area normalization,
* log compression ``log(clamp(x, min=1e-5))``,
* energy = per-frame L2 norm over frequency bins of the magnitude
  spectrogram, min-max normalized per utterance.

Two implementations with one shared math core:

* :func:`mel_energy_np` — numpy, per-utterance, used by host preprocessing
  and as the golden reference in tests.
* :func:`mel_energy_jax` — jittable, operates on padded batches with a
  length vector (static shapes), used for device-offloaded batch
  preprocessing and benchmarking.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emotts.utils.config import AudioConfig

# ---------------------------------------------------------------------------
# Slaney mel filterbank (numpy; computed once, used as a constant on device)
# ---------------------------------------------------------------------------

_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = 15.0
_LOG_STEP = np.log(6.4) / 27.0
_F_SP = 200.0 / 3.0


def hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOG_STEP,
        mels,
    )
    return mels


def mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    freqs = _F_SP * mels
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(
        log_region,
        _MIN_LOG_HZ * np.exp(_LOG_STEP * (np.maximum(mels, _MIN_LOG_MEL) - _MIN_LOG_MEL)),
        freqs,
    )
    return freqs


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, f_min: float, f_max: float
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular filterbank, shape (n_mels, n_bins)."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)  # (n_mels + 1,)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels + 2, n_bins)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_bins)

    # Slaney area normalization: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window_periodic(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window, zero-padded (centered) to n_fft — torch.stft behavior."""
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    if win_length < n_fft:
        pad_left = (n_fft - win_length) // 2
        w = np.pad(w, (pad_left, n_fft - win_length - pad_left))
    return w.astype(np.float32)


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count with center padding: 1 + n_samples // hop."""
    return 1 + n_samples // hop_length


# ---------------------------------------------------------------------------
# numpy reference implementation
# ---------------------------------------------------------------------------


def stft_magnitude_np(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Magnitude STFT, shape (n_bins, T)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = n_fft // 2
    y = np.pad(y.astype(np.float64), pad, mode="reflect")
    t = num_frames(len(y) - 2 * pad, hop)
    window = hann_window_periodic(cfg.win_length, n_fft).astype(np.float64)
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * window  # (T, n_fft)
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)  # (T, n_bins)
    return np.abs(spec).T.astype(np.float32)  # (n_bins, T)


def mel_energy_np(y: np.ndarray, cfg: AudioConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Log-mel (n_mels, T) and min-max-normalized energy (T,) of one utterance."""
    spec = stft_magnitude_np(y, cfg)  # (n_bins, T)
    fb = mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max)
    mel = fb @ spec  # (n_mels, T)
    mel = np.log(np.maximum(mel, cfg.clip_val))
    energy = np.linalg.norm(spec, axis=0)  # (T,)
    e_min, e_max = energy.min(), energy.max()
    energy = (energy - e_min) / max(e_max - e_min, 1e-10)
    return mel.astype(np.float32), energy.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX implementation (static shapes; batched; MXU matmuls)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _device_constants(sr, n_fft, hop, win_length, n_mels, f_min, f_max):
    """Window-folded DFT basis and mel filterbank (numpy; safe to cache —
    they embed as trace-time constants wherever they're consumed)."""
    window = hann_window_periodic(win_length, n_fft)  # (n_fft,)
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[None, :]  # (1, n_bins)
    n = np.arange(n_fft)[:, None]  # (n_fft, 1)
    angle = -2.0 * np.pi * n * k / n_fft
    dft_real = (np.cos(angle) * window[:, None]).astype(np.float32)  # (n_fft, n_bins)
    dft_imag = (np.sin(angle) * window[:, None]).astype(np.float32)
    fb = mel_filterbank(sr, n_fft, n_mels, f_min, f_max).T  # (n_bins, n_mels)
    return dft_real, dft_imag, fb


@functools.partial(jax.jit, static_argnames=("cfg", "floor"))
def mel_full_jax(
    y: jnp.ndarray, cfg: AudioConfig, floor: str = "hard"
) -> jnp.ndarray:
    """Log-mel for batches whose rows are ALL full length (no padding).

    Equivalent to ``mel_energy_jax(y, full_lengths, cfg, floor)[0]`` — the
    frames are constructed identically (static reflect pad == the per-row
    reflect index arithmetic when every row is full), and the same
    window-folded DFT einsums consume them.  The difference is mechanical:
    framing here is a static reflect pad + ``n_fft // hop`` shifted slices
    concatenated on the last axis, instead of a (B, T, n_fft) gather.  The
    gather's forward AND ITS SCATTER TRANSPOSE in the backward pass cost
    ~15 ms/step in the full-size vocoder GAN step (tools/profile_step.py
    --step vocoder: three f32[540672] gather/scatter fusions); slices and
    their pad-transposes fuse away.  Used by the vocoder trainer's mel loss,
    where segments are always exactly ``segment_samples`` long.
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    dft_real, dft_imag, fb = _device_constants(
        cfg.sampling_rate, n_fft, hop, cfg.win_length, cfg.n_mels, cfg.f_min,
        cfg.f_max,
    )
    b, s = y.shape
    pad = n_fft // 2
    t = num_frames(s, hop)
    ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    if n_fft % hop == 0:
        # right-pad (zeros, never read: (t-1)*hop + n_fft <= s + 2*pad) to a
        # whole number of hop-chunks, then frame t = chunks[t : t + r]
        r = n_fft // hop
        extra = (-ypad.shape[1]) % hop
        if extra:
            ypad = jnp.pad(ypad, ((0, 0), (0, extra)))
        chunks = ypad.reshape(b, -1, hop)
        frames = jnp.concatenate(
            [chunks[:, i:i + t] for i in range(r)], axis=-1
        )  # (B, T, n_fft)
    else:  # pragma: no cover - all shipped configs have hop | n_fft
        idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
        frames = ypad[:, idx]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, dft_real, precision=hi)
    im = jnp.einsum("btn,nk->btk", frames, dft_imag, precision=hi)
    spec = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.einsum("btk,km->bmt", spec, fb, precision=hi)  # (B, M, T)
    if floor == "soft":
        return jnp.log(mel + cfg.clip_val)
    return jnp.log(jnp.maximum(mel, cfg.clip_val))


@functools.partial(jax.jit, static_argnames=("cfg", "floor"))
def mel_energy_jax(
    y: jnp.ndarray, lengths: jnp.ndarray, cfg: AudioConfig,
    floor: str = "hard",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched log-mel + energy on device.

    Args:
      y: (B, S) zero-padded audio batch (S static).
      lengths: (B,) valid sample counts.
      cfg: audio config (hashable static arg).
      floor: "hard" = log(max(mel, clip_val)), the torchaudio-compatible
        feature contract (zero gradient below the floor); "soft" =
        log(mel + clip_val), gradient everywhere — used by the vocoder
        GAN trainer where the mel loss must stay differentiable even when
        the early generator's output spectrum sits under the clip floor.

    Returns:
      mel: (B, n_mels, T) log-mel; frames past each utterance's frame count
        hold the log-floor value.
      energy: (B, T) per-utterance min-max-normalized energy (0 on pad).
      n_frames: (B,) valid frame counts (1 + length // hop).
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    dft_real, dft_imag, fb = _device_constants(
        cfg.sampling_rate, n_fft, hop, cfg.win_length, cfg.n_mels, cfg.f_min, cfg.f_max
    )
    b, s = y.shape
    pad = n_fft // 2
    t = num_frames(s, hop)

    # reflect-pad each row around its own valid span is data-dependent; we
    # reflect-pad the padded buffer instead, which matches exactly because
    # frames are only consumed up to each utterance's frame count and audio
    # rows are zero beyond their length... except the first/last frames of
    # each utterance DO straddle the boundary.  To keep bit-parity with the
    # per-utterance numpy path we reflect around the *valid* span using
    # index arithmetic below.
    frame_starts = jnp.arange(t) * hop  # (T,)
    sample_offsets = jnp.arange(n_fft) - pad  # window spans [-pad, n_fft-pad)
    raw_idx = frame_starts[:, None] + sample_offsets[None, :]  # (T, n_fft)

    def reflect_gather(row, length):
        # reflect indices into [0, length): standard 'reflect' (no edge repeat)
        idx = jnp.abs(raw_idx)
        period = jnp.maximum(2 * (length - 1), 1)
        idx = idx % period
        idx = jnp.where(idx >= length, period - idx, idx)
        return row[idx]  # (T, n_fft)

    frames = jax.vmap(reflect_gather)(y, lengths)  # (B, T, n_fft)
    # precision=HIGHEST: at default precision the TPU MXU computes these in
    # bf16 passes, which breaks bit-comparability with the numpy golden path
    # near the log-clip floor (BASELINE config 1 gate); fp32 accumulation is
    # mandatory for the feature contract, and this frontend is not a
    # training-throughput hot path.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, dft_real, precision=hi)
    im = jnp.einsum("btn,nk->btk", frames, dft_imag, precision=hi)
    spec = jnp.sqrt(re * re + im * im + 1e-30)  # (B, T, n_bins) magnitude

    n_frames_valid = 1 + lengths // hop  # (B,)
    frame_mask = jnp.arange(t)[None, :] < n_frames_valid[:, None]  # (B, T)

    mel = jnp.einsum("btk,km->bmt", spec, fb, precision=hi)  # (B, n_mels, T)
    if floor == "soft":
        mel = jnp.log(mel + cfg.clip_val)
    else:
        mel = jnp.log(jnp.maximum(mel, cfg.clip_val))
    mel = jnp.where(
        frame_mask[:, None, :], mel, jnp.float32(np.log(cfg.clip_val))
    )

    energy = jnp.linalg.norm(spec, axis=-1)  # (B, T)
    big = jnp.float32(3e38)
    e_min = jnp.min(jnp.where(frame_mask, energy, big), axis=1, keepdims=True)
    e_max = jnp.max(jnp.where(frame_mask, energy, -big), axis=1, keepdims=True)
    energy = (energy - e_min) / jnp.maximum(e_max - e_min, 1e-10)
    energy = jnp.where(frame_mask, energy, 0.0)
    return mel, energy, n_frames_valid

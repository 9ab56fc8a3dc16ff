"""FastSpeech2 composite loss: masked MSEs + SSIM — fully vectorized.

Replicates the reference's loss semantics (fastspeech2/loss.py:62-185) with
its O(B) Python loop replaced by masked reductions, preserving the exact
*per-sample-mean-then-batch-mean* weighting (torch MSELoss('mean') over each
sample's valid slice, then ÷B).

Deliberate fixes vs the reference (documented per SURVEY.md §3.6):
* B3: phone-level pitch/energy predictions are masked with ``phon_len``
  (the reference slices them with mel_length, silently averaging padding).
* Pitch/energy targets are the duration-averaged phone-level tracks the
  model computes (`avg_pitch`/`avg_energy`), as in the reference
  (fastspeech2/loss.py:104-105).

SSIM follows the standard masked formulation used by the reference's
SSIMLoss dependency: per-sample min-max normalization over the valid region,
11×11 Gaussian window (σ=1.5), C1=(0.01)², C2=(0.03)² at data range 1,
loss = 1 − mean SSIM over valid frames, clamped to [0, 1].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from emotts.utils.config import LossConfig


def _masked_per_sample_mse(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
    row_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-sample masked MSE, then batch mean (optionally row-weighted).

    pred/target: (B, T) or (B, T, C); valid: (B, T) bool;
    row_weights: optional (B,) — masks rows out of the batch mean (eval
    batches padded by BucketLoader's pad_to_multiple)."""
    if pred.ndim == 3:
        mask = valid[..., None].astype(pred.dtype)
        per_elem = (pred - target) ** 2 * mask
        denom = valid.sum(axis=1).astype(pred.dtype) * pred.shape[-1]
        per_sample = per_elem.sum(axis=(1, 2)) / jnp.maximum(denom, 1.0)
    else:
        mask = valid.astype(pred.dtype)
        per_elem = (pred - target) ** 2 * mask
        denom = valid.sum(axis=1).astype(pred.dtype)
        per_sample = per_elem.sum(axis=1) / jnp.maximum(denom, 1.0)
    if row_weights is None:
        return per_sample.mean()
    w = row_weights.astype(per_sample.dtype)
    return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)


def _gaussian_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _separable_filter(img: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Gaussian window as two 1-D shift-and-add passes over (B, H, W).

    The obvious formulation — a (B, 1, H, W) conv with a 1×1×11×11 kernel —
    is pathological on TPU: a single-channel conv uses ~none of the MXU and
    its BACKWARD emits more of the same (measured: the SSIM term alone cost
    ~60 ms/step of the FS2 train step's 75 ms).  The outer-product window is
    separable, and an 11-tap scalar-weighted sum of shifted slices is pure
    VPU elementwise work with an equally cheap transpose.  Matches the 2-D
    SAME-padded conv exactly (same zero padding, same weights).
    """
    size = g.shape[0]
    r = size // 2
    b, h, w = img.shape
    pt = jnp.pad(img, ((0, 0), (r, r), (0, 0)))
    img = sum(g[j] * lax.slice(pt, (0, j, 0), (b, j + h, w)) for j in range(size))
    pm = jnp.pad(img, ((0, 0), (0, 0), (r, r)))
    img = sum(g[i] * lax.slice(pm, (0, 0, i), (b, h, i + w)) for i in range(size))
    return img


def _ssim_map(x: jnp.ndarray, y: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """SSIM map over (B, H, W) images (separable Gaussian, SAME padding)."""

    def filt(img):
        return _separable_filter(img, g)

    c1, c2 = 0.01**2, 0.03**2
    mu_x, mu_y = filt(x), filt(y)
    sigma_x = filt(x * x) - mu_x**2
    sigma_y = filt(y * y) - mu_y**2
    sigma_xy = filt(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return num / den


def _sample_minmax_norm(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize each sample over its valid frames → [0, 1]."""
    big = jnp.asarray(3e38, x.dtype)
    m = valid[..., None]
    mn = jnp.min(jnp.where(m, x, big), axis=(1, 2), keepdims=True)
    mx = jnp.max(jnp.where(m, x, -big), axis=(1, 2), keepdims=True)
    out = (x - mn) / jnp.maximum(mx - mn, 1e-8)
    return jnp.where(m, out, 0.0)


_SSIM_KERNEL = _gaussian_1d()


def ssim_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray,
    row_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1 − masked-mean SSIM over (B, T, n_mels) mels, clamped to [0, 1]."""
    if row_weights is not None:
        valid = valid & (row_weights[:, None] > 0)
    kernel = jnp.asarray(_SSIM_KERNEL, pred.dtype)
    x = _sample_minmax_norm(pred, valid)
    y = _sample_minmax_norm(target, valid)
    smap = _ssim_map(x, y, kernel)  # (B, T, n_mels)
    m = valid[..., None].astype(pred.dtype)
    valid_pixels = valid.sum().astype(pred.dtype) * pred.shape[-1]
    mean_ssim = (smap * m).sum() / jnp.maximum(valid_pixels, 1.0)
    return jnp.clip(1.0 - mean_ssim, 0.0, 1.0)


def fs2_loss(
    predictions: Tuple[jnp.ndarray, ...],
    mel_target: jnp.ndarray,  # (B, T, n_mels)
    target_durations: jnp.ndarray,  # (B, P) int
    mel_len: jnp.ndarray,  # (B,)
    phon_len: jnp.ndarray,  # (B,)
    cfg: Optional[LossConfig] = None,
    row_weights: Optional[jnp.ndarray] = None,  # (B,) eval row mask
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    cfg = cfg or LossConfig()
    (
        mel_out,
        postnet_mel_out,
        log_durations,
        pred_pitch,
        avg_pitch,
        pred_energy,
        avg_energy,
        _mel_lens,
    ) = predictions

    t = mel_target.shape[1]
    p = log_durations.shape[1]
    frame_valid = jnp.arange(t)[None, :] < mel_len[:, None]
    phone_valid = jnp.arange(p)[None, :] < phon_len[:, None]

    mel_l = _masked_per_sample_mse(mel_out, mel_target, frame_valid, row_weights)
    postnet_l = _masked_per_sample_mse(
        postnet_mel_out, mel_target, frame_valid, row_weights
    )

    log_tgt_dur = (
        jnp.log1p(target_durations.astype(jnp.float32))
        if cfg.log_scale_durations
        else target_durations.astype(jnp.float32)
    )
    dur_l = _masked_per_sample_mse(
        log_durations, log_tgt_dur, phone_valid, row_weights
    )

    pitch_l = _masked_per_sample_mse(
        pred_pitch[..., 0], avg_pitch[..., 0], phone_valid, row_weights
    )
    energy_l = _masked_per_sample_mse(
        pred_energy[..., 0], avg_energy[..., 0], phone_valid, row_weights
    )

    ssim_l = ssim_loss(mel_out, mel_target, frame_valid, row_weights)

    total = (
        ssim_l * cfg.ssim_loss_weight
        + mel_l * cfg.mel_loss_weight
        + postnet_l * cfg.postnet_mel_loss_weight
        + dur_l * cfg.duration_loss_weight
        + pitch_l * cfg.pitch_loss_weight
        + energy_l * cfg.energy_loss_weight
    )
    return total, {
        "total_loss": total,
        "ssim_loss": ssim_l * cfg.ssim_loss_weight,
        "mel_loss": mel_l * cfg.mel_loss_weight,
        "postnet_mel_loss": postnet_l * cfg.postnet_mel_loss_weight,
        "dur_loss": dur_l * cfg.duration_loss_weight,
        "pitch_loss": pitch_l * cfg.pitch_loss_weight,
        "energy_loss": energy_l * cfg.energy_loss_weight,
    }

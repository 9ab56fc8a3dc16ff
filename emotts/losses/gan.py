"""HiFi-GAN training losses: LSGAN adversarial terms, feature matching, and
log-mel reconstruction.

No reference counterpart — the reference never trains a vocoder (SURVEY.md
§2.2-E6 is inference-only).  Formulation follows HiFi-GAN (Kong et al.,
2020): least-squares GAN objectives, L1 feature matching over every
discriminator layer (weight 2), L1 log-mel loss (weight 45).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def discriminator_loss(
    real_outs: List[jnp.ndarray], fake_outs: List[jnp.ndarray]
) -> jnp.ndarray:
    """Σ_d  E[(1 − D_d(y))²] + E[D_d(ŷ)²]  (LSGAN; ŷ detached by the caller).

    Discriminator outputs arrive in the compute dtype (bf16 by default);
    the squared terms reduce in f32 so the adversarial loss and its
    gradients keep full precision (same convention as
    feature_matching_loss)."""
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        r = r.astype(jnp.float32)
        f = f.astype(jnp.float32)
        loss += jnp.mean(jnp.square(1.0 - r)) + jnp.mean(jnp.square(f))
    return loss


def generator_adversarial_loss(fake_outs: List[jnp.ndarray]) -> jnp.ndarray:
    """Σ_d  E[(1 − D_d(ŷ))²]  (reduced in f32, as above)."""
    loss = 0.0
    for f in fake_outs:
        loss += jnp.mean(jnp.square(1.0 - f.astype(jnp.float32)))
    return loss


def feature_matching_loss(
    real_feats: List[List[jnp.ndarray]], fake_feats: List[List[jnp.ndarray]]
) -> jnp.ndarray:
    """Σ_d Σ_layers  E|feat_real − feat_fake|  (real features detached by the
    caller; gradients flow into the generator through the fake features)."""
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(r.astype(jnp.float32) - f.astype(jnp.float32)))
    return loss


def mel_l1_loss(mel_fake: jnp.ndarray, mel_real: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(mel_fake - mel_real))

"""Rank-model loss: λ-weighted mixup cross-entropy + RankNet-style BCE.

Exact semantics of the reference RankLoss (rank_model/loss.py:16-55),
including its quirk that the cross-entropies are **batch-mean scalars**
weighted per-sample afterwards (torch's F.cross_entropy reduces with 'mean'
before the λ weighting is applied):

    L_mixup = mean_b[ λ_i[b]·CE(h_i, y_emo) + (1−λ_i[b])·CE(h_i, y_neu)
                    + λ_j[b]·CE(h_j, y_emo) + (1−λ_j[b])·CE(h_j, y_neu) ]
    p_ij    = σ(r_i − r_j)
    λ_diff  = (λ_i − λ_j + 1) / 2
    L_rank  = −mean_b[ λ_diff·log(p_ij+ε) + (1−λ_diff)·log(1−p_ij+ε) ]
    L       = α·L_mixup + β·L_rank,   ε = 1e-8
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import optax


def _wmean(x: jnp.ndarray, w) -> jnp.ndarray:
    """Batch mean, optionally weighted by a (B,) row mask/weight vector."""
    if w is None:
        return x.mean()
    w = w.astype(x.dtype)
    return (x * w).sum() / jnp.maximum(w.sum(), 1.0)


def rank_loss(
    predictions: Tuple[jnp.ndarray, ...],
    y_emo: jnp.ndarray,
    alpha: float = 0.1,
    beta: float = 1.0,
    row_weights: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """predictions = (λ_i, λ_j, I_i, I_j, h_i, h_j, r_i, r_j); y_neu ≡ 0
    (neutral is class 0, reference rank_model/train.py:32).

    ``row_weights`` (optional, (B,)) masks rows out of every batch
    reduction — used by eval so rows duplicated by BucketLoader's
    pad_to_multiple don't bias validation metrics."""
    lam_i, lam_j, _, _, hi, hj, ri, rj = predictions
    lam_i = lam_i.reshape(-1)  # (B,)
    lam_j = lam_j.reshape(-1)
    y_neu = jnp.zeros_like(y_emo)

    ce = optax.softmax_cross_entropy_with_integer_labels
    ce_i_emo = _wmean(ce(hi, y_emo), row_weights)
    ce_i_neu = _wmean(ce(hi, y_neu), row_weights)
    ce_j_emo = _wmean(ce(hj, y_emo), row_weights)
    ce_j_neu = _wmean(ce(hj, y_neu), row_weights)

    li = lam_i * ce_i_emo + (1.0 - lam_i) * ce_i_neu  # (B,)
    lj = lam_j * ce_j_emo + (1.0 - lam_j) * ce_j_neu
    l_mixup = _wmean(li + lj, row_weights)

    pij = 1.0 / (1.0 + jnp.exp(-(ri - rj)))  # σ(r_i − r_j)
    lam_diff = (lam_i - lam_j + 1.0) / 2.0
    eps = 1e-8
    l_rank = -_wmean(
        lam_diff * jnp.log(pij + eps) + (1.0 - lam_diff) * jnp.log(1.0 - pij + eps),
        row_weights,
    )

    total = alpha * l_mixup + beta * l_rank
    return total, {"loss": total, "mixup_loss": l_mixup, "rank_loss": l_rank}

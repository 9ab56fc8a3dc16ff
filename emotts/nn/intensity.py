"""IntensityExtractor and RankModel (the emotion-intensity ranking model).

Capability parity with the reference rank model (rank_model/model.py:56-166),
re-designed for TPU:

* The two mixup branches run through the extractor as **one** batched stream
  (``concat([X_i, X_j])`` on the batch axis) instead of two sequential
  forward passes — same math, one GEMM stream that keeps the MXU fed
  (reference calls the extractor twice at rank_model/model.py:156-157).
* Mixup weights λ are sampled from Beta(1,1) (uniform) inside the module
  with a Flax RNG stream, or supplied by the caller (validation uses a
  deterministic linspace grid, bucketization uses λ≡1).
* All shapes static: inputs are padded (B, T, n_mels+2) with a length vector.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emotts.nn.blocks import FFTStack, sequence_mask

# exact (erf) GELU — the torch nn.GELU default the reference uses
# (rank_model/model.py:30); jax's default is the tanh approximation
_gelu_exact = functools.partial(nn.gelu, approximate=False)


class IntensityExtractor(nn.Module):
    """Frame-level emotion-intensity logits I ∈ (B, T, n_emotions).

    Pipeline (reference rank_model/model.py:96-109): Linear(n_mels+2 → H) →
    N× FFT block (GELU conv-FFN, kernel (k, k), post-norm, no final norm) →
    add emotion embedding *after* the stack → zero padded frames →
    Linear(H → n_emotions).
    """

    n_mels: int = 80
    n_heads: int = 2
    n_emotions: int = 5
    n_layers: int = 6
    hidden_dim: int = 384
    kernel_size: int = 9
    ffn_mult: int = 4
    dropout: float = 0.1
    remat: bool = False
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, n_mels + 2)
        lengths: jnp.ndarray,  # (B,)
        emotions: jnp.ndarray,  # (B,) int
        deterministic: bool = True,
    ) -> jnp.ndarray:
        t = x.shape[1]
        valid = sequence_mask(lengths, t)  # (B, T)

        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(
            x.astype(self.dtype)
        )
        h = FFTStack(
            num_layers=self.n_layers,
            d_model=self.hidden_dim,
            n_heads=self.n_heads,
            ffn_dim=self.hidden_dim * self.ffn_mult,
            kernel_sizes=(self.kernel_size, self.kernel_size),
            activation=_gelu_exact,
            dropout=self.dropout,
            normalize_before=False,
            ffn_internal_dropout=True,
            final_norm=False,
            ln_eps=1e-5,  # reference layer uses torch nn.LayerNorm default
                          # (rank_model/model.py:28-29)
            remat=self.remat,
            fused_attention=self.fused_attention,
            dtype=self.dtype,
            name="fft",
        )(h, key_valid=valid, deterministic=deterministic)

        emo_emb = nn.Embed(
            self.n_emotions, self.hidden_dim, dtype=self.dtype, name="emotion_embedding"
        )(emotions)
        h = h + emo_emb[:, None, :]
        h = jnp.where(valid[:, :, None], h, 0.0)
        logits = nn.Dense(self.n_emotions, dtype=self.dtype, name="classifier")(h)
        return logits.astype(jnp.float32)


class RankModel(nn.Module):
    """Mixup + pairwise-ranking head over the IntensityExtractor.

    forward contract matches the reference (rank_model/model.py:138-166):
    returns (λ_i, λ_j, I_i, I_j, h_i, h_j, r_i, r_j)."""

    n_mels: int = 80
    n_heads: int = 2
    n_emotions: int = 5
    n_layers: int = 6
    hidden_dim: int = 384
    kernel_size: int = 9
    ffn_mult: int = 4
    dropout: float = 0.1
    remat: bool = False
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.intensity_extractor = IntensityExtractor(
            n_mels=self.n_mels,
            n_heads=self.n_heads,
            n_emotions=self.n_emotions,
            n_layers=self.n_layers,
            hidden_dim=self.hidden_dim,
            kernel_size=self.kernel_size,
            ffn_mult=self.ffn_mult,
            dropout=self.dropout,
            remat=self.remat,
            fused_attention=self.fused_attention,
            dtype=self.dtype,
        )
        self.projector = nn.Dense(1, use_bias=False, name="projector")

    def __call__(
        self,
        emo_x: jnp.ndarray,  # (B, T, C)
        neu_x: jnp.ndarray,  # (B, T, C)
        emotions: jnp.ndarray,  # (B,)
        lengths: jnp.ndarray,  # (B,)
        lambdas: Optional[jnp.ndarray] = None,  # (2, B) or None → Beta(1,1)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        b = emo_x.shape[0]
        if lambdas is None:
            # Beta(1,1) == Uniform(0,1)
            lambdas = jax.random.uniform(self.make_rng("mixup"), (2, b))
        lam_i = lambdas[0][:, None, None]  # (B, 1, 1)
        lam_j = lambdas[1][:, None, None]

        xi = lam_i * emo_x + (1.0 - lam_i) * neu_x
        xj = lam_j * emo_x + (1.0 - lam_j) * neu_x

        # one batched extractor pass over both mixes (2B, T, C)
        both = jnp.concatenate([xi, xj], axis=0)
        logits = self.intensity_extractor(
            both,
            jnp.concatenate([lengths, lengths], axis=0),
            jnp.concatenate([emotions, emotions], axis=0),
            deterministic=deterministic,
        )
        ii, ij = logits[:b], logits[b:]

        # masked time-average pooling (pad frames are exact zeros)
        denom = lengths[:, None].astype(jnp.float32)
        hi = ii.sum(axis=1) / denom  # (B, n_emotions)
        hj = ij.sum(axis=1) / denom

        ri = self.projector(hi)[:, 0]  # (B,)
        rj = self.projector(hj)[:, 0]
        return lam_i, lam_j, ii, ij, hi, hj, ri, rj

"""Shared Flax building blocks: masks, positional encoding, FFT blocks.

One FFT-block implementation serves both model families (the reference
duplicates it: a hand-rolled ConvTransformerEncoderLayer for the rank model,
rank_model/model.py:8-50, and SpeechBrain's TransformerEncoder with
ffn_type='1dcnn' for FastSpeech2, fastspeech2/model.py:241-267).  The block
is an encoder layer whose feed-forward is a pair of 1-D convolutions:

    y = Norm(x + Dropout(MHA(x)))            (post-norm; pre-norm switchable)
    z = Norm(y + Dropout(Conv_k2(act(Conv_k1(y)))))

Style differences are parameters:
* rank-model style: GELU, kernel sizes (9, 9), dropout also applied inside
  the FFN after the activation.
* FastSpeech2 style: ReLU, kernel sizes (9, 1), dropout only on residuals.

All matmuls run in ``dtype`` (bf16 on TPU) with fp32 params; LayerNorm and
softmax accumulate in fp32.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, T) bool mask; True = valid frame."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def attention_bias_from_mask(valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) key-validity mask → (B, 1, 1, T) additive attention bias."""
    neg = jnp.finfo(dtype).min
    return jnp.where(valid[:, None, None, :], 0.0, neg).astype(dtype)


def sinusoidal_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal table, shape (1, length, d_model); sin on even
    channels, cos on odd (the convention SpeechBrain's PositionalEncoding
    uses, consumed at fastspeech2/model.py:336,422)."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None].astype(np.float32)


class PositionalEncoding(nn.Module):
    """Stateless sinusoidal table provider; the (1, T, D) slice is a trace-time
    constant that XLA folds into the compiled program."""

    d_model: int
    max_len: int = 4096

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[1]
        pe = sinusoidal_positional_encoding(min(t, self.max_len), self.d_model)
        return jnp.asarray(pe, dtype=x.dtype)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with key-padding masking; fp32 softmax.

    The (B, H, T, T) probability tensor is saved for backward; an
    attention-core ``nn.remat`` variant was measured and rejected (B=8
    step unchanged, B=64 step +3% — the probs/mask recompute costs more
    than the traffic it saves; study in BENCH_NOTES.md).  For memory-bound
    scaling use ``FFTStack(remat=True)`` (whole-block rematerialization).
    """

    d_model: int
    n_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    # route the scores→softmax→dropout→AV core through the fused Pallas
    # kernel (emotts.ops.attention): O(T²) tensors never touch HBM.  Param
    # tree is identical either way; dropout streams differ (in-kernel TPU
    # PRNG vs flax), same distribution.
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_valid: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        b, t, _ = x.shape
        h, d = self.n_heads, self.d_model // self.n_heads
        def dense(name):
            return nn.DenseGeneral(features=(h, d), dtype=self.dtype, name=name)

        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        if self.fused:
            from emotts.ops.attention import fused_attention

            rate = 0.0 if deterministic else self.dropout
            if rate > 0.0:
                key = self.make_rng("dropout")
                base = jax.random.key_data(key).reshape(-1)[-1].astype(
                    jnp.int32
                )
                # per-example streams: stable under batch sharding/composition
                seeds = base + jnp.arange(b, dtype=jnp.int32)
            else:
                seeds = jnp.zeros((b,), jnp.int32)
            if key_valid is not None:
                bias = (1.0 - key_valid.astype(jnp.float32)) * -1e9
            else:
                bias = jnp.zeros((b, t), jnp.float32)
            out = fused_attention(q, k, v, bias, seeds, rate)
        else:
            scale = 1.0 / np.sqrt(d)
            logits = (
                jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
            )
            if key_valid is not None:
                logits = logits + attention_bias_from_mask(key_valid)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            weights = nn.Dropout(rate=self.dropout)(
                weights, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = nn.DenseGeneral(
            features=self.d_model, axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)
        return out


class ConvFFN(nn.Module):
    """Two same-padded 1-D convolutions over time with activation between."""

    d_model: int
    ffn_dim: int
    kernel_sizes: Tuple[int, int]
    activation: Callable = nn.relu
    dropout: float = 0.1
    internal_dropout: bool = False  # rank-model style dropout after activation
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        k1, k2 = self.kernel_sizes
        y = nn.Conv(self.ffn_dim, (k1,), padding="SAME", dtype=self.dtype, name="conv1")(x)
        y = self.activation(y)
        if self.internal_dropout:
            y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Conv(self.d_model, (k2,), padding="SAME", dtype=self.dtype, name="conv2")(y)
        return y


class FFTBlock(nn.Module):
    """Transformer encoder layer with convolutional feed-forward."""

    d_model: int
    n_heads: int
    ffn_dim: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    activation: Callable = nn.relu
    dropout: float = 0.1
    normalize_before: bool = False
    ffn_internal_dropout: bool = False
    # LayerNorm epsilon mirrors the counterpart layer being replicated:
    # SpeechBrain's Transformer passes eps=1e-6; the reference rank model's
    # hand-rolled layer uses torch's nn.LayerNorm default 1e-5
    ln_eps: float = 1e-6
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        norm1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="norm2")
        drop = nn.Dropout(rate=self.dropout)

        attn_in = norm1(x).astype(self.dtype) if self.normalize_before else x
        attn = MultiHeadSelfAttention(
            self.d_model, self.n_heads, self.dropout, dtype=self.dtype,
            fused=self.fused_attention, name="attn"
        )(attn_in, key_valid, deterministic)
        x = x + drop(attn, deterministic=deterministic)
        if not self.normalize_before:
            x = norm1(x).astype(self.dtype)

        ffn_in = norm2(x).astype(self.dtype) if self.normalize_before else x
        y = ConvFFN(
            self.d_model,
            self.ffn_dim,
            self.kernel_sizes,
            self.activation,
            self.dropout,
            self.ffn_internal_dropout,
            dtype=self.dtype,
            name="ffn",
        )(ffn_in, deterministic)
        x = x + drop(y, deterministic=deterministic)
        if not self.normalize_before:
            x = norm2(x).astype(self.dtype)
        return x


class FFTStack(nn.Module):
    """N stacked FFT blocks with optional final LayerNorm.

    ``final_norm=False`` matches the rank model's bare nn.TransformerEncoder
    (rank_model/model.py:75, norm=None); ``final_norm=True`` matches
    SpeechBrain's TransformerEncoder which normalizes the stack output
    (used by FastSpeech2's encoder/decoder)."""

    num_layers: int
    d_model: int
    n_heads: int
    ffn_dim: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    activation: Callable = nn.relu
    dropout: float = 0.1
    normalize_before: bool = False
    ffn_internal_dropout: bool = False
    final_norm: bool = False
    ln_eps: float = 1e-6
    # rematerialize each block on the backward pass: activations for the
    # stack cost O(1) layers instead of O(N) — the jax.checkpoint lever for
    # scaling batch/sequence beyond HBM (params and streams unchanged)
    remat: bool = False
    fused_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        block_cls = nn.remat(FFTBlock) if self.remat else FFTBlock
        for i in range(self.num_layers):
            x = block_cls(
                self.d_model,
                self.n_heads,
                self.ffn_dim,
                self.kernel_sizes,
                self.activation,
                self.dropout,
                self.normalize_before,
                self.ffn_internal_dropout,
                ln_eps=self.ln_eps,
                fused_attention=self.fused_attention,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, key_valid, deterministic)
        if self.final_norm:
            x = nn.LayerNorm(
                epsilon=self.ln_eps, dtype=jnp.float32, name="final_norm"
            )(x).astype(self.dtype)
        return x

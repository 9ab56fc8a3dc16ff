"""Fused self-attention Pallas kernel for the FFT blocks.

Replaces the materialized attention path in
``emotts.nn.blocks.MultiHeadSelfAttention`` (scores → fp32 softmax →
probs dropout → AV, reference semantics: nn.TransformerEncoderLayer,
rank_model/model.py:75 / SpeechBrain TransformerEncoder) with one kernel
per (batch, head):

* the (T, T) score/probability matrices live only in VMEM — nothing of
  O(T²) is ever written to HBM, forward or backward;
* backward recomputes probabilities and the dropout mask (same in-kernel
  PRNG seed) flash-attention-style, so the residuals are just q, k, v;
* key-padding handled as an additive f32 bias row; fp32 softmax exactly
  like the reference path; probabilities cast to the compute dtype before
  dropout/AV, mirroring the unfused path when deterministic.

Shapes here are small-T TTS workloads (T ≤ 512 buckets, d_head 192): a
whole (512, 512) f32 score block is 1 MB — far under VMEM — so no online
softmax tiling is needed; the win is purely HBM traffic (probs + dropout
mask saves) and fusion.

Dropout uses the TPU hardware PRNG (`pltpu.prng_seed` per (b, h) program)
— streams differ from the flax path (exactly like ``train.rng_impl=rbg``
already differs per backend), deterministic given the step-derived seed.
The PRNG primitives are TPU-only, so CPU interpret-mode tests cover the
deterministic path (rate=0); the dropout path is validated statistically
on device (tests/test_fused_attention.py device mark).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by CPU tests


def _seed_block(seed_ref):
    """Seed the per-core PRNG uniquely per (b, h) grid program."""
    b, h = pl.program_id(0), pl.program_id(1)
    nh = pl.num_programs(1)
    pltpu.prng_seed(seed_ref[0] + b * nh + h)


def _keep_mask(shape, rate: float):
    """Keep-mask via in-kernel PRNG; threshold compare on raw uint32 bits."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return bits >= thresh  # keep where True


def _probs(q_ref, k_ref, bias_ref, scale, dtype):
    """(T, T) probabilities in `dtype`, fp32 softmax — shared fwd/bwd."""
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0, :][None, :].astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1).astype(dtype)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale: float, rate: float):
    dtype = q_ref.dtype
    p = _probs(q_ref, k_ref, bias_ref, scale, dtype)
    if rate > 0.0:
        _seed_block(seed_ref)
        keep = _keep_mask(p.shape, rate)
        p = jnp.where(keep, p / (1.0 - rate), jnp.zeros_like(p))
    o = jax.lax.dot_general(
        p, v_ref[0, :, 0, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, 0, :] = o.astype(dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, rate: float):
    dtype = q_ref.dtype
    f32 = jnp.float32
    p = _probs(q_ref, k_ref, bias_ref, scale, dtype)  # pre-dropout probs
    if rate > 0.0:
        _seed_block(seed_ref)
        keep = _keep_mask(p.shape, rate)
        pd = jnp.where(keep, p / (1.0 - rate), jnp.zeros_like(p))
    else:
        pd = p
    do = do_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    # dV = dropout(P)^T dO
    dv = jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    # dPdropped = dO V^T ; back through dropout ; softmax jacobian in fp32
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    if rate > 0.0:
        dp = jnp.where(keep, dpd / (1.0 - rate), jnp.zeros_like(dpd))
    else:
        dp = dpd
    p32 = p.astype(f32)
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    ds = (ds * scale).astype(dtype)
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dq_ref[0, :, 0, :] = dq.astype(dtype)
    dk_ref[0, :, 0, :] = dk.astype(dtype)
    dv_ref[0, :, 0, :] = dv.astype(dtype)


def _grid_spec(b, t, h, d, n_tensor_in: int, n_out: int):
    # index maps get the prefetched scalar ref appended (*_)
    tensor = pl.BlockSpec((1, t, 1, d), lambda i, j, *_: (i, 0, j, 0))
    bias = pl.BlockSpec((1, t), lambda i, j, *_: (i, 0))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the seed
        grid=(b, h),
        in_specs=[tensor] * 3 + [bias] + [tensor] * (n_tensor_in - 3),
        out_specs=[tensor] * n_out if n_out > 1 else tensor,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, bias, seed, rate: float = 0.0,
                    interpret: Optional[bool] = None):
    """Fused multi-head self-attention.

    q, k, v: (B, T, H, D) in the compute dtype; bias: (B, T) additive key
    bias (0.0 valid, -1e9 pad) broadcast over queries and heads; seed:
    (1,) int32 (dropout stream, unused at rate=0).  Returns (B, T, H, D).
    """
    out, _ = _fused_fwd(q, k, v, bias, seed, rate, interpret)
    return out


def _fused_fwd(q, k, v, bias, seed, rate, interpret):
    b, t, h, d = q.shape
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=1.0 / float(np.sqrt(d)), rate=rate
        ),
        grid_spec=_grid_spec(b, t, h, d, n_tensor_in=3, n_out=1),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET if interpret is None else interpret,
    )(seed, q, k, v, bias)
    return out, (q, k, v, bias, seed)


def _fused_bwd(rate, interpret, residuals, g):
    q, k, v, bias, seed = residuals
    b, t, h, d = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=1.0 / float(np.sqrt(d)), rate=rate
        ),
        grid_spec=_grid_spec(b, t, h, d, n_tensor_in=4, n_out=3),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=_INTERPRET if interpret is None else interpret,
    )(seed, q, k, v, bias, g)
    return dq, dk, dv, None, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)

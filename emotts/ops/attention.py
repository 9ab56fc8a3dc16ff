"""Fused self-attention Pallas kernel for the FFT blocks.

Replaces the materialized attention path in
``emotts.nn.blocks.MultiHeadSelfAttention`` (scores → fp32 softmax →
probs dropout → AV, reference semantics: nn.TransformerEncoderLayer,
rank_model/model.py:75 / SpeechBrain TransformerEncoder) with one kernel
per (batch, head):

* the (T, T) score/probability matrices live only in VMEM — nothing of
  O(T²) is ever written to HBM, forward or backward;
* backward recomputes probabilities and the dropout mask (same in-kernel
  PRNG seeds) flash-attention-style, so the residuals are just q, k, v;
* key-padding handled as an additive f32 bias row; fp32 softmax exactly
  like the reference path; probabilities cast to the compute dtype before
  dropout/AV, mirroring the unfused path when deterministic.

Shapes here are small-T TTS workloads (T ≤ 512 buckets, d_head 192): a
whole (512, 512) f32 score block is 1 MB — far under VMEM — so no online
softmax tiling is needed; the win is purely HBM traffic (probs + dropout
mask saves) and fusion.

Dropout uses the TPU hardware PRNG seeded per (example, head) from a
per-example int32 seed vector — streams differ from the flax path (exactly
like ``train.rng_impl=rbg`` already differs per backend), deterministic
given the step-derived seeds, and stable per example regardless of batch
composition or sharding.  The PRNG primitives are TPU-only, so CPU
interpret-mode tests cover the deterministic path (rate=0); the dropout
path is validated statistically on device
(tests/test_fused_attention.py device mark).

SPMD: the kernels carry a ``custom_partitioning`` batch rule — under a
pjit mesh the batch axis splits across devices and each shard runs its own
grid (no gather); T/H/D are forced replicated by the partition callback.
Verified exact on the virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

_INTERPRET = False  # flipped by CPU tests

# odd constant (golden-ratio hash) decorrelating per-head streams from the
# per-example seed; int32 wrap-around is fine for seeding
_HEAD_MIX = np.int32(-1640531527)


def _seed_block(seed_ref):
    """Seed the per-core PRNG per (example, head) grid program."""
    i, h = pl.program_id(0), pl.program_id(1)
    pltpu.prng_seed(seed_ref[i] + h * _HEAD_MIX)


def _keep_mask(shape, rate: float):
    """Keep-mask via in-kernel PRNG; threshold compare on raw uint32 bits."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return bits >= thresh  # keep where True


def _probs(q_ref, k_ref, bias_ref, scale, dtype):
    """(T, T) probabilities in `dtype`, fp32 softmax — shared fwd/bwd."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0, 0][None, :].astype(jnp.float32)
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
        p, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(dtype)


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
    do = do_ref[0, 0]
    v = v_ref[0, 0]
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
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dq_ref[0, 0] = dq.astype(dtype)
    dk_ref[0, 0] = dk.astype(dtype)
    dv_ref[0, 0] = dv.astype(dtype)


def _grid_spec(b, t, h, d, n_tensor_in: int, n_out: int):
    # kernels consume (B, H, T, D): the blocked (T, D) tile must sit in the
    # LAST two axes — the TPU lowering requires the trailing block dims to
    # be (8, 128)-divisible or span the whole array axis, which a size-1
    # head block in position -2 violates.  Index maps get the prefetched
    # scalar ref appended (*_).
    tensor = pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0))
    # bias rides as (B, 1, T) so its trailing block dims are (1 == axis, T)
    bias = pl.BlockSpec((1, 1, t), lambda i, j, *_: (i, 0, 0))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the per-example seeds
        grid=(b, h),
        in_specs=[tensor] * 3 + [bias] + [tensor] * (n_tensor_in - 3),
        out_specs=[tensor] * n_out if n_out > 1 else tensor,
    )


def _bthd(x):
    """(B, T, H, D) module layout ↔ (B, H, T, D) kernel layout."""
    return jnp.transpose(x, (0, 2, 1, 3))


def _fwd_impl(q, k, v, bias, seeds, rate: float, interpret):
    b, t, h, d = q.shape
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=1.0 / float(np.sqrt(d)), rate=rate
        ),
        grid_spec=_grid_spec(b, t, h, d, n_tensor_in=3, n_out=1),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=_INTERPRET if interpret is None else interpret,
    )(seeds, _bthd(q), _bthd(k), _bthd(v), bias[:, None, :])
    return _bthd(out)


def _bwd_impl(q, k, v, bias, seeds, g, rate: float, interpret):
    b, t, h, d = q.shape
    grads = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=1.0 / float(np.sqrt(d)), rate=rate
        ),
        grid_spec=_grid_spec(b, t, h, d, n_tensor_in=4, n_out=3),
        out_shape=[jax.ShapeDtypeStruct((b, h, t, d), q.dtype)] * 3,
        interpret=_INTERPRET if interpret is None else interpret,
    )(seeds, _bthd(q), _bthd(k), _bthd(v), bias[:, None, :], _bthd(g))
    return tuple(_bthd(x) for x in grads)


# ---------------------------------------------------------------------------
# SPMD batch-partitioning rules: batch splits across devices, each shard
# runs its own (local_b, h) grid; everything else is forced replicated.
# ---------------------------------------------------------------------------


def _batch_axis(arg_infos):
    spec = getattr(arg_infos[0].sharding, "spec", None)
    return spec[0] if spec else None


def _shardings(mesh, b_axis, n_tensor: int, with_grad: bool):
    tsr = NamedSharding(mesh, P(b_axis, None, None, None))
    args = [tsr] * 3 + [NamedSharding(mesh, P(b_axis, None)),
                        NamedSharding(mesh, P(b_axis))]
    if with_grad:
        args.append(tsr)
    return tsr, tuple(args)


def _fwd_infer(rate, interpret, mesh, arg_infos, result_infos):
    return NamedSharding(mesh, P(_batch_axis(arg_infos), None, None, None))


def _fwd_partition(rate, interpret, mesh, arg_infos, result_infos):
    tsr, args = _shardings(mesh, _batch_axis(arg_infos), 3, with_grad=False)
    fn = functools.partial(_fwd_impl, rate=rate, interpret=interpret)
    return mesh, fn, tsr, args


def _bwd_infer(rate, interpret, mesh, arg_infos, result_infos):
    tsr = NamedSharding(mesh, P(_batch_axis(arg_infos), None, None, None))
    return (tsr, tsr, tsr)


def _bwd_partition(rate, interpret, mesh, arg_infos, result_infos):
    tsr, args = _shardings(mesh, _batch_axis(arg_infos), 4, with_grad=True)
    fn = functools.partial(_bwd_impl, rate=rate, interpret=interpret)
    return mesh, fn, (tsr, tsr, tsr), args


_fwd_part = custom_partitioning(_fwd_impl, static_argnums=(5, 6))
_fwd_part.def_partition(
    infer_sharding_from_operands=_fwd_infer,
    partition=_fwd_partition,
    sharding_rule="b t h d, b t h d, b t h d, b t, b -> b t h d",
)

_bwd_part = custom_partitioning(_bwd_impl, static_argnums=(6, 7))
_bwd_part.def_partition(
    infer_sharding_from_operands=_bwd_infer,
    partition=_bwd_partition,
    sharding_rule=("b t h d, b t h d, b t h d, b t, b, b t h d "
                   "-> b t h d, b t h d, b t h d"),
)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, bias, seeds, rate: float = 0.0,
                    interpret: Optional[bool] = None):
    """Fused multi-head self-attention.

    q, k, v: (B, T, H, D) in the compute dtype; bias: (B, T) additive key
    bias (0.0 valid, -1e9 pad) broadcast over queries and heads; seeds:
    (B,) int32 per-example dropout streams (unused at rate=0).
    Returns (B, T, H, D).
    """
    out, _ = _fused_fwd(q, k, v, bias, seeds, rate, interpret)
    return out


def _fused_fwd(q, k, v, bias, seeds, rate, interpret):
    out = _fwd_part(q, k, v, bias, seeds, rate, interpret)
    return out, (q, k, v, bias, seeds)


def _fused_bwd(rate, interpret, residuals, g):
    q, k, v, bias, seeds = residuals
    dq, dk, dv = _bwd_part(q, k, v, bias, seeds, g, rate, interpret)
    return dq, dk, dv, None, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def resolve_fused_attention(flag, batch_size=None) -> bool:
    """Resolve a config fused-attention flag (True/False/None=auto).

    Auto enables the Pallas kernel only where it was MEASURED to win on the
    chip (BENCH_NOTES.md "Fused Pallas attention"): TPU backend AND training
    batch >= 32 (full-size FS2 step 116.8 -> 107.3 ms at B=64, 1.09x; rank
    step 207.5 -> 187.1 ms at B=64, 1.11x; both neutral at B=8).  Everywhere
    unmeasured (CPU, small batch, inference builders that don't pass a
    batch) auto resolves to the XLA attention path.
    """
    if flag is not None:
        return bool(flag)
    if not batch_size or batch_size < 32:
        return False
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:  # uninitialised backend: stay on the portable path
        return False

"""Pallas TPU kernel: one fully-fused HiFi-GAN MRF stage.

The vocoder's multi-receptive-field stage — THREE ResBlock1s (kernel sizes
3/7/11, dilations (1,3,5) each) whose outputs are averaged — dominates the
synthesis RTF (reference path: SpeechBrain ``HIFIGAN.decode_batch``,
fastspeech2/inference.py:83).  Under XLA each of the 18 convolutions is a
separate HBM round trip (~48× the activation size per stage in traffic);
this kernel reads every activation tile from HBM exactly once, runs the
whole MRF on the VMEM-resident tile, and writes the averaged result once.

Design (see BENCH_NOTES.md for the measured roofline):

* **Polyphase time-packing inside the kernel**: narrow stages (C = 32/64)
  are processed in the packed domain (F = 128 // C consecutive time steps
  folded into channels) so every matmul is a full-lane
  ``(L, 128) @ (128, 128)``.  Each original conv becomes k' "shift taps":
  ``y'[m] = Σ_q x'[m+q] @ W'_q`` with W'_q the (F·C, F·C) block matrix from
  :func:`emotts.ops.polyphase.pack_conv_weights`.  FLOP inflation vs the
  unpacked math (2.3×/2.9× at C=64/32) is structural on a 128-lane MXU —
  the alternative (unpacked matmuls) wastes the same factor in idle lanes.
* **Shift taps via ``pltpu.roll``** on the halo-extended tile: circular
  wrap only contaminates positions inside the discarded halo.
* **Double-buffered halo DMA**: tile i+1's HBM copy is issued before tile
  i's compute, so the (small) input traffic never stalls the MXU.
* fp32 accumulation (``preferred_element_type``); inter-op values are kept
  in the input dtype to match the XLA path's bf16 semantics.

The pure-JAX semantics are ``mean(packed_resblock1(x, …) for each k)``
(= ``emotts.nn.hifigan.ResBlock1`` math averaged) and tests pin exact
agreement in fp32 interpret mode.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# host-side plan: packed shift-tap weights for every conv in the stage
# ---------------------------------------------------------------------------


from emotts.ops.polyphase import conv_shift_set as _conv_plan
from emotts.ops.polyphase import pack_weight_blocks as _pack_weight_blocks


class _StagePlan:
    """Static layout of the stacked weight/bias buffers for one MRF stage."""

    def __init__(
        self,
        kernel_sizes: Sequence[int],
        dilations: Sequence[int],
        channels: int,
        factor: int,
    ):
        self.kernel_sizes = tuple(kernel_sizes)
        self.dilations = tuple(dilations)
        self.channels = channels
        self.factor = factor
        self.fc = channels * factor
        # per conv, in kernel-execution order:
        #   resblock r → dilation stage s → (conv1 @ d_s, conv2 @ 1)
        self.convs: List[Tuple[Tuple[int, ...], int, int]] = []  # (shifts, w_off, b_idx)
        w_off = b_idx = 0
        for k in self.kernel_sizes:
            for d in self.dilations:
                for dil in (d, 1):
                    shifts = _conv_plan(k, dil, factor)
                    self.convs.append((tuple(shifts), w_off, b_idx))
                    w_off += len(shifts)
                    b_idx += 1
        self.total_taps = w_off
        self.n_convs = b_idx
        # one-sided halo (packed rows): total receptive-field creep of the
        # deepest chain, rounded to the 8-sublane tiling for legal DMA slices
        halo = 0
        for k in self.kernel_sizes:
            r = (k - 1) // 2
            creep = sum(r * d + r for d in self.dilations)
            halo = max(halo, -(-creep // factor))
        self.halo = -(-halo // 8) * 8

    def stack_weights(self, params, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """params: per resblock (w1 (n_d,k,C,C), b1, w2, b2) → stacked
        (total_taps, FC, FC) weights + (n_convs, FC) biases."""
        f = self.factor
        ws, bs = [], []
        for (w1, b1, w2, b2), k in zip(params, self.kernel_sizes):
            for si, d in enumerate(self.dilations):
                ws.append(_pack_weight_blocks(w1[si].astype(dtype), d, f))
                bs.append(jnp.tile(b1[si], f))
                ws.append(_pack_weight_blocks(w2[si].astype(dtype), 1, f))
                bs.append(jnp.tile(b2[si], f))
        return jnp.concatenate(ws, axis=0), jnp.stack(bs).astype(jnp.float32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _mrf_kernel(
    x_hbm,  # (B, M_padded, FC) packed input in HBM (halo+tail pre-padded)
    w_ref,  # (total_taps, FC, FC) VMEM
    b_ref,  # (n_convs, FC) VMEM
    out_ref,  # (1, tile, FC) VMEM block
    scratch,  # (2, L, FC) VMEM
    sems,  # (2,) DMA semaphores
    *,
    plan: _StagePlan,
    tile: int,
    n_tiles: int,
    m_orig: int,
):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    halo = plan.halo
    l = tile + 2 * halo
    n_rb = len(plan.kernel_sizes)
    n_stages = len(plan.dilations)

    g = bi * n_tiles + ti
    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    def dma(gi, s):
        b2 = gi // n_tiles
        t2 = jax.lax.rem(gi, n_tiles)
        return pltpu.make_async_copy(
            x_hbm.at[b2, pl.ds(t2 * tile, l), :], scratch.at[s], sems.at[s]
        )

    @pl.when(g == 0)
    def _first():
        dma(g, slot).start()

    @pl.when(g + 1 < pl.num_programs(0) * n_tiles)
    def _prefetch():
        dma(g + 1, nxt).start()

    dma(g, slot).wait()

    x = scratch[slot]  # (L, FC), input dtype
    # rows outside the true sequence must stay exactly 0 through the block
    # (matches the reference's zero-padded conv inputs)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) + ti * tile - halo
    in_seq = (row >= 0) & (row < m_orig)

    def conv(y, ci):
        """One packed conv as a single im2col matmul.

        ``Σ_q roll(y, -q) @ W_q`` is computed as ``concat_q(roll(y, -q)) @
        concat_q(W_q)`` — one (L, k'·FC) × (k'·FC, FC) dot.  One matmul per
        conv keeps the tap accumulation INSIDE the MXU; per-tap dots would
        round-trip a (L, FC) fp32 accumulator through the VPU between taps,
        which measures ~15% slower.  Static-shift rolls are two slices + a
        concat (pltpu.roll lowers to tpu.dynamic_rotate, which Mosaic only
        implements for 32-bit element types — bf16 tiles fail to compile).
        """
        shifts, w_off, b_idx = plan.convs[ci]
        cols = []
        for q in shifts:
            shift = (-q) % l
            cols.append(
                jnp.concatenate([y[l - shift :], y[: l - shift]], axis=0)
                if shift
                else y
            )
        z = jnp.concatenate(cols, axis=1)  # (L, k'·FC)
        w = w_ref[w_off : w_off + len(shifts)].reshape(len(shifts) * plan.fc, plan.fc)
        acc = jnp.dot(z, w, preferred_element_type=jnp.float32)
        return acc + b_ref[b_idx]

    avg = jnp.zeros((l, plan.fc), jnp.float32)
    for rb in range(n_rb):
        buf = x[...].astype(jnp.float32)
        for s in range(n_stages):
            ci = (rb * n_stages + s) * 2
            y = jnp.where(buf > 0, buf, buf * LRELU_SLOPE).astype(x.dtype)
            z = conv(y, ci)
            z = jnp.where(z > 0, z, z * LRELU_SLOPE)
            z = jnp.where(in_seq, z, 0.0).astype(x.dtype)
            buf = jnp.where(in_seq, buf + conv(z, ci + 1), 0.0)
        avg = avg + buf
    avg = avg / n_rb
    out_ref[0] = avg[halo : halo + tile].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def fused_mrf_stage(
    x: jnp.ndarray,  # (B, T, C)
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilations: Sequence[int] = (1, 3, 5),
    tile: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Whole MRF stage (mean of ResBlock1 outputs) in one fused kernel.

    Args:
      x: (B, T, C) activations; C must divide 128 (C ∈ {32, 64, 128}) and T
        must be divisible by 128 // C.
      params: per resblock, the (w1, b1, w2, b2) stack from
        ``ResBlock1._stacked_params`` — w (n_d, k, C, C), b (n_d, C).
      tile: packed-row tile length (defaults: 1024 at F=1, 512 otherwise).
      interpret: None → compiled on TPU, interpreter elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    assert 128 % c == 0, f"C={c} must divide 128"
    factor = 128 // c
    assert t % factor == 0, (t, factor)
    plan = _StagePlan(kernel_sizes, dilations, c, factor)
    if tile is None:
        tile = 1024 if factor == 1 else 512

    w_stack, b_stack = plan.stack_weights(params, x.dtype)

    m = t // factor
    xp = x.reshape(b, m, plan.fc)  # pack_time
    tile = min(tile, max(8, m))
    n_tiles = pl.cdiv(m, tile)
    m_pad = n_tiles * tile
    halo = plan.halo
    xp = jnp.pad(xp, ((0, 0), (halo, halo + (m_pad - m)), (0, 0)))

    kernel = functools.partial(
        _mrf_kernel, plan=plan, tile=tile, n_tiles=n_tiles, m_orig=m
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual halo DMA
            pl.BlockSpec(w_stack.shape, lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_stack.shape, lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, plan.fc), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, plan.fc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * halo, plan.fc), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_pad * plan.total_taps * plan.fc * plan.fc,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w_stack, b_stack)
    return out[:, :m, :].reshape(b, m * factor, c)


def mrf_reference(
    x: jnp.ndarray,
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    kernel_sizes: Sequence[int] = (3, 7, 11),
    dilations: Sequence[int] = (1, 3, 5),
) -> jnp.ndarray:
    """Pure-JAX semantics: mean of ResBlock1 outputs (tests compare to this)."""
    from emotts.ops.resblock import resblock1_reference

    outs = [
        resblock1_reference(x, w1, b1, w2, b2, tuple(dilations))
        for (w1, b1, w2, b2) in params
    ]
    return sum(outs) / len(outs)

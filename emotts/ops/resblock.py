"""Pallas TPU kernel: fused HiFi-GAN ResBlock (multi-receptive-field stage).

The vocoder's ResBlocks dominate the synthesis RTF: at the late upsample
stages the activation tensor is huge (T up to mel_frames × 256) and each
block chains six small convolutions with leaky-relus and residual adds —
a textbook HBM-bandwidth-bound pattern when each op round-trips to HBM.
This kernel keeps one time-tile of activations resident in VMEM through the
whole block (3 dilations × 2 convs + residuals ≈ 13 elementwise/matmul ops
per tile, one HBM read + one HBM write).

Design:
* grid over (batch, time tiles); the input is zero-padded by the block's
  total receptive-field halo so every tile computes its center exactly;
* convolution taps are expressed as `pltpu.roll` (circular time shift) +
  (L, C) × (C, C) matmuls — circular wrap only contaminates positions inside
  the discarded halo, and the matmuls land on the MXU;
* weights for all taps/dilations live in VMEM for the whole tile
  (n_d × k × C × C, bf16-friendly sizes at the vocoder's 32–256 channels);
* fp32 accumulation via preferred_element_type.

The pure-JAX mirror (`resblock1_reference`) defines the semantics (matching
emotts.nn.hifigan.ResBlock1) and is what tests compare against.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def block_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Total one-sided receptive field of the chained block, rounded up to
    the TPU sublane tiling (8) so DMA slice shapes stay aligned."""
    r = (kernel_size - 1) // 2
    h = sum(r * d + r for d in dilations)
    return (h + 7) // 8 * 8


def resblock1_reference(
    x: jnp.ndarray,  # (B, T, C)
    w1: jnp.ndarray,  # (n_d, k, C, C)
    b1: jnp.ndarray,  # (n_d, C)
    w2: jnp.ndarray,  # (n_d, k, C, C)
    b2: jnp.ndarray,  # (n_d, C)
    dilations: Tuple[int, ...],
) -> jnp.ndarray:
    """Pure-JAX semantics (same math as nn.hifigan.ResBlock1)."""
    from jax import lax

    def conv(y, w, dil):
        k = w.shape[0]
        pad = (k - 1) // 2 * dil
        return lax.conv_general_dilated(
            y, w, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    for i, d in enumerate(dilations):
        y = jax.nn.leaky_relu(x, LRELU_SLOPE)
        y = conv(y, w1[i], d) + b1[i]
        y = jax.nn.leaky_relu(y, LRELU_SLOPE)
        y = conv(y, w2[i], 1) + b2[i]
        x = x + y
    return x


def _kernel(
    x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, k, dilations, halo, tile,
    t_orig,
):
    """One (batch, tile) program: DMA an overlapping halo window from HBM,
    run the whole block on the VMEM-resident buffer, write the tile center."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    l = tile + 2 * halo
    c = (k - 1) // 2

    def body(scratch, sem):
        copy = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * tile, l), :], scratch, sem
        )
        copy.start()
        copy.wait()
        buf = scratch[...].astype(jnp.float32)  # (L, C)
        # sequence-edge mask: the reference zero-pads every conv stage's
        # input, so positions outside [0, t_orig) must be forced back to 0
        # after each residual stage (bias terms would otherwise leak in)
        orig_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) + ti * tile - halo
        )
        in_seq = (orig_pos >= 0) & (orig_pos < t_orig)
        for i, d in enumerate(dilations):
            y = jnp.where(buf > 0, buf, buf * LRELU_SLOPE)
            acc = jnp.broadcast_to(b1_ref[i], y.shape).astype(jnp.float32)
            for tap in range(k):
                shift = (-(tap - c) * d) % y.shape[0]
                shifted = pltpu.roll(y, shift, axis=0) if shift else y
                acc = acc + jnp.dot(
                    shifted, w1_ref[i, tap], preferred_element_type=jnp.float32
                )
            # the reference zero-pads conv2's input too: mask the
            # intermediate activation outside the sequence
            z = jnp.where(acc > 0, acc, acc * LRELU_SLOPE)
            z = jnp.where(in_seq, z, 0.0)
            acc2 = jnp.broadcast_to(b2_ref[i], z.shape).astype(jnp.float32)
            for tap in range(k):
                shift = (-(tap - c)) % z.shape[0]
                shifted = pltpu.roll(z, shift, axis=0) if shift else z
                acc2 = acc2 + jnp.dot(
                    shifted, w2_ref[i, tap], preferred_element_type=jnp.float32
                )
            buf = jnp.where(in_seq, buf + acc2, 0.0)
        out_ref[0] = buf[halo : halo + tile].astype(out_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((l, out_ref.shape[2]), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def fused_resblock1(
    x: jnp.ndarray,  # (B, T, C)
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    dilations: Tuple[int, ...],
    tile: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """VMEM-fused ResBlock1; matches resblock1_reference on the valid span.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (so the same model code runs in CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, ch = x.shape
    # VMEM budget: blocked VMEM operands are double-buffered by the Mosaic
    # pipeline, so the weights cost 2× their size on-chip.  When the
    # all-dilation weight set would blow the ~16 MB budget (the vocoder's
    # k=11, C=256 stage), chain one kernel call per dilation instead —
    # each stage still fuses its 6 ops into one HBM round trip.
    weight_bytes = (w1.size + w2.size) * 4
    if len(dilations) > 1 and 2 * weight_bytes > 10 * 1024 * 1024:
        for i, d in enumerate(dilations):
            x = fused_resblock1(
                x, w1[i : i + 1], b1[i : i + 1], w2[i : i + 1], b2[i : i + 1],
                (d,), tile=tile, interpret=interpret,
            )
        return x
    if weight_bytes > 6 * 1024 * 1024:
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)
    # Mosaic requires DMA slices lane-aligned (128 channels).  Zero-pad
    # narrow stages: the padded channels stay exactly 0 through the block
    # (zero weights/biases, leaky_relu(0)=0, zero residual) and the MXU time
    # is unchanged (lanes were padded internally anyway).
    if ch % 128 != 0:
        ch_pad = (ch + 127) // 128 * 128
        extra = ch_pad - ch

        def pad_w(w):
            return jnp.pad(w, ((0, 0), (0, 0), (0, extra), (0, extra)))

        out = fused_resblock1(
            jnp.pad(x, ((0, 0), (0, 0), (0, extra))),
            pad_w(w1),
            jnp.pad(b1, ((0, 0), (0, extra))),
            pad_w(w2),
            jnp.pad(b2, ((0, 0), (0, extra))),
            dilations,
            tile=tile,
            interpret=interpret,
        )
        return out[..., :ch]
    # wide stages keep ~6 live (L, C) fp32 buffers in VMEM next to the
    # weights; shrink the tile so the total stays under the 16 MB budget
    if ch > 128:
        tile = min(tile, 512)
    k = w1.shape[1]
    halo = block_halo(k, dilations)
    tile = min(tile, max(128, t))
    n_tiles = pl.cdiv(t, tile)
    t_pad = n_tiles * tile

    # zero-pad: halo on both sides + tail padding to a whole number of tiles
    x_padded = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))

    kernel = functools.partial(
        _kernel, k=k, dilations=tuple(dilations), halo=halo, tile=tile, t_orig=t
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(w1.shape, lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, ch), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, ch), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * ch * ch * k * 2 * len(dilations),
            bytes_accessed=x.size * 4 * 2,
            transcendentals=0,
        ),
    )(x_padded, w1, b1, w2, b2)
    return out[:, :t, :]

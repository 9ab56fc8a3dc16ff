"""Polyphase time-packing: full-lane matmuls for narrow-channel convs.

The HiFi-GAN vocoder's late stages run 1-D convs at 32–64 channels over very
long time axes.  On TPU the MXU processes 128 lanes per cycle, so a C=32
conv wastes 15/16 of the systolic array.  This module **losslessly**
re-expresses such convs at C·F channels (F = 128 // C) by folding F
consecutive time steps into the channel axis (space-to-depth on time) and
transforming the weights accordingly:

    y[t] = Σ_j x[t + (j−r)·d] · W[j]            (dilation-d conv, k taps)
    t = F·m + p   ⇒   y'[m] = Σ_q x'[m+q] · W'_q

with W'_q a (F·C, F·C) block matrix scattering each original tap to the
(input-phase, output-phase) block it lands in.  FLOPs grow by the block
sparsity of W', but effective MXU throughput grows by F², a net win for
C < 128 (measured; see BENCH_NOTES.md).

All ops in the HiFi-GAN ResBlock (leaky-relu, bias add, residual) are
elementwise and commute with the packing, so whole MRF stages run packed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


def pack_time(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, T, C) → (B, T/F, F·C); x'[m, p·C + c] = x[F·m + p, c]."""
    b, t, c = x.shape
    assert t % factor == 0, (t, factor)
    return x.reshape(b, t // factor, factor * c)


def unpack_time(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Inverse of pack_time."""
    b, m, fc = x.shape
    return x.reshape(b, m * factor, fc // factor)


def conv_shift_set(k: int, dilation: int, factor: int) -> list:
    """Exact packed-domain shift set: output row m needs input rows m+q for
    these q only (a dilated conv's absent taps are skipped — materializing
    them would inflate FLOPs ~d× at factor 1)."""
    r = (k - 1) // 2
    offsets = [p + (j - r) * dilation for p in range(factor) for j in range(k)]
    return sorted({o // factor for o in offsets})


def pack_weight_blocks(
    w: jnp.ndarray,  # (k, C, C) flax layout (tap, in, out)
    dilation: int,
    factor: int,
    shifts=None,  # explicit shift list; default: conv_shift_set(...)
) -> jnp.ndarray:
    """(k, C, C) conv weights → (k', F·C, F·C) shift-tap matrices, one per
    entry of ``shifts``.

    Built as ONE gather + mask (w[J] over a static index map), not per-block
    scatters: w is a runtime input (model params), so any construction ops
    run on device on EVERY call — k·F separate ``.at[].set`` scatters would
    cost real milliseconds per vocoder pass.
    """
    k, c_in, c_out = w.shape
    assert c_in == c_out
    r = (k - 1) // 2
    f = factor
    if shifts is None:
        shifts = conv_shift_set(k, dilation, f)
    qidx = {q: i for i, q in enumerate(shifts)}

    # static map: (shift, pin, p) → original tap j (or masked out)
    jmap = np.zeros((len(shifts), f, f), np.int32)
    valid = np.zeros((len(shifts), f, f), bool)
    for p in range(f):
        for j in range(k):
            o = p + (j - r) * dilation
            jmap[qidx[o // f], o % f, p] = j
            valid[qidx[o // f], o % f, p] = True

    gathered = jnp.asarray(w)[jnp.asarray(jmap)]  # (k', F, F, C, C)
    gathered = jnp.where(jnp.asarray(valid)[..., None, None], gathered, 0)
    # (k', pin, p, c_in, c_out) → (k', pin·C_in, p·C_out)
    return jnp.transpose(gathered, (0, 1, 3, 2, 4)).reshape(
        len(shifts), f * c_in, f * c_out
    )


def pack_conv_weights(
    w: np.ndarray,  # (k, C, C) flax layout (tap, in, out)
    dilation: int,
    factor: int,
) -> Tuple[jnp.ndarray, int, int]:
    """Transform conv weights into the packed CONV form (contiguous taps).

    Returns (w_packed (k', F·C, F·C), pad_lo, pad_hi) such that
        y' = conv(x', w_packed, padding=(pad_lo, pad_hi))
    equals the packed original conv output.  (lax.conv needs the full
    contiguous tap window; the Pallas kernels use the sparse
    :func:`conv_shift_set` form instead.)
    """
    k = w.shape[0]
    r = (k - 1) // 2
    f = factor
    offsets = [p + (j - r) * dilation for p in range(f) for j in range(k)]
    q_min = min(o // f for o in offsets)
    q_max = max(o // f for o in offsets)
    shifts = list(range(q_min, q_max + 1))
    return pack_weight_blocks(w, dilation, f, shifts), -q_min, q_max


def packed_conv(x: jnp.ndarray, wp: jnp.ndarray, pad_lo: int, pad_hi: int) -> jnp.ndarray:
    """Packed-domain conv: (B, M, F·C) × (k', F·C, F·C)."""
    return lax.conv_general_dilated(
        x, wp, (1,), [(pad_lo, pad_hi)], dimension_numbers=("NWC", "WIO", "NWC")
    )


def subpixel_conv_transpose(
    x: jnp.ndarray,  # (B, M, Cin)
    kernel: jnp.ndarray,  # (k, Cin, Cout) time-flipped flax layout
    stride: int,
) -> jnp.ndarray:
    """ConvTranspose1d(stride=s, padding=(k−s)//2) as a sub-pixel conv.

    The input-dilation formulation (lax lhs_dilation) convolves over an
    s×-zero-stuffed input — s× wasted MXU work.  Equivalently, each output
    phase p of y[s·m + p] is a small conv over x with ⌈k/s⌉ taps; computing
    all phases as one conv with s·Cout output channels followed by a
    depth-to-space reshape does the minimal FLOPs with full-width matmuls.

    Exactly matches emotts.nn.hifigan._conv_transpose1d (tested).
    """
    k, c_in, c_out = kernel.shape
    pad = (k - stride) // 2
    # un-flip back to torch tap order: W[κ] = kernel[k−1−κ]
    w = jnp.flip(kernel, axis=0)  # (k, Cin, Cout), torch κ order

    # y[s·m + p] = Σ_q x[m − q] · W[s·q + p + pad]
    q_bounds = []
    for p in range(stride):
        lo = -((p + pad) // stride)
        hi = (k - 1 - p - pad) // stride
        q_bounds.append((lo, hi))
    q_min = min(lo for lo, _ in q_bounds)
    q_max = max(hi for _, hi in q_bounds)
    nq = q_max - q_min + 1

    big = jnp.zeros((nq, c_in, stride * c_out), kernel.dtype)
    for p in range(stride):
        for q in range(q_bounds[p][0], q_bounds[p][1] + 1):
            kappa = stride * q + p + pad
            if 0 <= kappa < k:
                u = q_max - q  # kernel flipped in u so conv indexes x[m − q]
                big = big.at[u, :, p * c_out : (p + 1) * c_out].set(w[kappa])

    out = lax.conv_general_dilated(
        x, big, (1,), [(q_max, -q_min)], dimension_numbers=("NWC", "WIO", "NWC")
    )  # (B, M, s·Cout)
    b, m, _ = out.shape
    return out.reshape(b, m * stride, c_out)


def packed_resblock1(
    x: jnp.ndarray,  # (B, T, C), T divisible by factor
    w1: jnp.ndarray,  # (n_d, k, C, C)
    b1: jnp.ndarray,  # (n_d, C)
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    dilations: Tuple[int, ...],
    factor: int,
    lrelu_slope: float = 0.1,
) -> jnp.ndarray:
    """HiFi-GAN ResBlock1 computed in the packed time domain (exact)."""
    xp = pack_time(x, factor)
    for i, d in enumerate(dilations):
        wp1, lo1, hi1 = pack_conv_weights(w1[i], d, factor)
        wp2, lo2, hi2 = pack_conv_weights(w2[i], 1, factor)
        bt1 = jnp.tile(b1[i], factor)
        bt2 = jnp.tile(b2[i], factor)
        y = jnp.where(xp > 0, xp, xp * lrelu_slope)
        y = packed_conv(y, wp1.astype(y.dtype), lo1, hi1) + bt1
        y = jnp.where(y > 0, y, y * lrelu_slope)
        y = packed_conv(y, wp2.astype(y.dtype), lo2, hi2) + bt2
        xp = xp + y
    return unpack_time(xp, factor)

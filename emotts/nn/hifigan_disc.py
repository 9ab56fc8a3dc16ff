"""HiFi-GAN discriminators (multi-period + multi-scale) in Flax.

The reference consumes only a *pretrained* HiFi-GAN through SpeechBrain
(inference-only: fastspeech2/train.py:225, fastspeech2/inference.py:60-63),
so a user is dependent on downloading `tts-hifigan-libritts-16kHz`.  These
discriminators + emotts/train/vocoder_trainer.py make the framework
standalone: the V1 generator (emotts/nn/hifigan.py) can be trained or
fine-tuned on the project corpus.

Architecture follows HiFi-GAN (Kong et al., 2020):
* MPD: one sub-discriminator per period p ∈ {2,3,5,7,11}; the waveform is
  folded to (T/p, p) and processed by a stack of (5,1)-kernel 2-D convs with
  stride (3,1) — each sees the signal as p interleaved sub-sequences.
* MSD: three 1-D conv stacks (kernel 15/41/5, grouped convs) at ×1, ×2, ×4
  average-pooled scales.

TPU notes: all convs lower to MXU matmuls; a ``channels`` multiplier scales
the stacks down for tests.  LeakyReLU slope 0.1 as in the paper.  Outputs
are per-position logits plus per-layer feature maps for the feature-matching
loss.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

LRELU_SLOPE = 0.1


class _GroupedConv1D(nn.Module):
    """1-D conv with ``groups`` feature groups and a TPU fast path.

    Parameter layout (name/shape/init) is identical to
    ``nn.Conv(features, (kernel,), feature_group_count=groups)`` — kernel
    ``(k, cin//g, cout)`` + bias ``(cout,)`` — so checkpoints are
    interchangeable between the two formulations.

    ``dense_packed=True`` re-expresses the grouped conv as ONE dense conv
    with a block-diagonal kernel.  That does g× the MACs, but the dense
    kernel tiles the MXU solidly where XLA's grouped lowering does not:
    measured 12.97 → 8.52 ms fwd+bwd per full-size MSD scale at the
    training workload (benchmarks/disc_profile.py, bf16, B=16 × 8192
    samples).  The expansion depends only on the params, so XLA CSEs it
    across the multiple discriminator applications inside one GAN step.
    """

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dense_packed: bool = False
    group_merge: int = 0  # >1: merge m groups per conv group (m× MACs)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = int(x.shape[-1])
        k, g = self.kernel, self.groups
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, cin // g, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        # effective merge factor: group_merge > 1 is a PARTIAL block-
        # diagonal expansion (m original groups fuse into one conv group,
        # m× the MACs); dense_packed is the m = g special case
        m = math.gcd(max(1, self.group_merge), g)
        if self.dense_packed and self.group_merge <= 1:
            m = g
        if g > 1 and m > 1:
            # block-diagonal expansion as ONE broadcast-multiply against
            # eye(m): a scatter (.at[].set) lowers to a while-loop
            # dynamic-update-slice with ~6 ms/step of layout copies around
            # it (tools/profile_step.py --step vocoder); the mask-multiply
            # fuses, and its transpose is a masked reduce
            cin_g, cout_g = cin // g, self.features // g
            gm = g // m
            blocks = w.reshape(k, cin_g, gm, m, cout_g)
            eye = jnp.eye(m, dtype=w.dtype)
            dense = (blocks[:, None] *
                     eye[None, :, None, None, :, None])
            w = dense.reshape(k, m * cin_g, self.features)
            g = gm
        y = lax.conv_general_dilated(
            x, w, (self.stride,), [(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )
        return y + b.astype(self.dtype)


class PeriodDiscriminator(nn.Module):
    """One MPD sub-discriminator.

    ``fold_1d=True`` runs the identical conv stack with the period axis
    folded into batch — (B, T/p, p, 1) → (B·p, T/p, 1, 1) — so every
    (5,1)-kernel conv sees a width-1 image.  No conv in the stack mixes the
    period axis, so outputs and feature maps are bit-identical to the 2-D
    layout (they are reshaped back before returning); parameters are shared
    between the two layouts.  On TPU the folded layout wins for the larger
    periods, where T/p is short and the batch fold restores MXU-sized
    spatial tiles (benchmarks/disc_profile.py), and loses badly for p=2.
    """

    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)
    fold_1d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """y: (B, T) waveform → (per-position logits, feature maps)."""
        b, t = y.shape
        p = self.period
        pad = (-t) % p
        if pad:
            y = jnp.pad(y, ((0, 0), (0, pad)), mode="reflect")
        x = y.reshape(b, -1, p, 1).astype(self.dtype)  # NHWC
        if self.fold_1d:
            x = x.transpose(0, 2, 1, 3).reshape(b * p, -1, 1, 1)

        def unfold(z):
            if not self.fold_1d:
                return z
            return (z.reshape(b, p, z.shape[1], z.shape[-1])
                    .transpose(0, 2, 1, 3))

        feats = []
        for ch in self.channels:
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(unfold(x))
        x = nn.Conv(self.channels[-1], (5, 1), padding=((2, 2), (0, 0)),
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(unfold(x))
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype)(x)
        feats.append(unfold(x))
        return unfold(x).reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    channels: Sequence[int] = (128, 128, 256, 512, 1024, 1024, 1024)
    groups: Sequence[int] = (1, 4, 16, 16, 16, 16, 1)
    kernels: Sequence[int] = (15, 41, 41, 41, 41, 41, 5)
    strides: Sequence[int] = (1, 2, 2, 4, 4, 1, 1)
    dense_groups: bool = False
    group_merge: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        b = y.shape[0]
        x = y[..., None].astype(self.dtype)  # (B, T, 1)
        feats = []
        for i, (ch, g, k, s) in enumerate(zip(self.channels, self.groups,
                                              self.kernels, self.strides)):
            # group count must divide both channel counts (matters when the
            # stacks are scaled down for tests)
            g = math.gcd(g, math.gcd(int(x.shape[-1]), ch))
            x = _GroupedConv1D(ch, k, stride=s, groups=g,
                               dense_packed=self.dense_groups,
                               group_merge=self.group_merge,
                               dtype=self.dtype, name=f"Conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = _GroupedConv1D(1, 3, dtype=self.dtype,
                           name=f"Conv_{len(self.channels)}")(x)
        feats.append(x)
        return x.reshape(b, -1), feats


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channel_mult: float = 1.0
    # periods whose sub-discriminator runs in the batch-folded 1-D layout
    # (identical math/params; see PeriodDiscriminator.fold_1d)
    fold_periods: Sequence[int] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray):
        """Returns (list of logits, list of feature lists), one per period."""
        chans = tuple(max(4, int(c * self.channel_mult))
                      for c in (32, 128, 512, 1024))
        outs, feats = [], []
        for p in self.periods:
            o, f = PeriodDiscriminator(
                p, channels=chans, fold_1d=p in tuple(self.fold_periods),
                dtype=self.dtype, name=f"period_{p}"
            )(y)
            outs.append(o)
            feats.append(f)
        return outs, feats


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    channel_mult: float = 1.0
    dense_groups: bool = False
    # >1: partial block-diagonal merge — m original groups per conv group
    # (m× MACs, 128·m/2-lane groups); dense_groups is the m=16 special case
    group_merge: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray):
        chans = tuple(max(4, int(c * self.channel_mult))
                      for c in (128, 128, 256, 512, 1024, 1024, 1024))
        outs, feats = [], []
        x = y
        for i in range(self.n_scales):
            if i:
                x = nn.avg_pool(
                    x[..., None], window_shape=(4,), strides=(2,),
                    padding=((1, 1),),
                )[..., 0]
            o, f = ScaleDiscriminator(
                channels=chans, dense_groups=self.dense_groups,
                group_merge=self.group_merge,
                dtype=self.dtype, name=f"scale_{i}"
            )(x)
            outs.append(o)
            feats.append(f)
        return outs, feats

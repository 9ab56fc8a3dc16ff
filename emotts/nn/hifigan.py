"""HiFi-GAN V1 generator (16 kHz) in Flax — the synthesis vocoder.

Capability parity with the pretrained SpeechBrain HiFi-GAN the reference
drives inference-only (``tts-hifigan-libritts-16kHz``; decode calls at
fastspeech2/inference.py:83, fastspeech2/train.py:225, SURVEY.md §2.2-E6):
mel (B, 80, T) → waveform (B, 1, T·256).

Architecture: pre-conv (k=7) → 4× [leaky-relu → transposed conv upsample
(rates 8,8,2,2; kernels 16,16,4,4) → multi-receptive-field fusion of 3
ResBlocks (kernels 3/7/11, dilations 1/3/5, two convs per dilation)] →
leaky-relu → post-conv (k=7) → tanh.

Exact-parity notes:
* Transposed convs are implemented as input-dilated regular convolutions
  (lhs_dilation = stride, explicit padding k−1−p with p=(k−u)//2, kernel
  flipped in time) — bit-equivalent to torch's ConvTranspose1d and lowered
  by XLA onto the MXU as dense matmuls.
* All convs use torch-style explicit symmetric padding (dilation·(k−1)/2).
* Weight-norm is fused at conversion time (inference graph has plain convs).

``convert_torch_state_dict`` maps a torch HiFi-GAN generator checkpoint
(official or SpeechBrain layout, weight-normed or fused) into this module's
params.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

LRELU_SLOPE = 0.1


def _conv1d(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """(B, T, C) × (k, in, out) same-size conv with torch padding.
    Kernel is cast to the activation dtype (params stay fp32)."""
    k = kernel.shape[0]
    pad = (k - 1) // 2 * dilation
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _conv_transpose1d(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """torch ConvTranspose1d(stride=u, padding=(k−u)//2) equivalent.

    kernel: (k, in, out), already time-flipped relative to the torch weight
    (the converter handles the flip).  Output length = T·stride.
    """
    k = kernel.shape[0]
    p = (k - stride) // 2
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - p, k - 1 - p)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


class ResBlock1(nn.Module):
    """HiFi-GAN V1 residual block: per dilation d, x += c2(lrelu(c1(lrelu(x)))).

    ``use_pallas=True`` routes through the VMEM-fused Pallas kernel
    (emotts.ops.resblock.fused_resblock1) — same params, same math, one HBM
    round-trip per tile instead of one per op."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_pallas: bool = False
    pack_factor: int = 1  # >1: polyphase time-packing (emotts.ops.polyphase)
    # return the stacked (w1, b1, w2, b2) params instead of computing —
    # lets the generator feed whole-MRF fused kernels while this module
    # stays the single owner of the (checkpoint-compatible) param layout
    return_params: bool = False

    def _stacked_params(self):
        k, n_d = self.kernel_size, len(self.dilations)

        def p(name, shape):
            return self.param(name, nn.initializers.normal(0.01), shape)

        def pb(name, shape):
            return self.param(name, nn.initializers.zeros, shape)

        w1 = jnp.stack(
            [p(f"convs1_{i}_kernel", (k, self.channels, self.channels))
             for i in range(n_d)]
        )
        b1 = jnp.stack([pb(f"convs1_{i}_bias", (self.channels,)) for i in range(n_d)])
        w2 = jnp.stack(
            [p(f"convs2_{i}_kernel", (k, self.channels, self.channels))
             for i in range(n_d)]
        )
        b2 = jnp.stack([pb(f"convs2_{i}_bias", (self.channels,)) for i in range(n_d)])
        return w1, b1, w2, b2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        if self.return_params:
            return self._stacked_params()
        if self.pack_factor > 1 and x.shape[1] % self.pack_factor == 0:
            from emotts.ops.polyphase import packed_resblock1

            return packed_resblock1(
                x, *self._stacked_params(), self.dilations, self.pack_factor
            )
        if self.use_pallas:
            from emotts.ops.resblock import fused_resblock1

            return fused_resblock1(x, *self._stacked_params(), self.dilations)
        for i, d in enumerate(self.dilations):
            w1 = self.param(
                "convs1_%d_kernel" % i,
                nn.initializers.normal(0.01),
                (k, self.channels, self.channels),
            )
            b1 = self.param("convs1_%d_bias" % i, nn.initializers.zeros, (self.channels,))
            w2 = self.param(
                "convs2_%d_kernel" % i,
                nn.initializers.normal(0.01),
                (k, self.channels, self.channels),
            )
            b2 = self.param("convs2_%d_bias" % i, nn.initializers.zeros, (self.channels,))
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = _conv1d(y, w1, dilation=d) + b1
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = _conv1d(y, w2, dilation=1) + b2
            x = x + y
        return x


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_pallas_resblocks: bool = False  # per-resblock fused kernels (TPU only)
    time_packed_resblocks: bool = False  # polyphase packing for C<128 stages
    # whole-MRF-stage Pallas fusion (emotts.ops.mrf): one HBM round trip per
    # stage for C ≤ 128.  Measured within ~8% of the XLA conv path on v5e
    # (XLA's native conv pipeline avoids the kernel's explicit shift
    # relayouts — see BENCH_NOTES.md), so XLA stays the default.
    fused_mrf: bool = False
    # sub-pixel formulation of the transposed convs (exactly equivalent,
    # stride× fewer FLOPs than the input-dilated form); off switches back to
    # the literal ConvTranspose lowering
    subpixel_upsample: bool = True

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, T, 80) → waveform (B, T·∏rates)."""
        ch = self.upsample_initial_channel
        w_pre = self.param(
            "conv_pre_kernel", nn.initializers.normal(0.01), (7, self.in_channels, ch)
        )
        b_pre = self.param("conv_pre_bias", nn.initializers.zeros, (ch,))
        x = _conv1d(mel, w_pre) + b_pre

        for i, (u, ku) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            out_ch = ch // 2
            w_up = self.param(
                f"up_{i}_kernel", nn.initializers.normal(0.01), (ku, ch, out_ch)
            )
            b_up = self.param(f"up_{i}_bias", nn.initializers.zeros, (out_ch,))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            if self.subpixel_upsample:
                from emotts.ops.polyphase import subpixel_conv_transpose

                x = subpixel_conv_transpose(x, w_up.astype(x.dtype), u) + b_up
            else:
                x = _conv_transpose1d(x, w_up, u) + b_up

            same_dil = len(set(map(tuple, self.resblock_dilations))) == 1
            fused_ok = (
                self.fused_mrf and out_ch <= 128 and same_dil
                and 128 % out_ch == 0
                and x.shape[1] % (128 // out_ch) == 0
            )
            if fused_ok:
                stage_params = [
                    ResBlock1(
                        out_ch, k, tuple(dil), return_params=True,
                        name=f"resblock_{i}_{j}",
                    )(x)
                    for j, (k, dil) in enumerate(
                        zip(self.resblock_kernel_sizes, self.resblock_dilations)
                    )
                ]
                from emotts.ops.mrf import fused_mrf_stage

                x = fused_mrf_stage(
                    x, stage_params, self.resblock_kernel_sizes,
                    self.resblock_dilations[0],
                )
            else:
                acc = None
                for j, (k, dil) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilations)
                ):
                    pack = 1
                    if self.time_packed_resblocks and out_ch < 128:
                        pack = 128 // out_ch
                    y = ResBlock1(
                        out_ch, k, tuple(dil),
                        use_pallas=self.use_pallas_resblocks,
                        pack_factor=pack,
                        name=f"resblock_{i}_{j}",
                    )(x)
                    acc = y if acc is None else acc + y
                x = acc / len(self.resblock_kernel_sizes)
            ch = out_ch

        x = nn.leaky_relu(x, LRELU_SLOPE)
        w_post = self.param(
            "conv_post_kernel", nn.initializers.normal(0.01), (7, ch, 1)
        )
        b_post = self.param("conv_post_bias", nn.initializers.zeros, (1,))
        x = _conv1d(x, w_post) + b_post
        return jnp.tanh(x)[..., 0]  # (B, T·256)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _fuse_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Return the fused weight for `prefix` (handles weight / weight_g+weight_v
    / parametrizations.weight.original0/1 layouts)."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_v" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"])
        v = np.asarray(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight found for {prefix}")
    # torch weight_norm dim=0: norm over all dims except 0
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _to_flax_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (out, in, k) → flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def _to_flax_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d weight (in, out, k) → time-flipped (k, in, out)
    for the input-dilated-conv formulation."""
    return np.flip(np.transpose(w, (2, 0, 1)), axis=0).copy()


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    n_ups: int | None = None,
    n_kernels: int | None = None,
    n_dilations: int | None = None,
    prefix: str = "",
) -> Dict:
    """Map a torch HiFi-GAN generator state_dict to HiFiGANGenerator params.

    Accepts the official hifi-gan / SpeechBrain layout: conv_pre, ups.N,
    resblocks.M (M = i*n_kernels + j) with convs1.D/convs2.D, conv_post.
    Structure counts default to whatever the state_dict actually contains.
    """
    import re as _re

    def _count(pattern):
        idx = {
            int(m.group(1))
            for k in sd
            for m in [_re.match(pattern, k[len(prefix):])]
            if m
        }
        return max(idx) + 1 if idx else 0

    if n_ups is None:
        n_ups = _count(r"ups\.(\d+)\.")
    n_resblocks = _count(r"resblocks\.(\d+)\.")
    if n_kernels is None:
        n_kernels = n_resblocks // max(n_ups, 1)
    if n_dilations is None:
        n_dilations = _count(r"resblocks\.0\.convs1\.(\d+)\.")

    def get(name):
        return _fuse_weight_norm(sd, prefix + name)

    def bias(name):
        return np.asarray(sd[prefix + name + ".bias"])

    params: Dict = {
        "conv_pre_kernel": _to_flax_conv(get("conv_pre")),
        "conv_pre_bias": bias("conv_pre"),
        "conv_post_kernel": _to_flax_conv(get("conv_post")),
        "conv_post_bias": bias("conv_post"),
    }
    for i in range(n_ups):
        params[f"up_{i}_kernel"] = _to_flax_conv_transpose(get(f"ups.{i}"))
        params[f"up_{i}_bias"] = bias(f"ups.{i}")
        for j in range(n_kernels):
            m = i * n_kernels + j
            block: Dict = {}
            for d in range(n_dilations):
                block[f"convs1_{d}_kernel"] = _to_flax_conv(get(f"resblocks.{m}.convs1.{d}"))
                block[f"convs1_{d}_bias"] = bias(f"resblocks.{m}.convs1.{d}")
                block[f"convs2_{d}_kernel"] = _to_flax_conv(get(f"resblocks.{m}.convs2.{d}"))
                block[f"convs2_{d}_bias"] = bias(f"resblocks.{m}.convs2.{d}")
            params[f"resblock_{i}_{j}"] = block
    return {"params": params}


def generator_structure_from_params(
    variables: Dict, expected_upsample: Optional[int] = None
) -> Dict:
    """Infer HiFiGANGenerator constructor kwargs from a (converted) params
    dict, so any V1/V2/V3-family checkpoint loads without hand-set config
    (the reference hard-codes the V1 16 kHz model, fastspeech2/train.py:225).

    Upsample rates follow the HiFi-GAN convention rate = kernel // 2; conv
    dilations are not recoverable from weight shapes and default to the
    paper's (1, 3, 5, 7)[:n] per resblock conv.

    ``expected_upsample`` (normally the mel hop length) validates the
    inference: a checkpoint whose transposed-conv kernels deviate from the
    kernel=2·rate convention would otherwise load silently into a
    wrong-architecture generator.  Pass an explicit ``vocoder_structure``
    to Synthesizer for such checkpoints.
    """
    p = variables.get("params", variables)
    in_ch = int(p["conv_pre_kernel"].shape[1])
    init_ch = int(p["conv_pre_kernel"].shape[2])
    n_ups = len([k for k in p if k.startswith("up_") and k.endswith("_kernel")])
    up_kernels = tuple(int(p[f"up_{i}_kernel"].shape[0]) for i in range(n_ups))
    up_rates = tuple(k // 2 for k in up_kernels)
    if expected_upsample is not None:
        total = 1
        for r in up_rates:
            total *= r
        if total != expected_upsample:
            raise ValueError(
                f"inferred upsample rates {up_rates} (total {total}) do not "
                f"reproduce the expected hop length {expected_upsample}; the "
                "checkpoint deviates from the kernel=2*rate HiFi-GAN "
                "convention — pass an explicit vocoder_structure"
            )
    n_kernels = len(
        {k.split("_")[2] for k in p if k.startswith("resblock_0_")}
    )
    kernel_sizes = []
    dilations = []
    for j in range(n_kernels):
        block = p[f"resblock_0_{j}"]
        kernel_sizes.append(int(block["convs1_0_kernel"].shape[0]))
        n_d = len([k for k in block if k.startswith("convs1_") and k.endswith("_kernel")])
        dilations.append(tuple((1, 3, 5, 7)[:n_d]))
    return dict(
        in_channels=in_ch,
        upsample_initial_channel=init_ch,
        upsample_rates=up_rates,
        upsample_kernel_sizes=up_kernels,
        resblock_kernel_sizes=tuple(kernel_sizes),
        resblock_dilations=tuple(dilations),
    )

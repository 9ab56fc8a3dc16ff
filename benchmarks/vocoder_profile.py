"""Per-stage vocoder timing on the real TPU (device_get-synced).

Decomposes the HiFi-GAN V1 generator (the synthesis-RTF-critical path,
reference: SpeechBrain HIFIGAN.decode_batch, fastspeech2/inference.py:83)
into its pipeline stages and times each in isolation at the bench workload
(B=60, 256 mel frames → 3.93 M samples), so kernel work targets the real
bottleneck.  Run with the default axon env: `python benchmarks/vocoder_profile.py`.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=2):
    """Per-iteration device time: chain ``iters`` async dispatches and sync
    ONCE at the end, then subtract the measured sync round trip.

    The axon tunnel costs ~25 ms per host sync (measured: fori_loop matmul
    chains extrapolate to a ~25 ms intercept and a ~193 TF/s slope), so a
    per-iteration device_get over-reports small ops by that constant.  A
    single trailing sync amortizes it to ~1 ms at iters=20.
    """
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    wall = (time.perf_counter() - t0) * 1000.0
    return max(wall - _sync_ms(), 0.0) / iters


@functools.lru_cache(maxsize=1)
def _sync_ms() -> float:
    """Measured cost of one dispatch+device_get round trip on this platform."""
    f = jax.jit(lambda x: x + 1.0)
    y = f(jnp.zeros((8, 128)))
    jax.device_get(y.ravel()[:1])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(y)
        jax.device_get(y.ravel()[:1])
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from emotts.ops.polyphase import (
        pack_conv_weights,
        pack_time,
        packed_conv,
        subpixel_conv_transpose,
        unpack_time,
    )

    B, T_MEL = 60, 256
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    rates = (8, 8, 2, 2)
    kus = (16, 16, 4, 4)
    ch0 = 512

    print(f"workload: B={B}, T_mel={T_MEL}, dtype={dtype.__name__}")
    total = 0.0

    # pre conv 80->512
    x = jnp.asarray(rng.standard_normal((B, T_MEL, 80)), dtype)
    w = jnp.asarray(rng.standard_normal((7, 80, ch0)) * 0.01, dtype)
    from jax import lax

    def conv(x, w):
        k = w.shape[0]
        pad = (k - 1) // 2
        return lax.conv_general_dilated(
            x, w, (1,), [(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC")
        )

    ms = timed(conv, x, w)
    total += ms
    print(f"pre-conv   (T={T_MEL:6d}, C=80->512):  {ms:7.2f} ms")

    t, ch = T_MEL, ch0
    for i, (u, ku) in enumerate(zip(rates, kus)):
        out_ch = ch // 2
        x = jnp.asarray(rng.standard_normal((B, t, ch)), dtype)
        w_up = jnp.asarray(rng.standard_normal((ku, ch, out_ch)) * 0.01, dtype)
        ms = timed(lambda x, w: subpixel_conv_transpose(x, w, u), x, w_up)
        total += ms
        print(f"upsample {i} (T={t:6d}->{t*u:6d}, C={ch}->{out_ch}): {ms:7.2f} ms")
        t *= u
        ch = out_ch

        # MRF stage as production runs it: packed for C<128
        factor = max(1, 128 // ch)
        y = jnp.asarray(rng.standard_normal((B, t, ch)), dtype)
        weights = []
        for k in (3, 7, 11):
            w1 = rng.standard_normal((3, k, ch, ch)) * 0.05
            w2 = rng.standard_normal((3, k, ch, ch)) * 0.05
            b1 = rng.standard_normal((3, ch)) * 0.01
            b2 = rng.standard_normal((3, ch)) * 0.01
            weights.append((w1, b1, w2, b2, k))

        def mrf(y, weights=weights, factor=factor, ch=ch):
            acc = None
            for w1, b1, w2, b2, k in weights:
                if factor > 1:
                    from emotts.ops.polyphase import packed_resblock1

                    z = packed_resblock1(
                        y,
                        jnp.asarray(w1, dtype), jnp.asarray(b1, dtype),
                        jnp.asarray(w2, dtype), jnp.asarray(b2, dtype),
                        (1, 3, 5), factor,
                    )
                else:
                    from emotts.ops.resblock import resblock1_reference

                    z = resblock1_reference(
                        y,
                        jnp.asarray(w1, dtype), jnp.asarray(b1, dtype),
                        jnp.asarray(w2, dtype), jnp.asarray(b2, dtype),
                        (1, 3, 5),
                    )
                acc = z if acc is None else acc + z
            return acc / 3.0

        ms = timed(mrf, y)
        total += ms
        # real (unpacked) MACs: 2 convs * 3 dil * (3+7+11 taps) * C^2
        macs = 126 * B * t * ch * ch
        eff = 2 * macs / (ms / 1000.0) / 1e12
        print(
            f"MRF {i}      (T={t:6d}, C={ch:3d}, pack={factor}): {ms:7.2f} ms"
            f"  ({eff:5.1f} TF/s on minimal flops)"
        )

    # post conv
    x = jnp.asarray(rng.standard_normal((B, t, ch)), dtype)
    w = jnp.asarray(rng.standard_normal((7, ch, 1)) * 0.01, dtype)
    ms = timed(lambda x, w: jnp.tanh(conv(x, w)), x, w)
    total += ms
    print(f"post-conv  (T={t:6d}, C={ch}->1):   {ms:7.2f} ms")
    print(f"sum of stages: {total:7.2f} ms")


if __name__ == "__main__":
    main()

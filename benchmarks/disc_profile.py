"""Discriminator-side vocoder-training probes on the real TPU.

The generator got a seven-variant MRF study (BENCH_NOTES); this applies the
same playbook to the HiFi-GAN discriminators (emotts/nn/hifigan_disc.py),
which dominate the GAN step (disc_all runs 4× per step: 2 in the D loss, 2
in the G loss).  Probes, at the training workload (B=16, 32-frame segments
= 8192 samples, bf16):

1. per-component baseline: each MPD period / MSD scale, fwd and fwd+bwd
2. MPD width-folding: the (5,1)-kernel stacks never mix the period axis, so
   the whole stack can run with the period folded into batch —
   (B, T/p, p, C) → (B·p, T/p, C) once at the entry, 1-D convs throughout
3. MSD grouped-conv packing: feature_group_count=16 convs re-expressed with
   batch_group_count (group-major batch fold) and as dense block-diagonal
   convs (16× the MACs, but solid MXU tiles)
4. f32 vs bf16 discriminators

Each variant is verified against the baseline formulation numerically
before timing.  Run with the default axon env:
    python benchmarks/disc_profile.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from benchmarks.vocoder_profile import timed

B, SEG = 16, 8192  # training workload: batch, segment samples

# full-size stacks (emotts/nn/hifigan_disc.py defaults)
MSD_CH = (128, 128, 256, 512, 1024, 1024, 1024)
MSD_G = (1, 4, 16, 16, 16, 16, 1)
MSD_K = (15, 41, 41, 41, 41, 41, 5)
MSD_S = (1, 2, 2, 4, 4, 1, 1)
MPD_CH = (32, 128, 512, 1024)
PERIODS = (2, 3, 5, 7, 11)


def leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


# ---------------------------------------------------------------------------
# MSD formulations (one scale)
# ---------------------------------------------------------------------------


def msd_weights(rng, dtype):
    ws = []
    cin = 1
    for ch, g, k in zip(MSD_CH, MSD_G, MSD_K):
        g = int(np.gcd(g, np.gcd(cin, ch)))
        ws.append(jnp.asarray(
            rng.standard_normal((k, cin // g, ch)) * (0.4 / np.sqrt(k * cin)),
            dtype,
        ))
        cin = ch
    ws.append(jnp.asarray(rng.standard_normal((3, cin, 1)) * 0.02, dtype))
    return ws


def msd_scale_grouped(x, ws):
    """Baseline: feature_group_count grouped convs (the Flax module's math)."""
    for w, g0, k, s in zip(ws[:-1], MSD_G, MSD_K, MSD_S):
        cin, ch = x.shape[-1], w.shape[-1]
        g = int(np.gcd(g0, np.gcd(cin, ch)))
        x = lax.conv_general_dilated(
            x, w, (s,), [(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )
        x = leaky(x)
    return lax.conv_general_dilated(
        x, ws[-1], (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )


def msd_scale_batchgroup(x, ws):
    """Grouped convs as batch_group_count convs: group-major batch fold per
    grouped layer, dense layers untouched."""
    for w, g0, k, s in zip(ws[:-1], MSD_G, MSD_K, MSD_S):
        cin, ch = x.shape[-1], w.shape[-1]
        g = int(np.gcd(g0, np.gcd(cin, ch)))
        if g == 1:
            x = lax.conv_general_dilated(
                x, w, (s,), [(k // 2, k // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        else:
            b, t, _ = x.shape
            xg = (
                x.reshape(b, t, g, cin // g)
                .transpose(2, 0, 1, 3)
                .reshape(g * b, t, cin // g)
            )
            x = lax.conv_general_dilated(
                xg, w, (s,), [(k // 2, k // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"), batch_group_count=g,
            )
        x = leaky(x)
    return lax.conv_general_dilated(
        x, ws[-1], (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )


def msd_dense_weights(ws):
    """Zero-padded block-diagonal dense equivalents of the grouped kernels."""
    dense = []
    cin = 1
    for w, g0, ch in zip(ws[:-1], MSD_G, MSD_CH):
        g = int(np.gcd(g0, np.gcd(cin, ch)))
        if g == 1:
            dense.append(w)
        else:
            k = w.shape[0]
            wd = np.zeros((k, cin, ch), np.float32)
            ci, co = cin // g, ch // g
            for j in range(g):
                wd[:, j * ci:(j + 1) * ci, j * co:(j + 1) * co] = np.asarray(
                    w[:, :, j * co:(j + 1) * co], np.float32
                )
            dense.append(jnp.asarray(wd, w.dtype))
        cin = ch
    dense.append(ws[-1])
    return dense


def msd_scale_dense(x, ws_dense):
    for w, k, s in zip(ws_dense[:-1], MSD_K, MSD_S):
        x = lax.conv_general_dilated(
            x, w, (s,), [(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = leaky(x)
    return lax.conv_general_dilated(
        x, ws_dense[-1], (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )


def msd_merge_weights(ws, m):
    """PARTIAL block-diagonal merge: m original groups fuse into one conv
    group, so feature_group_count drops g → g/m and MACs inflate only m×
    (full dense is the m=g special case with 16× inflation).  The point:
    the k=41 layers' true group width is cout/g = 64 < the 128 MXU lanes —
    merging m=2 restores 128-wide conv groups at 2× MACs, 8× fewer than
    the shipped dense expansion."""
    merged = []
    cin = 1
    for w, g0, ch in zip(ws[:-1], MSD_G, MSD_CH):
        g = int(np.gcd(g0, np.gcd(cin, ch)))
        mm = int(np.gcd(m, g))
        if g == 1 or mm == 1:
            merged.append(w)
        else:
            k = w.shape[0]
            ci, co = cin // g, ch // g
            gm = g // mm
            blocks = np.asarray(w, np.float32).reshape(k, ci, gm, mm, co)
            eye = np.eye(mm, dtype=np.float32)
            dense = (blocks[:, None] *
                     eye[None, :, None, None, :, None])
            merged.append(jnp.asarray(
                dense.reshape(k, mm * ci, gm * mm * co), w.dtype
            ))
        cin = ch
    merged.append(ws[-1])
    return merged


def msd_scale_merged(x, ws_m, m):
    for w, g0, ch, k, s in zip(ws_m[:-1], MSD_G, MSD_CH, MSD_K, MSD_S):
        cin = x.shape[-1]
        gm = cin // w.shape[1]  # the merged weight encodes its group count
        x = lax.conv_general_dilated(
            x, w, (s,), [(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=gm,
        )
        x = leaky(x)
    return lax.conv_general_dilated(
        x, ws_m[-1], (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )


# ---------------------------------------------------------------------------
# MPD formulations (one period)
# ---------------------------------------------------------------------------


def mpd_weights(rng, dtype):
    ws = []
    cin = 1
    for ch in MPD_CH:
        ws.append(jnp.asarray(
            rng.standard_normal((5, 1, cin, ch)) * (0.4 / np.sqrt(5 * cin)),
            dtype,
        ))
        cin = ch
    ws.append(jnp.asarray(
        rng.standard_normal((5, 1, cin, cin)) * (0.4 / np.sqrt(5 * cin)), dtype
    ))
    ws.append(jnp.asarray(rng.standard_normal((3, 1, cin, 1)) * 0.02, dtype))
    return ws


def _fold(y, p):
    b, t = y.shape
    pad = (-t) % p
    if pad:
        y = jnp.pad(y, ((0, 0), (0, pad)), mode="reflect")
    return y.reshape(b, -1, p, 1)  # (B, H, W=p, C)


def mpd_2d(y, ws, p):
    """Baseline: NHWC (5,1)-kernel 2-D convs (the Flax module's math)."""
    x = _fold(y, p)
    for w in ws[:-2]:
        x = lax.conv_general_dilated(
            x, w, (3, 1), [(2, 2), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = leaky(x)
    x = lax.conv_general_dilated(
        x, ws[-2], (1, 1), [(2, 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = leaky(x)
    x = lax.conv_general_dilated(
        x, ws[-1], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return x


def mpd_folded(y, ws, p):
    """Period folded into batch ONCE: no conv in the stack mixes the period
    axis, so (B, H, p, 1) → (B·p, H, 1) and 1-D convs throughout."""
    x4 = _fold(y, p)  # (B, H, p, 1)
    b, h = x4.shape[0], x4.shape[1]
    x = x4.transpose(0, 2, 1, 3).reshape(b * p, h, 1)
    for w in ws[:-2]:
        x = lax.conv_general_dilated(
            x, w[:, 0], (3,), [(2, 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = leaky(x)
    x = lax.conv_general_dilated(
        x, ws[-2][:, 0], (1,), [(2, 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    x = leaky(x)
    x = lax.conv_general_dilated(
        x, ws[-1][:, 0], (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    # back to (B, H', p, 1) to match the 2-D formulation's layout
    return x.reshape(b, p, -1, 1).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------


def fwd_bwd(fn):
    """Sum-of-squares scalarization: grads wrt weights, like training."""

    def run(x, ws, *a):
        def loss(ws):
            out = fn(x, ws, *a)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        return jax.grad(loss)(ws)

    return run


def check_close(name, a, b, tol):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    status = "OK" if err < tol else "MISMATCH"
    print(f"  parity {name}: rel max err {err:.2e} [{status}]")
    return err < tol


def main():
    rng = np.random.default_rng(0)
    y32 = jnp.asarray(rng.standard_normal((B, SEG)), jnp.float32)

    for dtype in (jnp.bfloat16, jnp.float32):
        tol = 5e-2 if dtype == jnp.bfloat16 else 2e-5
        tag = dtype.__name__
        y = y32.astype(dtype)
        print(f"\n=== dtype {tag}: MSD (one ×1 scale, T={SEG}) ===")
        ws = msd_weights(rng, dtype)
        wsd = msd_dense_weights(ws)
        ref = msd_scale_grouped(y[..., None], ws)
        check_close("batch_group", msd_scale_batchgroup(y[..., None], ws), ref, tol)
        check_close("dense", msd_scale_dense(y[..., None], wsd), ref, tol)
        variants = [
            ("grouped (baseline)", msd_scale_grouped, (ws,)),
            ("batch_group", msd_scale_batchgroup, (ws,)),
            ("dense-packed", msd_scale_dense, (wsd,)),
        ]
        # partial merges: m groups -> one 128·m/2-lane conv group at m× MACs
        for m in (2, 4, 8):
            wm = msd_merge_weights(ws, m)
            check_close(f"merge{m}", msd_scale_merged(y[..., None], wm, m),
                        ref, tol)
            variants.append((f"merge-{m} (fgc {16 // m})",
                             msd_scale_merged, (wm, m)))
        for name, fn, wargs in variants:
            f = timed(fn, y[..., None], *wargs)
            g = timed(fwd_bwd(lambda x, w, *a: fn(x, w, *a)),
                      y[..., None], *wargs)
            print(f"  {name:20s} fwd {f:7.2f} ms   fwd+bwd {g:7.2f} ms")

        print(f"=== dtype {tag}: MPD (T={SEG}) ===")
        wsp = mpd_weights(rng, dtype)
        tot2d = totf = 0.0
        for p in PERIODS:
            ref = mpd_2d(y, wsp, p)
            check_close(f"p={p} folded", mpd_folded(y, wsp, p), ref, tol)
        for p in PERIODS:
            # close over the period: it drives Python-level shape logic
            # (reflect pad, reshape) and must be static under jit
            a = timed(fwd_bwd(lambda x, w, _p=p: mpd_2d(x, w, _p)), y, wsp)
            b_ = timed(fwd_bwd(lambda x, w, _p=p: mpd_folded(x, w, _p)), y, wsp)
            tot2d += a
            totf += b_
            print(f"  p={p:2d} fwd+bwd: 2d {a:7.2f} ms   folded {b_:7.2f} ms")
        print(f"  MPD total fwd+bwd: 2d {tot2d:.2f} ms   folded {totf:.2f} ms")


if __name__ == "__main__":
    main()

"""Duration-driven length regulation and segment ops — TPU-shaped.

The reference's ragged per-sample ops become batched gathers/cumsums over a
fixed frame grid (no Python loops, no dynamic shapes — SURVEY.md §7):

* ``length_regulate``: replaces SpeechBrain's ``upsample`` repeat-loop
  (consumed at fastspeech2/model.py:405-410) with a searchsorted-style
  gather over cumulative durations into a static ``max_len`` grid.
* ``average_over_durations``: replaces the duration-windowed averaging of
  frame-level pitch/energy to phone level (fastspeech2/model.py:383,397)
  with cumulative-sum differencing.
* ``segment_mean``: the phone-level scatter-mean of frame-level intensity
  features, replacing the per-sample repeat_interleave + index_add_ loop
  (fastspeech2/train.py:34-49).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def phone_index_map(durations: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, P) int durations → (B, T) index of the phone covering each frame.

    Frames beyond Σdurations map to the last phone index (callers mask them).
    Implemented as a comparison-count (searchsorted-equivalent) which lowers
    to a dense (T, P) compare + sum — MXU/VPU friendly, no sorting.
    """
    ends = jnp.cumsum(durations, axis=1)  # (B, P)
    frames = jnp.arange(max_len, dtype=ends.dtype)  # (T,)
    # phon_idx[b, t] = #{p : ends[b, p] <= t}
    idx = (ends[:, None, :] <= frames[None, :, None]).sum(axis=-1)  # (B, T)
    return jnp.minimum(idx, durations.shape[1] - 1)


def length_regulate(
    x: jnp.ndarray,  # (B, P, D) phone-level features
    durations: jnp.ndarray,  # (B, P) int frames per phone
    max_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phone features to the frame grid; returns (frames, mel_lens).

    frames: (B, max_len, D), zeroed past each sample's Σdurations.
    mel_lens: (B,) = Σdurations (clipped to max_len).
    """
    idx = phone_index_map(durations, max_len)  # (B, T)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)  # (B, T, D)
    mel_lens = jnp.minimum(durations.sum(axis=1), max_len)
    mask = jnp.arange(max_len)[None, :] < mel_lens[:, None]
    return out * mask[..., None].astype(x.dtype), mel_lens


def average_over_durations(
    values: jnp.ndarray,  # (B, T) frame-level track (pad frames must be 0)
    durations: jnp.ndarray,  # (B, P) int
) -> jnp.ndarray:
    """Per-phone mean of a frame track → (B, P); zero-duration phones → 0."""
    b, t = values.shape
    d = jnp.maximum(durations, 0)
    ends = jnp.clip(jnp.cumsum(d, axis=1), 0, t)  # (B, P)
    starts = jnp.clip(ends - d, 0, t)
    csum = jnp.concatenate(
        [jnp.zeros((b, 1), values.dtype), jnp.cumsum(values, axis=1)], axis=1
    )  # (B, T+1)
    sums = jnp.take_along_axis(csum, ends, axis=1) - jnp.take_along_axis(
        csum, starts, axis=1
    )
    counts = (ends - starts).astype(values.dtype)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)


def segment_mean(
    frames: jnp.ndarray,  # (B, T, D) frame-level features (pad frames 0)
    durations: jnp.ndarray,  # (B, P) int
) -> jnp.ndarray:
    """Duration-windowed mean of frame features → (B, P, D)."""
    b, t, d_feat = frames.shape
    d = jnp.maximum(durations, 0)
    ends = jnp.clip(jnp.cumsum(d, axis=1), 0, t)
    starts = jnp.clip(ends - d, 0, t)
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, d_feat), frames.dtype), jnp.cumsum(frames, axis=1)], axis=1
    )  # (B, T+1, D)
    sums = jnp.take_along_axis(
        csum, ends[..., None], axis=1
    ) - jnp.take_along_axis(csum, starts[..., None], axis=1)  # (B, P, D)
    counts = (ends - starts).astype(frames.dtype)[..., None]
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)

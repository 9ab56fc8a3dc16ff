"""Streaming vocoder: emit waveform chunks while later mel frames are still
being vocoded — bounded memory and low time-to-first-audio for serving.

The reference has no streaming story (its driver writes whole files,
fastspeech2/inference.py:83-84).  HiFi-GAN is fully convolutional with a
finite receptive field, so a mel chunk vocoded with ``halo`` frames of real
context on each side reproduces the full-sequence output *exactly* on its
interior: SAME-padding corruption at a window edge decays within the
receptive field (≈14 mel frames for the V1 generator: conv_pre ±3, MRF0's
dilated stacks ±60 samples at the 8× stage ≈ ±7.5 frames, later stages
sub-frame), and sequence boundaries are handled by clamping windows to the
sequence — there the window edge *is* the true edge, so the generator's own
zero padding matches the unchunked computation bit for bit.

TPU shape discipline: interior windows all share one (chunk + 2·halo) shape
⇒ one XLA compilation; only the first/last windows add boundary shapes
(≤3 compiles total for any stream length).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import numpy as np

DEFAULT_HALO = 16  # mel frames; > the V1 generator's ~14-frame receptive field


def generator_halo_frames(gen) -> int:
    """Halo (half receptive field, in mel frames, rounded up + safety margin)
    computed from a :class:`~emotts.nn.hifigan.HiFiGANGenerator`'s actual
    structure — generators loaded from arbitrary checkpoints (larger kernels
    or extra dilation steps) get a sufficient halo automatically instead of
    inheriting the V1-tuned DEFAULT_HALO."""
    half = 3.0  # conv_pre k=7
    rate = 1
    for u, ku in zip(gen.upsample_rates, gen.upsample_kernel_sizes):
        rate *= u
        half += ku / rate  # transposed conv reach at this stage's rate
        stage = 0.0
        for k, ds in zip(gen.resblock_kernel_sizes, gen.resblock_dilations):
            reach = sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds)
            stage = max(stage, float(reach))
        half += stage / rate
    half += 3.0 / rate  # post conv k=7
    return int(np.ceil(half)) + 2


def vocode_streaming(
    voc_fn: Callable,
    params,
    mel,  # (B, T, n_mels) array (device or host)
    hop: int,
    chunk_frames: int = 64,
    halo_frames: int = DEFAULT_HALO,
    start_frame: int = 0,
) -> Iterator[np.ndarray]:
    """Yield int16 PCM chunks (B, chunk·hop) left-to-right; concatenated they
    equal ``voc_fn(params, mel)`` exactly (same SAME-padding math).

    ``voc_fn`` is the jitted mel→PCM function (Synthesizer._voc_fn).
    ``start_frame`` (a multiple of ``chunk_frames``) skips chunks already
    produced elsewhere — e.g. by the fused FS2+first-window program.
    """
    if chunk_frames <= 0:
        raise ValueError("chunk_frames must be positive")
    t_total = mel.shape[1]
    for t0 in range(start_frame, t_total, chunk_frames):
        t1 = min(t0 + chunk_frames, t_total)
        lo = max(0, t0 - halo_frames)
        hi = min(t_total, t1 + halo_frames)
        pcm = voc_fn(params, mel[:, lo:hi])
        yield np.asarray(jax.device_get(pcm[:, (t0 - lo) * hop : (t1 - lo) * hop]))


def stream_text(
    synth,
    text: str,
    speaker_id: int,
    emotion_id: int,
    level: float = 0,
    pace: float = 1.0,
    pitch_rate: float = 1.0,
    energy_rate: float = 1.0,
    gap_s: float = 0.15,
    intensity_scale: float = 1.0,
    chunk_frames: int = 64,
    halo_frames: Optional[int] = None,  # default: computed from the
    # synthesizer's actual generator structure (generator_halo_frames)
) -> Iterator[np.ndarray]:
    """Long-form streaming synthesis: sentence-split ``text``, synthesize each
    sentence's mel, and yield float32 waveform chunks in playback order with
    ``gap_s`` of silence between sentences.  First audio is available after
    one sentence + one chunk instead of the whole text.

    Each sentence's audio equals unchunked vocoding of its content-trimmed
    mel exactly (the chunking is lossless; see :func:`vocode_streaming`).
    That is the reference-faithful per-utterance path
    (fastspeech2/inference.py:82-83 vocodes unpadded mels);
    :meth:`Synthesizer.synthesize_text` instead vocodes capacity-padded
    batches, whose masked zero-mel padding bleeds into the last ~receptive
    field of each sentence tail — so the two agree except within ~14 frames
    of each sentence end.
    """
    from emotts.text.segment import split_sentences

    if synth._voc_fn is None:
        raise RuntimeError("stream_text requires vocoder params")
    if halo_frames is None:
        halo_frames = generator_halo_frames(synth.vocoder)
    cfg = synth.cfg
    hop = cfg.audio.hop_length
    sentences = split_sentences(text)
    seqs = [synth.text_to_phoneme_ids(s) for s in sentences]
    seqs = [s for s in seqs if len(s) > 0]
    if not seqs:
        raise ValueError("no synthesizable sentences in text")

    gap = np.zeros(int(gap_s * cfg.audio.sampling_rate), np.float32)
    # fused first window: the first chunk + its right halo vocode INSIDE the
    # FS2 forward program, so first audio costs one dispatch round trip
    # instead of three (mel dispatch → length fetch → vocoder dispatch)
    window = chunk_frames + halo_frames
    fused_ok = (
        getattr(synth, "_first_fn", None) is not None
        and window <= cfg.fastspeech2.max_mel_len
    )
    for i, ids in enumerate(seqs):
        if i and gap.size:
            yield gap
        inten = synth.intensity_for(
            speaker_id, emotion_id, level, len(ids), scale=intensity_scale,
        )[None]
        spk = np.array([speaker_id], np.int32)
        start = 0
        if fused_ok:
            pcm_w, mel, lens = synth.synthesize_first_chunk(
                ids, spk, inten, window=window,
                pace=pace, pitch_rate=pitch_rate, energy_rate=energy_rate,
            )
            pcm_w, n = jax.device_get((pcm_w, lens))
            n = int(np.asarray(n)[0])
            if n >= window:
                # true left edge + full right halo inside the window: the
                # fused PCM's first chunk is exact; stream it immediately
                yield np.asarray(
                    pcm_w[0, : chunk_frames * hop]
                ).astype(np.float32) / 32767.0
                start = chunk_frames
            # else: content shorter than the window — the fused PCM's tail
            # saw capacity padding instead of the true right edge; fall
            # through and vocode the content-trimmed mel (exact)
        else:
            mel, lens = synth.synthesize_mels(
                ids, spk, inten,
                pace=pace, pitch_rate=pitch_rate, energy_rate=energy_rate,
            )
            n = int(np.asarray(jax.device_get(lens))[0])
        mel = mel[:, :n]
        for pcm in vocode_streaming(
            synth._voc_fn, synth.vocoder_params, mel, hop,
            chunk_frames=chunk_frames, halo_frames=halo_frames,
            start_frame=start,
        ):
            yield pcm[0].astype(np.float32) / 32767.0

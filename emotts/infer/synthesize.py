"""End-to-end synthesis: text → G2P → FastSpeech2 → HiFi-GAN → wav.

Covers the reference synthesis driver (fastspeech2/inference.py:40-84):
for every (speaker × emotion × intensity level), condition FastSpeech2 on
the bucketized intensity prototype (neutral → zeros, with the correct
n_emotions width — fixing SURVEY.md §3.6-B2) and vocode the predicted mel.

TPU design: the reference loops 60 single-utterance forwards; here the whole
(speaker × emotion × level) sweep runs as **one batched jit** through both
models — the RTF-critical path stays on device end to end, with a single
host transfer of the waveform batch.
"""

from __future__ import annotations

import itertools
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emotts.audio.wavio import write_wav
from emotts.data.datasets import pick_bucket
from emotts.nn.hifigan import HiFiGANGenerator
from emotts.text.g2p import G2P
from emotts.text.segment import split_sentences
from emotts.train.fs2_trainer import build_fastspeech2
from emotts.utils.config import Config


def resolve_name(value, table, what: str) -> int:
    """Speaker/emotion name-or-id → index; raises ``ValueError``.

    The ONE resolution rule shared by the CLI, the HTTP server, and the
    SSML renderer (each used to have its own, with divergent behavior)."""
    if isinstance(value, bool) or value is None:
        raise ValueError(f"missing/invalid {what}: {value!r}")
    if isinstance(value, (int, np.integer)):
        idx = int(value)
    elif value in table:
        return list(table).index(value)
    else:
        try:
            idx = int(value)
        except (TypeError, ValueError):
            raise ValueError(
                f"unknown {what} {value!r}; known: {list(table)}"
            ) from None
    if not 0 <= idx < len(table):
        raise ValueError(f"{what} id {idx} out of range (n={len(table)})")
    return idx


class Synthesizer:
    def __init__(
        self,
        cfg: Config,
        fs2_variables: dict,  # {'params': ..., 'batch_stats': ...}
        vocoder_params: Optional[dict] = None,
        intensity_bank: Optional[np.ndarray] = None,  # (n_spk, n_emo, levels, n_emo)
        g2p: Optional[G2P] = None,
        mesh=None,  # optional jax Mesh: shard synthesis batches over `data`
        vocoder_structure: Optional[Dict] = None,  # explicit generator
        # kwargs for checkpoints whose dilations/strides deviate from the
        # HiFi-GAN conventions generator_structure_from_params assumes
        # (dilations are not recoverable from weight shapes)
    ):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # params replicate once; every batch shards over the data axis —
            # the sweep (and long-form sentence batches) then scale over ICI
            from emotts.parallel.mesh import batch_sharding, replicated

            self._batch_sh = batch_sharding(mesh)
            rep = replicated(mesh)
            fs2_variables = jax.device_put(fs2_variables, rep)
            if vocoder_params is not None:
                vocoder_params = jax.device_put(vocoder_params, rep)
        self.model = build_fastspeech2(cfg)
        self.fs2_variables = fs2_variables
        if vocoder_params is not None:
            # Build the generator to match the checkpoint's actual structure
            # (any V1/V2/V3-family model) instead of hard-coding V1 the way
            # the reference does (fastspeech2/train.py:225).
            if vocoder_structure is None:
                from emotts.nn.hifigan import generator_structure_from_params

                vocoder_structure = generator_structure_from_params(
                    vocoder_params, expected_upsample=cfg.audio.hop_length
                )
            self.vocoder = HiFiGANGenerator(**vocoder_structure)
        else:
            self.vocoder = HiFiGANGenerator(in_channels=cfg.audio.n_mels)
        self.vocoder_params = vocoder_params
        self.intensity_bank = intensity_bank
        self.g2p = g2p or G2P(
            cfg.inference.lexicon_path or None,
            neural=cfg.inference.neural_g2p,
            neural_beam=cfg.inference.neural_g2p_beam,
        )
        self._mel_fn = jax.jit(
            self._mel_forward,
            static_argnames=("max_mel_len", "pace", "pitch_rate", "energy_rate"),
        )
        self._voc_fn = jax.jit(self._vocode) if vocoder_params is not None else None
        # fused FS2-forward + first-vocoder-window program: streaming's
        # time-to-first-audio pays ONE dispatch round trip instead of three
        # (mel dispatch, length fetch, vocoder dispatch) — on a tunneled
        # host↔chip link each saved trip is ~25 ms of serving latency
        self._first_fn = (
            jax.jit(
                self._first_chunk,
                static_argnames=(
                    "max_mel_len", "pace", "pitch_rate", "energy_rate",
                    "window",
                ),
            )
            if vocoder_params is not None
            else None
        )

    # -- jitted cores ---------------------------------------------------

    def _mel_forward(
        self, variables, phonemes, speakers, intensity, max_mel_len,
        pace, pitch_rate, energy_rate,
    ):
        preds = self.model.apply(
            variables,
            phonemes,
            speakers,
            intensity=intensity,
            pace=pace,
            pitch_rate=pitch_rate,
            energy_rate=energy_rate,
            max_mel_len=max_mel_len,
        )
        return preds[0], preds[7]  # mel (B, T, n_mels), mel_lens (B,)

    def _first_chunk(
        self, variables, voc_params, phonemes, speakers, intensity,
        max_mel_len, pace, pitch_rate, energy_rate, window,
    ):
        """FS2 forward + vocode of the first ``window`` mel frames in one XLA
        program.  The returned mel/lens let the host continue streaming the
        remaining chunks without re-running FastSpeech2."""
        mel, lens = self._mel_forward(
            variables, phonemes, speakers, intensity, max_mel_len,
            pace, pitch_rate, energy_rate,
        )
        pcm = self._vocode(voc_params, mel[:, :window])
        return pcm, mel, lens

    def _vocode(self, params, mel):
        wav = self.vocoder.apply(params, mel)  # (B, T·hop)
        # 16-bit PCM on device: the wav files are written as int16 anyway,
        # and halving the transfer matters — host links (e.g. the tunneled
        # axon platform) move tens of MB per sweep
        return jnp.clip(
            wav.astype(jnp.float32) * 32767.0, -32768.0, 32767.0
        ).astype(jnp.int16)

    # -- mesh helpers ----------------------------------------------------

    def _padded_batch(self, b: int) -> int:
        """Round the batch up to a multiple of the data-axis size so it
        shards evenly; padded rows are all-pad phonemes ⇒ mel_lens 0, so
        they contribute nothing downstream."""
        if self.mesh is None:
            return b
        from emotts.parallel.mesh import data_axis_size, round_up_to_multiple

        return round_up_to_multiple(b, data_axis_size(self.mesh))

    def _put(self, arr):
        return (
            arr if self.mesh is None else jax.device_put(arr, self._batch_sh)
        )

    # -- public API ------------------------------------------------------

    def text_to_phoneme_ids(self, text: str) -> np.ndarray:
        return np.asarray(self.g2p.text_to_sequence(text), dtype=np.int32)

    def intensity_for(
        self, speaker_id: int, emotion_id: int, level: float, n_phones: int,
        scale: float = 1.0,
    ) -> np.ndarray:
        """Prototype lookup broadcast over phones; neutral (class 0) → zeros.

        CONTINUOUS control beyond the reference's 3 discrete levels
        (fastspeech2/inference.py:12-21): a fractional ``level`` linearly
        interpolates between the two adjacent bucket prototypes (level 1.5 =
        halfway between buckets 1 and 2; clamped to the bank's range), and
        ``scale`` multiplies the conditioning vector (0 → neutral-like,
        >1 → exaggerated) — the knobs the learned rank ordering makes
        meaningful."""
        n_emo = self.cfg.n_emotions
        if emotion_id == 0 or self.intensity_bank is None:
            return np.zeros((n_phones, n_emo), np.float32)
        proto = self._proto(speaker_id, emotion_id, level) * scale
        return np.broadcast_to(proto, (n_phones, n_emo)).astype(np.float32)

    def _proto(self, speaker_id: int, emotion_id: int, level: float) -> np.ndarray:
        """Level-interpolated prototype vector (n_emo,) for one
        (speaker, emotion)."""
        levels = self.intensity_bank.shape[2]
        lv = float(np.clip(level, 0.0, levels - 1))
        lo, hi = int(np.floor(lv)), int(np.ceil(lv))
        frac = lv - lo
        proto = (1.0 - frac) * self.intensity_bank[speaker_id, emotion_id, lo]
        if frac:
            proto = proto + frac * self.intensity_bank[speaker_id, emotion_id, hi]
        return np.asarray(proto, np.float32)

    def intensity_for_mix(
        self,
        speaker,  # int id, or (n_speakers,) float blend weights
        emotion_mix,  # [(emotion_id, level, weight), ...]
        n_phones: int,
        scale: float = 1.0,
    ) -> np.ndarray:
        """Blended prototype conditioning — FINE-GRAINED control squared.

        Beyond the per-emotion continuous ``level``: mix prototypes ACROSS
        emotions (0.6·amused + 0.4·sleepy) and, for a blended speaker,
        across the per-speaker prototype banks with the same weights used
        for the speaker-embedding blend.  Neutral (class 0) contributes
        zeros, matching the reference's neutral convention
        (fastspeech2/inference.py:13-14)."""
        n_emo = self.cfg.n_emotions
        out = np.zeros((n_emo,), np.float32)
        if self.intensity_bank is not None:
            for emo, level, w in emotion_mix:
                if emo == 0 or w == 0.0:
                    continue
                if isinstance(speaker, np.ndarray):
                    proto = np.zeros((n_emo,), np.float32)
                    for s, ws in enumerate(speaker):
                        if ws:
                            proto += float(ws) * self._proto(s, emo, level)
                else:
                    proto = self._proto(int(speaker), emo, level)
                out += float(w) * proto
        out *= scale
        return np.broadcast_to(out, (n_phones, n_emo)).astype(np.float32)

    def synthesize_mels(
        self,
        phoneme_ids: np.ndarray,  # (P,)
        speakers: np.ndarray,  # (B,)
        intensity: np.ndarray,  # (B, P, n_emo)
        pace: float = 1.0,  # prosody controls (reference: model kwargs at
        pitch_rate: float = 1.0,  # fastspeech2/model.py:286-288)
        energy_rate: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched mel synthesis with predicted durations/pitch/energy."""
        phon, spk, inten = self._bucket_pad(phoneme_ids, speakers, intensity)
        mel, mel_lens = self._mel_fn(
            self.fs2_variables,
            phon,
            spk,
            inten,
            max_mel_len=self.cfg.fastspeech2.max_mel_len,
            pace=pace,
            pitch_rate=pitch_rate,
            energy_rate=energy_rate,
        )
        return mel, mel_lens

    def _bucket_pad(self, phoneme_ids, speakers, intensity):
        """Pad one phoneme sequence + per-row conditioning to its phone
        bucket and the mesh-even batch size; returns device-ready arrays."""
        p_bucket = pick_bucket(len(phoneme_ids), self.cfg.bucketing.phone_buckets)
        if p_bucket < 0:
            p_bucket = len(phoneme_ids)
        b = len(speakers)
        b_pad = self._padded_batch(b)
        phon = np.zeros((b_pad, p_bucket), np.int32)
        phon[:b, : len(phoneme_ids)] = phoneme_ids
        speakers = np.asarray(speakers)
        if speakers.ndim == 2:  # blend weights (B, n_speakers)
            spk = np.zeros((b_pad, speakers.shape[1]), np.float32)
        else:
            spk = np.zeros((b_pad,), np.int32)
        spk[:b] = speakers
        inten = np.zeros((b_pad, p_bucket, intensity.shape[-1]), np.float32)
        inten[:b, : intensity.shape[1]] = intensity
        return (
            self._put(jnp.asarray(phon)),
            self._put(jnp.asarray(spk)),
            self._put(jnp.asarray(inten)),
        )

    def synthesize_first_chunk(
        self,
        phoneme_ids: np.ndarray,  # (P,)
        speakers: np.ndarray,  # (B,)
        intensity: np.ndarray,  # (B, P, n_emo)
        window: int,  # mel frames vocoded inside the fused program
        pace: float = 1.0,
        pitch_rate: float = 1.0,
        energy_rate: float = 1.0,
    ):
        """One fused dispatch returning (int16 PCM of mel[:, :window], mel,
        mel_lens).  The PCM is exact on rows whose content length ≥ window
        (true left edge + a full right halo inside the window); shorter rows
        must be re-vocoded content-trimmed by the caller."""
        if self._first_fn is None:
            raise RuntimeError("no vocoder params loaded")
        phon, spk, inten = self._bucket_pad(phoneme_ids, speakers, intensity)
        return self._first_fn(
            self.fs2_variables,
            self.vocoder_params,
            phon,
            spk,
            inten,
            max_mel_len=self.cfg.fastspeech2.max_mel_len,
            pace=pace,
            pitch_rate=pitch_rate,
            energy_rate=energy_rate,
            window=window,
        )

    def vocode(self, mel, row_frame_budget: Optional[int] = None):
        """mel (B, T, n_mels) → int16 PCM device array (B, T·hop).

        Returns 16-bit PCM (the wav-file sample format) so the host
        transfer is half the size of float32; divide by 32767 for float
        waveforms (``intensity_sweep`` does this for its return dict).

        Batches whose rows × frames exceed ``inference.vocode_row_frames``
        are split into equal row-chunks of one compiled shape (the fp32
        generator's upsample intermediates scale with rows × samples and
        a single oversized dispatch can exceed chip HBM — see the config
        field's measured numbers)."""
        if self._voc_fn is None:
            raise RuntimeError("no vocoder params loaded")
        budget = (self.cfg.inference.vocode_row_frames
                  if row_frame_budget is None else row_frame_budget)
        b, t = int(mel.shape[0]), int(mel.shape[1])
        if budget <= 0 or b * t <= budget:
            return self._voc_fn(self.vocoder_params, mel)
        # rows per chunk such that every dispatch honors the budget; a
        # single row longer than the budget dispatches alone (t is bounded
        # by max_mel_len, well under any sane budget)
        k = max(1, budget // t)
        k = -(-b // (-(-b // k)))  # rebalance: equal chunks, no pad waste
        outs = []
        for s in range(0, b, k):
            chunk = mel[s : s + k]
            pad = k - int(chunk.shape[0])
            if pad:  # keep ONE dispatch shape so the program compiles once
                chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            pcm = self._voc_fn(self.vocoder_params, chunk)
            outs.append(pcm[: k - pad] if pad else pcm)
        return jnp.concatenate(outs, axis=0)

    def intensity_sweep(
        self, text: str, out_dir: Optional[str] = None
    ) -> Dict[Tuple[str, str, int], np.ndarray]:
        """The reference's demo sweep: every (speaker, emotion, level) for one
        sentence — one batched device pass instead of 60 sequential forwards."""
        cfg = self.cfg
        ids = self.text_to_phoneme_ids(text)
        levels = cfg.inference.bucket_size
        combos = list(
            itertools.product(
                range(cfg.n_speakers), range(cfg.n_emotions), range(levels)
            )
        )
        speakers = np.array([s for s, _, _ in combos], np.int32)
        intensity = np.stack(
            [self.intensity_for(s, e, lv, len(ids)) for s, e, lv in combos]
        )
        mel, mel_lens = self.synthesize_mels(ids, speakers, intensity)
        wav = self.vocode(mel) if self._voc_fn is not None else None

        hop = cfg.audio.hop_length
        mel_lens = np.asarray(jax.device_get(mel_lens))  # (B,), tiny
        out: Dict[Tuple[str, str, int], np.ndarray] = {}
        if wav is not None:
            # transfer only the content span (padded capacity frames carry no
            # audio) — the int16 device-side PCM (see _vocode) plus this trim
            # cuts host traffic ~5× on slow links
            t_max = int(mel_lens.max()) * hop
            wav_np = np.asarray(jax.device_get(wav[:, :t_max]))
            wav_np = wav_np.astype(np.float32) / 32767.0
            mel_np = None
        else:
            wav_np = None
            mel_np = np.asarray(jax.device_get(mel))
        for i, (s, e, lv) in enumerate(combos):
            key = (cfg.data.speakers[s], cfg.data.emotions[e], lv)
            if wav_np is not None:
                out[key] = wav_np[i, : int(mel_lens[i]) * hop]
            else:
                out[key] = mel_np[i, : int(mel_lens[i])]
        if out_dir is not None:
            Path(out_dir).mkdir(parents=True, exist_ok=True)
            for (spk, emo, lv), item in out.items():
                if wav_np is not None:
                    write_wav(
                        os.path.join(out_dir, f"{spk}_{emo}_{lv}.wav"),
                        item,
                        cfg.audio.sampling_rate,
                    )
                else:  # no vocoder configured: persist the mels instead
                    np.save(
                        os.path.join(out_dir, f"{spk}_{emo}_{lv}_mel.npy"), item
                    )
        return out

    def synthesize_requests(
        self,
        requests,  # sequence of dicts: text, speaker, emotion[, level, scale]
        pace: float = 1.0,
        pitch_rate: float = 1.0,
        energy_rate: float = 1.0,
        gap_s: float = 0.15,
    ):
        """Serve a BATCH of long-form requests in one pass: every request's
        text is sentence-split, and all segments across all requests that
        share a phone bucket go through one jitted FS2+vocoder dispatch —
        different speakers/emotions/levels mix freely within a batch row.
        Device work is O(#distinct buckets), independent of request count.

        Returns one float32 waveform per request (sentences joined with
        ``gap_s`` of silence).  Prosody controls are jit-static and therefore
        shared per call.
        """
        if self._voc_fn is None:
            raise RuntimeError("synthesize_requests requires vocoder params")
        cfg = self.cfg

        def _spk_spec(r):
            """int speaker id, or (n_speakers,) float weights for a blend."""
            mix = r.get("speaker_mix")
            if not mix:
                return int(r["speaker"])
            w = np.zeros((cfg.n_speakers,), np.float32)
            for sid, ws in (mix.items() if isinstance(mix, dict) else mix):
                w[int(sid)] += float(ws)  # duplicate entries accumulate
            total = w.sum()
            if total <= 0:
                raise ValueError("speaker_mix weights must sum > 0")
            return w / total

        def _emo_mix(r):
            """[(emotion_id, level, weight)] — pure requests become a
            single-entry mix so one code path conditions every row."""
            mix = r.get("emotion_mix")
            lvl = float(r.get("level", 0.0))
            if not mix:
                return [(int(r["emotion"]), lvl, 1.0)]
            out = []
            for entry in (mix.items() if isinstance(mix, dict) else mix):
                if len(entry) == 2:
                    emo, w = entry
                    out.append((int(emo), lvl, float(w)))
                else:
                    emo, elvl, w = entry
                    out.append((int(emo), float(elvl), float(w)))
            total = sum(w for _, _, w in out)
            if total <= 0:
                raise ValueError("emotion_mix weights must sum > 0")
            return [(e, l, w / total) for e, l, w in out]

        segs = []  # (request_idx, order_in_request, ids, spk_spec, emo_mix, scale)
        for r_i, r in enumerate(requests):
            if r.get("phonemes"):
                # direct ARPABET input (pronunciation override / SSML
                # <phoneme ph=...>): bypasses G2P entirely
                from emotts.text.vocab import (filter_to_vocab,
                                               phoneme_to_sequence)

                phones = (r["phonemes"].split()
                          if isinstance(r["phonemes"], str)
                          else list(r["phonemes"]))
                kept = filter_to_vocab(phones)
                if len(kept) != len(phones):
                    raise ValueError(
                        f"request {r_i}: non-ARPABET phoneme tokens "
                        f"{[p for p in phones if p not in kept]}"
                    )
                seq = np.asarray(phoneme_to_sequence(kept), np.int32)
                seqs = [seq] if len(seq) else []
            else:
                sentences = split_sentences(r["text"])
                seqs = [self.text_to_phoneme_ids(s) for s in sentences]
                seqs = [s for s in seqs if len(s) > 0]
            if not seqs:
                raise ValueError(
                    f"request {r_i}: no synthesizable sentences in text"
                )
            for s_i, ids in enumerate(seqs):
                segs.append((
                    r_i, s_i, ids, _spk_spec(r), _emo_mix(r),
                    float(r.get("scale", 1.0)),
                ))

        groups: Dict[int, list] = {}
        for g_i, seg in enumerate(segs):
            pb = pick_bucket(len(seg[2]), cfg.bucketing.phone_buckets)
            if pb < 0:
                pb = len(seg[2])
            groups.setdefault(pb, []).append(g_i)

        pieces: Dict[Tuple[int, int], np.ndarray] = {}
        hop = cfg.audio.hop_length
        for pb, idxs in sorted(groups.items()):
            b = len(idxs)
            b_pad = self._padded_batch(b)  # mesh: shard segments over data
            phon = np.zeros((b_pad, pb), np.int32)
            inten = np.zeros((b_pad, pb, cfg.n_emotions), np.float32)
            # one blended row ⇒ the whole dispatch uses the weights path
            # (pure rows become one-hot, numerically identical to id lookup)
            blended = any(isinstance(segs[g][3], np.ndarray) for g in idxs)
            if blended:
                spk = np.zeros((b_pad, cfg.n_speakers), np.float32)
            else:
                spk = np.zeros((b_pad,), np.int32)
            for row, g_i in enumerate(idxs):
                r_i, s_i, ids, spk_spec, emo_mix, scale = segs[g_i]
                phon[row, : len(ids)] = ids
                if blended:
                    if isinstance(spk_spec, np.ndarray):
                        spk[row] = spk_spec
                    else:
                        spk[row, int(spk_spec)] = 1.0
                else:
                    spk[row] = spk_spec
                inten[row, : len(ids)] = self.intensity_for_mix(
                    spk_spec, emo_mix, len(ids), scale=scale
                )
            mel, mel_lens = self._mel_fn(
                self.fs2_variables,
                self._put(jnp.asarray(phon)),
                self._put(jnp.asarray(spk)),
                self._put(jnp.asarray(inten)),
                max_mel_len=cfg.fastspeech2.max_mel_len,
                pace=pace,
                pitch_rate=pitch_rate,
                energy_rate=energy_rate,
            )
            pcm = self.vocode(mel)  # int16 (B, T·hop) on device
            lens = np.asarray(jax.device_get(mel_lens))
            t_max = int(lens.max()) * hop
            pcm_np = np.asarray(jax.device_get(pcm[:, :t_max]))
            for row, g_i in enumerate(idxs):
                r_i, s_i = segs[g_i][0], segs[g_i][1]
                pieces[(r_i, s_i)] = (
                    pcm_np[row, : int(lens[row]) * hop].astype(np.float32)
                    / 32767.0
                )

        gap = np.zeros(int(gap_s * cfg.audio.sampling_rate), np.float32)
        parts_by_request: list = [[] for _ in requests]
        for r_i, s_i, *_ in segs:  # segs is ordered by (request, sentence)
            parts_by_request[r_i].append(pieces[(r_i, s_i)])
        out = []
        for parts in parts_by_request:
            chunks: list = []
            for i, piece in enumerate(parts):
                if i:
                    chunks.append(gap)
                chunks.append(piece)
            out.append(np.concatenate(chunks))
        return out

    def synthesize_ssml(
        self,
        markup: str,
        speaker: int = 0,  # defaults for spans without overrides
        emotion: int = 0,
        level: float = 0.0,
        intensity_scale: float = 1.0,
        pace: float = 1.0,
        pitch_rate: float = 1.0,
        energy_rate: float = 1.0,
        gap_s: float = 0.15,  # between sentences within a span
        span_gap_s: float = 0.05,  # between adjacent control spans
    ) -> np.ndarray:
        """Render SSML-lite markup (emotts/text/ssml.py) to one waveform.

        Span-level <voice>/<emotion>/<prosody rate>/<phoneme>/<break>
        control inside one utterance — the serving-grade input format the
        reference's fixed (speaker, emotion, level) driver cannot express.
        All spans sharing a speaking rate render through ONE
        ``synthesize_requests`` call (rate is jit-static), so device work
        stays O(#distinct buckets × #distinct rates).
        """
        from emotts.text.ssml import SSMLError, parse_ssml

        cfg = self.cfg
        segs = parse_ssml(markup)

        def rid(value, table, what, default):
            if value is None:
                return default
            try:
                return resolve_name(value, table, what)
            except ValueError as e:
                raise SSMLError(str(e)) from None

        jobs: Dict[float, list] = {}  # rate -> [(segment_index, request)]
        for i, seg in enumerate(segs):
            if seg.kind == "break":
                continue
            c = seg.controls
            req = {
                "speaker": rid(c.speaker, list(cfg.data.speakers),
                               "speaker", speaker),
                "emotion": rid(c.emotion, list(cfg.data.emotions),
                               "emotion", emotion),
                "level": level if c.level is None else c.level,
                "scale": intensity_scale if c.scale is None else c.scale,
            }
            if seg.kind == "phonemes":
                req["phonemes"] = seg.phonemes
            else:
                req["text"] = seg.text
            rate = 1.0 if c.rate is None else float(c.rate)
            if rate <= 0:
                raise SSMLError(f"prosody rate must be > 0, got {rate}")
            jobs.setdefault(rate, []).append((i, req))
        if not jobs:
            raise SSMLError("no synthesizable content in SSML input")

        waves: Dict[int, np.ndarray] = {}
        for rate, items in sorted(jobs.items()):
            # SSML rate is a SPEED multiplier; FS2 ``pace`` multiplies
            # durations (pace 0.5 = faster) — so rate maps to pace/rate
            outs = self.synthesize_requests(
                [r for _, r in items], pace=pace / rate,
                pitch_rate=pitch_rate, energy_rate=energy_rate, gap_s=gap_s,
            )
            for (i, _), w in zip(items, outs):
                waves[i] = w

        sr = cfg.audio.sampling_rate
        parts: list = []
        prev_spoken = False
        for i, seg in enumerate(segs):
            if seg.kind == "break":
                parts.append(np.zeros(int(seg.seconds * sr), np.float32))
                prev_spoken = False
            else:
                if prev_spoken:
                    parts.append(np.zeros(int(span_gap_s * sr), np.float32))
                parts.append(waves[i])
                prev_spoken = True
        return np.concatenate(parts)

    def synthesize_text(
        self,
        text: str,
        speaker_id: int,
        emotion_id: int,
        level: float = 0,
        pace: float = 1.0,
        pitch_rate: float = 1.0,
        energy_rate: float = 1.0,
        gap_s: float = 0.15,
        intensity_scale: float = 1.0,
        speaker_mix=None,  # [(speaker_id, weight), ...] — blended voice
        emotion_mix=None,  # [(emotion_id[, level], weight), ...] — blended affect
    ) -> np.ndarray:
        """Long-form synthesis: split ``text`` into sentences, batch sentences
        that share a phone bucket through one jitted pass each, vocode, and
        stitch the waveforms in order with ``gap_s`` of silence between
        sentences.  Returns a float32 waveform in [-1, 1].

        Goes beyond the reference driver (one fixed sentence,
        fastspeech2/inference.py:55): arbitrary-length input runs in
        O(#buckets) device dispatches instead of O(#sentences).
        """
        req = {
            "text": text, "speaker": speaker_id, "emotion": emotion_id,
            "level": level, "scale": intensity_scale,
        }
        if speaker_mix:
            req["speaker_mix"] = speaker_mix
        if emotion_mix:
            req["emotion_mix"] = emotion_mix
        return self.synthesize_requests(
            [req],
            pace=pace, pitch_rate=pitch_rate, energy_rate=energy_rate,
            gap_s=gap_s,
        )[0]


def load_synthesizer(cfg: Config, fs2_exp: Optional[str] = None,
                     rank_exp: Optional[str] = None,
                     mesh=None) -> Synthesizer:
    """Assemble a Synthesizer from experiment artifacts (best FS2 checkpoint,
    intensity.npy, optional converted vocoder checkpoint).

    ``mesh`` (or a multi-device mesh config) enables data-parallel synthesis:
    sweep/sentence batches shard over the mesh's data axis.  The default
    ``mesh.data_parallel: -1`` means "all devices", matching the trainers —
    synthesis engages the mesh whenever it would span more than one chip."""
    if mesh is None:
        from emotts.parallel.mesh import make_mesh

        dp = cfg.mesh.data_parallel
        n_avail = len(jax.devices())
        if dp > 1 or (dp <= 0 and n_avail // max(1, cfg.mesh.model_parallel) > 1):
            mesh = make_mesh(cfg.mesh)
    from emotts.train.checkpoint import load_best_params
    from emotts.train.fs2_trainer import init_fs2_variables, build_fastspeech2

    fs2_exp = fs2_exp or os.path.join(
        cfg.data.experiment_path, "fastspeech2", cfg.inference.fs2_exp
    )
    rank_exp = rank_exp or os.path.join(
        cfg.data.experiment_path, "rank_model", cfg.inference.rank_exp
    )
    model = build_fastspeech2(cfg)
    template = init_fs2_variables(cfg, model, 0)
    fs2_vars = load_best_params(
        fs2_exp,
        {"params": template["params"], "batch_stats": template["batch_stats"]},
    )
    intensity_path = os.path.join(rank_exp, "intensity.npy")
    bank = np.load(intensity_path) if os.path.exists(intensity_path) else None

    return Synthesizer(
        cfg, fs2_vars, maybe_load_vocoder(cfg), bank, mesh=mesh
    )


def maybe_load_vocoder(cfg: Config):
    """Load ``cfg.inference.vocoder_checkpoint`` if configured, warning
    (rather than silently degrading) when the configured path is missing.
    Returns None when no vocoder is configured/available."""
    ckpt = cfg.inference.vocoder_checkpoint
    if not ckpt:
        return None
    if not os.path.exists(ckpt):
        import sys

        print(
            f"[vocoder] WARNING: inference.vocoder_checkpoint={ckpt!r} does "
            "not exist — continuing without a vocoder (mel-only outputs, no "
            "F0 metrics)",
            file=sys.stderr,
        )
        return None
    return load_vocoder_checkpoint(ckpt, cfg)


def load_vocoder_checkpoint(path: str, cfg: Config) -> dict:
    """Load a vocoder checkpoint: .npz of converted params, or a torch .pt/.pth
    state_dict (converted on the fly when torch is available)."""
    if path.endswith(".npz"):
        flat = np.load(path)
        params: dict = {}
        for key in flat.files:
            node = params
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = flat[key]
        return {"params": params}
    import torch  # noqa: deferred; only for torch checkpoints

    from emotts.nn.hifigan import convert_torch_state_dict

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "generator" in sd:
        sd = sd["generator"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torch_state_dict(sd)


def save_vocoder_params_npz(params: dict, path: str) -> None:
    """Flatten converted vocoder params to an .npz for hermetic deployments."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    walk(params["params"])
    np.savez(path, **flat)

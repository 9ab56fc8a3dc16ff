"""Synthetic EmoV-DB-shaped corpus for pipeline tests.

Generates sine-harmonic 'speech' wavs with hand-written TextGrids and .lab
transcripts in the corpus layout the preprocessing pipeline consumes
(corpus/<speaker>/<emotion>_<id>.{wav,lab} + aligned/<speaker>/*.TextGrid),
so the full preprocess → split → train → bucketize → synthesize chain runs
hermetically (SURVEY.md §4's test strategy).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List

import numpy as np

from emotts.audio.textgrid import Interval, write_textgrid
from emotts.audio.wavio import write_wav
from emotts.utils.config import Config

_PHONES = ["HH", "AH0", "L", "OW1", "W", "ER1", "D", "K", "AE1", "T"]

# Graded emotion signatures (opt-in via make_corpus(graded_emotions=True)).
# Each non-neutral emotion gets a distinct acoustic recipe whose magnitude
# scales with a per-utterance strength s ~ U(0.15, 1) — the synthetic
# counterpart of EmoV-DB's intra-class intensity variation, without which
# the rank model has no intensity axis to learn (bucket prototypes collapse
# to 1-2% spread and ordering metrics cap at chance; see
# emotts/eval/intensity_eval.py --contrast).  Components were chosen to
# survive the feature chain: 3rd-harmonic ratio and AM sidebands are
# mel-visible, the f0 scale moves both the pitch track and the mel harmonic
# peaks.  (h3 = 3rd-harmonic amplitude, am = (depth, rate_hz), f0 = relative
# f0 shift at s=1.)
_SIGNATURES = [
    {"h3": 0.35, "am": (0.35, 5.0), "f0": 0.12},   # amused-like
    {"h3": 0.50, "am": (0.50, 30.0), "f0": 0.22},  # angry-like
    {"h3": 0.15, "am": (0.25, 2.0), "f0": -0.18},  # sleepy-like
    {"h3": 0.25, "am": (0.40, 9.0), "f0": -0.08},  # disgust-like
]


def make_corpus(
    root: str,
    speakers: List[str] = ("spk_a", "spk_b"),
    emotions: List[str] = ("neutral", "amused", "angry"),
    utts_per_emotion: int = 8,
    sr: int = 16000,
    seed: int = 0,
    graded_emotions: bool = False,
) -> Config:
    """Build a tiny corpus under ``root`` and return a matching Config.

    With ``graded_emotions=True`` every non-neutral utterance carries its
    emotion's :data:`_SIGNATURES` recipe at a random strength, giving the
    rank model a real intensity gradient (emotion index 0 is treated as
    neutral, matching the pipeline's convention).  The per-utterance ground
    -truth strengths are recorded to ``<root>/strengths.json`` keyed
    ``"<speaker>/<emotion>_<id>"`` so tests and the convergence campaign can
    verify the axis is measurable."""
    rng = np.random.default_rng(seed)
    root_p = Path(root)
    corpus = root_p / "corpus"
    aligned = root_p / "aligned"
    strengths = {}

    for speaker in speakers:
        (corpus / speaker).mkdir(parents=True, exist_ok=True)
        (aligned / speaker).mkdir(parents=True, exist_ok=True)
        for ei, emotion in enumerate(emotions):
            sig = (_SIGNATURES[(ei - 1) % len(_SIGNATURES)]
                   if graded_emotions and ei > 0 else None)
            for i in range(utts_per_emotion):
                audio_id = f"{i:04d}"
                n_phones = int(rng.integers(3, 7))
                phone_durs = rng.uniform(0.08, 0.2, size=n_phones)
                total = float(phone_durs.sum())
                lead, tail = 0.1, 0.1

                # per-utterance emotion strength: the intensity ground truth
                s = float(rng.uniform(0.15, 1.0)) if sig is not None else 0.0

                # voiced signal: per-phone tones with vibrato
                f_base = rng.uniform(120, 280)
                if sig is not None:
                    f_base *= 1.0 + s * sig["f0"]
                samples = []
                t_off = 0.0  # utterance-continuous clock so AM has no seams
                for k, d in enumerate(phone_durs):
                    t = np.arange(int(d * sr)) / sr
                    f = f_base * (1.0 + 0.08 * k)
                    seg = 0.4 * np.sin(2 * np.pi * f * t)
                    seg += 0.2 * np.sin(2 * np.pi * 2 * f * t)
                    if sig is not None:
                        seg += s * sig["h3"] * np.sin(2 * np.pi * 3 * f * t)
                        depth, rate = sig["am"]
                        seg *= 1.0 + s * depth * np.sin(
                            2 * np.pi * rate * (t + t_off)
                        )
                    t_off += float(d)
                    samples.append(seg)
                y = np.concatenate(
                    [np.zeros(int(lead * sr))]
                    + samples
                    + [np.zeros(int(tail * sr))]
                ).astype(np.float32)
                y += 0.003 * rng.standard_normal(len(y)).astype(np.float32)
                if sig is not None:
                    # AM + added harmonic can push |y| past 1; normalize ALL
                    # graded utterances to a common peak (not just clipping
                    # ones) so gain treatment is uniform across the strength
                    # range — a conditional rescale would put an s-dependent
                    # kink in the intensity-energy gradient near threshold
                    peak = float(np.abs(y).max())
                    if peak > 0:
                        y *= np.float32(0.9 / peak)
                    strengths[f"{speaker}/{emotion}_{audio_id}"] = s

                stem = corpus / speaker / f"{emotion}_{audio_id}"
                write_wav(str(stem) + ".wav", y, sr)
                (Path(str(stem) + ".lab")).write_text("hello world test\n")

                # matching TextGrid: sil | phones | sil
                intervals = [Interval(0.0, lead, "")]
                t0 = lead
                for k, d in enumerate(phone_durs):
                    intervals.append(
                        Interval(t0, t0 + d, _PHONES[k % len(_PHONES)])
                    )
                    t0 += d
                xmax = lead + total + tail
                intervals.append(Interval(t0, xmax, "sil"))
                write_textgrid(
                    str(aligned / speaker / f"{emotion}_{audio_id}.TextGrid"),
                    intervals,
                    xmax,
                )

    if graded_emotions:
        (root_p / "strengths.json").write_text(json.dumps(strengths, indent=1))

    cfg = Config()
    cfg.data.data_path = str(root_p / "raw")
    cfg.data.corpus_path = str(corpus)
    cfg.data.textgrid_path = str(aligned)
    cfg.data.preprocessed_path = str(root_p / "preprocessed")
    cfg.data.experiment_path = str(root_p / "experiments")
    cfg.data.speakers = list(speakers)
    cfg.data.emotions = list(emotions)
    cfg.data.test_utts_per_emotion = 2
    cfg.data.neutral_pairs_per_utt = 2
    cfg.bucketing.frame_buckets = [64, 96, 128]
    cfg.bucketing.phone_buckets = [8, 16]
    return cfg

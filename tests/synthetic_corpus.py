"""Synthetic EmoV-DB-shaped corpus for pipeline tests.

Generates sine-harmonic 'speech' wavs with hand-written TextGrids and .lab
transcripts in the corpus layout the preprocessing pipeline consumes
(corpus/<speaker>/<emotion>_<id>.{wav,lab} + aligned/<speaker>/*.TextGrid),
so the full preprocess → split → train → bucketize → synthesize chain runs
hermetically (SURVEY.md §4's test strategy).
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from emotts.audio.textgrid import Interval, write_textgrid
from emotts.audio.wavio import write_wav
from emotts.utils.config import Config

_PHONES = ["HH", "AH0", "L", "OW1", "W", "ER1", "D", "K", "AE1", "T"]


def make_corpus(
    root: str,
    speakers: List[str] = ("spk_a", "spk_b"),
    emotions: List[str] = ("neutral", "amused", "angry"),
    utts_per_emotion: int = 8,
    sr: int = 16000,
    seed: int = 0,
) -> Config:
    """Build a tiny corpus under ``root`` and return a matching Config."""
    rng = np.random.default_rng(seed)
    root_p = Path(root)
    corpus = root_p / "corpus"
    aligned = root_p / "aligned"

    for speaker in speakers:
        (corpus / speaker).mkdir(parents=True, exist_ok=True)
        (aligned / speaker).mkdir(parents=True, exist_ok=True)
        for emotion in emotions:
            for i in range(utts_per_emotion):
                audio_id = f"{i:04d}"
                n_phones = int(rng.integers(3, 7))
                phone_durs = rng.uniform(0.08, 0.2, size=n_phones)
                total = float(phone_durs.sum())
                lead, tail = 0.1, 0.1

                # voiced signal: per-phone tones with vibrato
                f_base = rng.uniform(120, 280)
                samples = []
                for k, d in enumerate(phone_durs):
                    t = np.arange(int(d * sr)) / sr
                    f = f_base * (1.0 + 0.08 * k)
                    seg = 0.4 * np.sin(2 * np.pi * f * t)
                    seg += 0.2 * np.sin(2 * np.pi * 2 * f * t)
                    samples.append(seg)
                y = np.concatenate(
                    [np.zeros(int(lead * sr))]
                    + samples
                    + [np.zeros(int(tail * sr))]
                ).astype(np.float32)
                y += 0.003 * rng.standard_normal(len(y)).astype(np.float32)

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

"""Preprocessing throughput benchmark (BASELINE.json config 1).

Measures utterances/sec through the full host feature pipeline:
TextGrid parse → wav load/trim → DIO+StoneMask F0 (C++ native) →
STFT→mel→energy → normalization stats.  Runs on a generated synthetic
corpus (EmoV-DB-shaped) so it is hermetic.

Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> None:
    from emotts.audio.native import build_native, have_native
    from emotts.data.preprocess import preprocess_all
    from synthetic_corpus import make_corpus

    if not have_native():
        build_native()

    with tempfile.TemporaryDirectory() as tmp:
        cfg = make_corpus(tmp, utts_per_emotion=20)  # 2 spk × 3 emo × 20 = 120 utts
        t0 = time.perf_counter()
        counts = preprocess_all(cfg, verbose=False)
        wall = time.perf_counter() - t0
        n = sum(counts.values())
    print(
        json.dumps(
            {
                "metric": "preprocessing_throughput",
                "value": n / wall,
                "unit": "utt/sec",
                "native_f0": have_native(),
                "n_utterances": n,
            }
        )
    )


if __name__ == "__main__":
    main()

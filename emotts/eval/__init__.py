"""Objective evaluation: MCD/F0/duration metrics + experiment evaluator."""

from emotts.eval.evaluate import Evaluator
from emotts.eval.metrics import (
    dtw_alignment,
    dtw_path,
    duration_metrics,
    f0_metrics,
    mcd,
    mcd_dtw,
    mel_cepstra,
)

__all__ = [
    "Evaluator", "dtw_alignment", "dtw_path", "duration_metrics", "f0_metrics",
    "mcd", "mcd_dtw", "mel_cepstra",
]

"""Golden-file regression tests for the feature frontend.

The snapshot in tests/golden/features.npz pins the exact mel/energy/F0
values of a fixed harmonic signal (220 Hz + harmonics, 0.5 s).  Any numeric
drift in the STFT, Slaney filterbank, log compression, energy normalization
or the DIO+StoneMask chain fails here — the regression guard the reference
lacks entirely (SURVEY.md §4)."""

from pathlib import Path

import numpy as np

from emotts.audio import extract_f0, mel_energy_np
from emotts.utils import AudioConfig

GOLDEN = Path(__file__).parent / "golden" / "features.npz"


def _signal():
    sr = 16000
    t = np.arange(int(0.5 * sr)) / sr
    return (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 440 * t)
        + 0.125 * np.sin(2 * np.pi * 660 * t)
    ).astype(np.float32)


def test_mel_energy_matches_golden():
    y = _signal()
    g = np.load(GOLDEN)
    assert float(np.abs(y).sum()) == g["signal_hash"]
    mel, energy = mel_energy_np(y, AudioConfig())
    np.testing.assert_allclose(mel, g["mel"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(energy, g["energy"], rtol=1e-6, atol=1e-6)


def test_f0_matches_golden():
    y = _signal().astype(np.float64)
    g = np.load(GOLDEN)
    f0 = extract_f0(y, 256, 16000)
    np.testing.assert_allclose(f0, g["f0"], rtol=1e-8, atol=1e-8)
    # sanity: the voiced region tracks 220 Hz
    voiced = f0[f0 > 0]
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.02)

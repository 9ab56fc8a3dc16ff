"""F0 (DIO + StoneMask) tests on synthetic signals."""

import numpy as np
import pytest

from emotts.audio import dio, extract_f0, interpolate_unvoiced, stonemask

SR = 16000
HOP = 256


def _tone(freq, secs=0.8, sr=SR, harmonics=3):
    t = np.arange(int(secs * sr)) / sr
    y = np.zeros_like(t)
    for k in range(1, harmonics + 1):
        y += np.sin(2 * np.pi * freq * k * t) / k
    return (y / np.abs(y).max() * 0.6).astype(np.float64)


@pytest.mark.parametrize("freq", [110.0, 220.0, 330.0])
def test_dio_tracks_tone(freq):
    y = _tone(freq)
    f0, t = dio(y, SR, frame_period=HOP / SR * 1000.0)
    assert len(f0) == int(len(y) / SR * 1000 / 16) + 1
    voiced = f0[4:-4][f0[4:-4] > 0]
    assert len(voiced) > 0.7 * (len(f0) - 8)
    assert np.median(voiced) == pytest.approx(freq, rel=0.05)


def test_stonemask_refines():
    freq = 237.0  # off-grid frequency
    y = _tone(freq)
    f0, t = dio(y, SR, frame_period=16.0)
    refined = stonemask(y, f0, t, SR)
    voiced = refined[4:-4][refined[4:-4] > 0]
    assert np.median(voiced) == pytest.approx(freq, rel=0.01)
    # refinement should be at least as accurate as DIO
    dio_err = np.abs(np.median(f0[f0 > 0]) - freq)
    sm_err = np.abs(np.median(voiced) - freq)
    assert sm_err <= dio_err + 0.5


def test_silence_is_unvoiced():
    y = np.zeros(SR)
    f0, t = dio(y, SR, frame_period=16.0)
    assert (f0 == 0).all()


def test_voiced_unvoiced_boundary():
    """tone | silence | tone: the silent gap must be unvoiced."""
    y = np.concatenate([_tone(200.0, 0.4), np.zeros(SR // 2), _tone(200.0, 0.4)])
    f0 = extract_f0(y, HOP, SR)
    n = len(f0)
    third = n // 3
    mid = f0[third + 4 : 2 * third - 4]
    assert (mid == 0).mean() > 0.7
    edges = np.concatenate([f0[4 : third - 6], f0[2 * third + 6 : -4]])
    voiced = edges[edges > 0]
    assert np.median(voiced) == pytest.approx(200.0, rel=0.05)


def test_interpolate_unvoiced():
    p = np.array([0.0, 100.0, 0.0, 0.0, 200.0, 0.0])
    out = interpolate_unvoiced(p)
    np.testing.assert_allclose(out, [100.0, 100.0, 400 / 3, 500 / 3, 200.0, 200.0])
    # all zeros stays as is
    z = np.zeros(4)
    np.testing.assert_array_equal(interpolate_unvoiced(z), z)


def test_f0_frame_alignment_with_mel():
    """F0 frame count must track the mel frame count (1 + samples // hop)."""
    from emotts.audio import mel_energy_np, num_frames
    from emotts.utils import AudioConfig

    y = _tone(180.0, secs=0.63).astype(np.float32)
    f0 = extract_f0(y, HOP, SR)
    mel, energy = mel_energy_np(y, AudioConfig())
    # pyworld frame count can differ from the STFT count by at most 1;
    # the pipeline truncates both to sum(durations)
    assert abs(len(f0) - mel.shape[1]) <= 1

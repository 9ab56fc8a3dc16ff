"""Native (C++) component tests: cross-check against the numpy mirrors."""

import numpy as np
import pytest

from emotts.audio.native import (
    build_native,
    extract_f0_native,
    have_native,
    parse_textgrid_native,
)

pytestmark = pytest.mark.skipif(
    not (have_native() or build_native()), reason="native library not buildable"
)

SR = 16000
HOP = 256


def _tone(freq, secs=0.8, harmonics=3):
    t = np.arange(int(secs * SR)) / SR
    y = np.zeros_like(t)
    for k in range(1, harmonics + 1):
        y += np.sin(2 * np.pi * freq * k * t) / k
    return y / np.abs(y).max() * 0.6


@pytest.mark.parametrize("freq", [140.0, 237.0, 330.0])
def test_native_f0_accuracy(freq):
    y = _tone(freq)
    f0 = extract_f0_native(y, HOP, SR)
    voiced = f0[4:-4][f0[4:-4] > 0]
    assert len(voiced) > 0.6 * (len(f0) - 8)
    assert np.median(voiced) == pytest.approx(freq, rel=0.01)


def test_native_matches_numpy_mirror():
    from emotts.audio.f0 import extract_f0

    y = _tone(200.0, secs=0.6) + 0.002 * np.random.default_rng(0).standard_normal(
        int(0.6 * SR)
    )
    f_native = extract_f0_native(y, HOP, SR)
    f_numpy = extract_f0(y, HOP, SR)
    assert len(f_native) == len(f_numpy)
    both_voiced = (f_native > 0) & (f_numpy > 0)
    agree = np.mean((f_native > 0) == (f_numpy > 0))
    assert agree > 0.9  # voicing decisions agree
    if both_voiced.any():
        rel = np.abs(f_native[both_voiced] - f_numpy[both_voiced]) / f_numpy[both_voiced]
        assert np.median(rel) < 0.02


def test_native_silence():
    f0 = extract_f0_native(np.zeros(SR), HOP, SR)
    assert (f0 == 0).all()


def test_native_textgrid_parse(tmp_path):
    from emotts.audio.textgrid import Interval, process_textgrid, write_textgrid

    path = tmp_path / "t.TextGrid"
    intervals = [
        Interval(0.0, 0.25, ""),
        Interval(0.25, 0.5, "HH"),
        Interval(0.5, 0.9, "AH0"),
        Interval(0.9, 1.5, "sil"),
    ]
    write_textgrid(str(path), intervals, 1.5)
    parsed = parse_textgrid_native(str(path))
    assert parsed is not None
    assert len(parsed) == 4
    assert parsed[1] == (0.25, 0.5, "HH")
    assert parsed[0][2] == ""
    # missing tier → None
    assert parse_textgrid_native(str(path), "words") is None

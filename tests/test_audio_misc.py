"""TextGrid parsing, wav IO, normalization tests."""

import numpy as np
import pytest

from emotts.audio import (
    Interval,
    RunningStats,
    load_wav,
    parse_textgrid,
    process_textgrid,
    read_wav,
    remove_outliers,
    resample,
    trim_audio,
    write_textgrid,
    write_wav,
)

SIL = ["sil", "spn", "sp", ""]


@pytest.fixture
def tg_path(tmp_path):
    path = tmp_path / "test.TextGrid"
    write_textgrid(
        str(path),
        [
            Interval(0.0, 0.25, ""),
            Interval(0.25, 0.5, "HH"),
            Interval(0.5, 0.9, "AH0"),
            Interval(0.9, 1.1, "sp"),
            Interval(1.1, 1.5, "L"),
            Interval(1.5, 2.0, "sil"),
        ],
        2.0,
    )
    return str(path)


def test_parse_textgrid_long_format(tg_path):
    tiers = parse_textgrid(tg_path)
    assert len(tiers) == 1
    assert tiers[0].name == "phones"
    assert len(tiers[0].intervals) == 6
    assert tiers[0].intervals[1].text == "HH"
    assert tiers[0].intervals[1].start == pytest.approx(0.25)


def test_parse_textgrid_short_format(tmp_path):
    path = tmp_path / "short.TextGrid"
    path.write_text(
        '"ooTextFile"\n"TextGrid"\n0\n1.0\n<exists>\n1\n"IntervalTier"\n"phones"\n'
        '0\n1.0\n2\n0\n0.5\n"K"\n0.5\n1.0\n"AE1"\n'
    )
    tiers = parse_textgrid(str(path))
    assert tiers[0].name == "phones"
    assert [iv.text for iv in tiers[0].intervals] == ["K", "AE1"]


def test_process_textgrid(tg_path):
    phones, durations, t0, t1 = process_textgrid(tg_path, 16000, 256, SIL)
    # leading '' and trailing 'sil' stripped; inner 'sp' → 'spn'
    assert phones == ["HH", "AH0", "spn", "L"]
    assert t0 == pytest.approx(0.25)
    assert t1 == pytest.approx(1.5)
    # frame quantization: round(t * sr / hop)
    expect = [
        round(0.5 * 62.5) - round(0.25 * 62.5),
        round(0.9 * 62.5) - round(0.5 * 62.5),
        round(1.1 * 62.5) - round(0.9 * 62.5),
        round(1.5 * 62.5) - round(1.1 * 62.5),
    ]
    np.testing.assert_array_equal(durations, expect)


def test_process_textgrid_all_silence(tmp_path):
    path = tmp_path / "sil.TextGrid"
    write_textgrid(str(path), [Interval(0.0, 1.0, "sil")], 1.0)
    phones, durations, t0, t1 = process_textgrid(str(path), 16000, 256, SIL)
    assert phones == [] and len(durations) == 0 and t0 == t1 == 0.0


def test_wav_roundtrip(tmp_path):
    y = (0.4 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(str(path), y, 16000)
    y2, sr = read_wav(str(path))
    assert sr == 16000
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_resample():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y2 = resample(y, sr_in, sr_out)
    assert abs(len(y2) - sr_out) <= 1
    # spectral peak stays at 440 Hz
    spec = np.abs(np.fft.rfft(y2))
    peak_hz = spec.argmax() * sr_out / len(y2)
    assert peak_hz == pytest.approx(440.0, abs=2.0)


def test_load_wav_resamples(tmp_path):
    y = np.sin(2 * np.pi * 440 * np.arange(22050) / 22050).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(str(path), y, 22050)
    y2 = load_wav(str(path), 16000)
    assert abs(len(y2) - 16000) <= 1


def test_trim_audio():
    y = np.arange(16000, dtype=np.float32)
    out = trim_audio(y, 0.25, 0.5, 16000)
    assert len(out) == 4000
    assert out[0] == 4000.0


def test_running_stats_matches_batch():
    rng = np.random.default_rng(3)
    chunks = [rng.standard_normal(n) * 3 + 1 for n in (10, 100, 57)]
    rs = RunningStats()
    for c in chunks:
        rs.update(c)
    full = np.concatenate(chunks)
    assert rs.mean == pytest.approx(full.mean(), rel=1e-10)
    assert rs.std == pytest.approx(full.std(), rel=1e-10)


def test_remove_outliers():
    x = np.array([1.0, 2, 3, 4, 5, 100.0])
    out = remove_outliers(x)
    assert 100.0 not in out
    assert len(out) == 5

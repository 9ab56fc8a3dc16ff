"""Mel/STFT frontend tests: golden parity vs torch.stft + internal consistency."""

import numpy as np
import pytest

from emotts.audio import mel_energy_jax, mel_energy_np, mel_filterbank, stft_magnitude_np
from emotts.audio.mel import hann_window_periodic, hz_to_mel_slaney, mel_to_hz_slaney
from emotts.utils import AudioConfig

CFG = AudioConfig()


def _sine(freq=220.0, secs=0.7, sr=16000, rng=None):
    t = np.arange(int(secs * sr)) / sr
    y = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    if rng is not None:
        y += 0.01 * rng.standard_normal(len(t)).astype(np.float32)
    return y


def test_mel_scale_roundtrip():
    freqs = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    back = mel_to_hz_slaney(hz_to_mel_slaney(freqs))
    np.testing.assert_allclose(back, freqs, rtol=1e-10)
    # linear below 1 kHz: mel(200) / mel(400) == 0.5
    assert hz_to_mel_slaney(200.0) * 2 == pytest.approx(hz_to_mel_slaney(400.0))


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; peaks move monotonically with filter index
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_stft_matches_torch():
    """Bit-comparability gate: our STFT vs torch.stft with the torchaudio
    conventions the reference's mel frontend uses (center reflect pad,
    periodic Hann, one-sided, power=1)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    y = _sine(rng=rng)
    ours = stft_magnitude_np(y, CFG)
    ref = torch.stft(
        torch.from_numpy(y),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length, periodic=True),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mel_energy_np_shapes_and_ranges():
    y = _sine()
    mel, energy = mel_energy_np(y, CFG)
    t = 1 + len(y) // CFG.hop_length
    assert mel.shape == (CFG.n_mels, t)
    assert energy.shape == (t,)
    assert energy.min() == pytest.approx(0.0)
    assert energy.max() == pytest.approx(1.0)
    # log compression floor
    assert mel.min() >= np.log(CFG.clip_val) - 1e-6
    # a 220 Hz tone concentrates energy in low mel bins
    assert mel[:20].max() > mel[60:].max()


def test_mel_energy_jax_matches_np():
    rng = np.random.default_rng(2)
    lens = [9000, 11200]
    pad_to = 12000
    batch = np.zeros((2, pad_to), dtype=np.float32)
    for i, ln in enumerate(lens):
        batch[i, :ln] = _sine(300.0 + 100 * i, secs=ln / 16000, rng=rng)

    mel_b, energy_b, n_frames = mel_energy_jax(
        batch, np.array(lens, dtype=np.int32), CFG
    )
    mel_b, energy_b, n_frames = map(np.asarray, (mel_b, energy_b, n_frames))
    for i, ln in enumerate(lens):
        mel_ref, energy_ref = mel_energy_np(batch[i, :ln], CFG)
        t = mel_ref.shape[1]
        assert n_frames[i] == t
        # fp32 DFT matmul vs float64 FFT: tiny absolute spectrum errors blow
        # up in log space only near the clip floor; gate on linear-domain
        # closeness + a loose log-domain max (the torch reference is fp32 too)
        np.testing.assert_allclose(
            np.exp(mel_b[i, :, :t]), np.exp(mel_ref), rtol=5e-3, atol=5e-4
        )
        assert np.abs(mel_b[i, :, :t] - mel_ref).mean() < 5e-3
        np.testing.assert_allclose(energy_b[i, :t], energy_ref, rtol=1e-3, atol=1e-3)


def test_hann_window_padding():
    w = hann_window_periodic(512, 1024)
    assert w.shape == (1024,)
    assert w[:256].sum() == 0 and w[768:].sum() == 0
    assert w[256 + 256] == pytest.approx(1.0)  # window center


def test_mel_full_jax_matches_energy_jax_full_rows():
    """The gather-free full-length path (vocoder GAN loss) must reproduce
    mel_energy_jax exactly when every row is full length, for both floors."""
    import jax.numpy as jnp

    from emotts.audio import mel_full_jax

    rng = np.random.default_rng(11)
    b, s = 3, 4000  # hop does NOT divide s: exercises the right-pad branch
    y = jnp.asarray(rng.standard_normal((b, s)).astype(np.float32) * 0.3)
    lengths = jnp.full((b,), s, jnp.int32)
    for floor in ("hard", "soft"):
        ref, _, _ = mel_energy_jax(y, lengths, CFG, floor=floor)
        got = mel_full_jax(y, CFG, floor=floor)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=0)

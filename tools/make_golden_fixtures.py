"""Generate reference-stack golden fixtures for parity tests.

THIS SCRIPT IS MEANT TO RUN IN AN ENVIRONMENT WITH THE REFERENCE STACK
INSTALLED (pyworld, speechbrain, torchaudio — the deps of
/root/reference/emo_rank_tts; see its requirements.txt).  The hermetic TPU
build environment has none of them, so the fixtures it produces are vendored
into ``tests/golden/`` and the corresponding tests skip when a fixture is
absent.

Fixtures produced (all over the same deterministic signals used by
tests/test_reference_golden.py):

* ``reference_f0.npz``    — pyworld DIO+StoneMask F0 tracks at the
  reference frame period (rank_model/audio_util.py:16-20) for 4 signals.
* ``reference_mel.npz``   — SpeechBrain ``mel_spectogram`` output with the
  reference config (rank_model/audio_util.py:24-42): log-mel + min-max
  energy.
* ``reference_ssim.npz``  — SpeechBrain ``SSIMLoss`` value on a fixed
  mel pair (fastspeech2/loss.py:45,155).
* ``reference_vocoder.npz`` — a short SpeechBrain
  ``tts-hifigan-libritts-16kHz`` decode of a fixed mel
  (fastspeech2/train.py:225), plus the generator state_dict slice needed to
  re-run it (for full wave parity through the converter).

Usage (reference environment):
    python tools/make_golden_fixtures.py --out tests/golden/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def signals(sr=16000):
    """Deterministic test signals shared with tests/test_reference_golden.py."""
    rng = np.random.default_rng(1234)
    t = np.arange(int(0.5 * sr)) / sr
    sigs = {
        "harmonic": (
            0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t)
        ).astype(np.float32),
        "chirp": np.sin(
            2 * np.pi * (120 + 80 * np.arange(len(t)) / len(t)) * t
        ).astype(np.float32),
        "noisy_voice": (
            0.4 * np.sin(2 * np.pi * 180 * t)
            + 0.05 * rng.standard_normal(len(t))
        ).astype(np.float32),
        "speech_like": (
            np.sin(2 * np.pi * (150 + 50 * np.sin(2 * np.pi * 3 * t)) * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
        ).astype(np.float32),
    }
    return sigs


def make_f0(out: Path, sr=16000, hop=256):
    import pyworld as pw

    frame_period = hop / sr * 1000.0
    arrays = {}
    for name, y in signals(sr).items():
        y64 = y.astype(np.float64)
        _f0, _t = pw.dio(y64, sr, frame_period=frame_period)
        f0 = pw.stonemask(y64, _f0, _t, sr)
        arrays[name] = f0.astype(np.float32)
    np.savez(out / "reference_f0.npz", **arrays)
    print(f"wrote {out / 'reference_f0.npz'}")


def make_mel(out: Path, sr=16000):
    import torch
    from speechbrain.lobes.models.FastSpeech2 import mel_spectogram

    arrays = {}
    for name, y in signals(sr).items():
        mel, energy = mel_spectogram(
            sample_rate=sr, hop_length=256, win_length=1024, n_fft=1024,
            n_mels=80, f_min=0.0, f_max=8000.0, power=1, normalized=False,
            min_max_energy_norm=True, norm="slaney", mel_scale="slaney",
            compression=True, audio=torch.from_numpy(y),
        )
        arrays[f"{name}_mel"] = mel.numpy()
        arrays[f"{name}_energy"] = energy.numpy()
    np.savez(out / "reference_mel.npz", **arrays)
    print(f"wrote {out / 'reference_mel.npz'}")


def make_ssim(out: Path):
    import torch
    from speechbrain.nnet.losses import ssim_loss  # or SSIMLoss lobe

    rng = np.random.default_rng(7)
    a = rng.standard_normal((2, 120, 80)).astype(np.float32)
    b = a + 0.1 * rng.standard_normal((2, 120, 80)).astype(np.float32)
    lens = torch.tensor([1.0, 0.75])
    val = ssim_loss(torch.from_numpy(a), torch.from_numpy(b), lens)
    np.savez(out / "reference_ssim.npz", a=a, b=b,
             lens=lens.numpy(), value=float(val))
    print(f"wrote {out / 'reference_ssim.npz'}")


def make_vocoder(out: Path):
    import torch
    from speechbrain.inference.vocoders import HIFIGAN

    hifi = HIFIGAN.from_hparams(source="speechbrain/tts-hifigan-libritts-16kHz")
    rng = np.random.default_rng(5)
    mel = (rng.standard_normal((1, 80, 64)) * 1.5 - 6.0).astype(np.float32)
    with torch.no_grad():
        wav = hifi.decode_batch(torch.from_numpy(mel))
    sd = {
        k: v.cpu().numpy()
        for k, v in hifi.infer.state_dict().items()
    }
    np.savez(out / "reference_vocoder.npz", mel=mel, wav=wav.numpy(), **{
        f"sd/{k}": v for k, v in sd.items()
    })
    print(f"wrote {out / 'reference_vocoder.npz'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for fn in (make_f0, make_mel, make_ssim, make_vocoder):
        try:
            fn(out)
        except Exception as e:  # partial environments still produce the rest
            print(f"SKIP {fn.__name__}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

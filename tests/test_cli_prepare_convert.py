"""Direct CLI tests for `prepare-corpus` and `convert-vocoder`.

Covers the two entry points the full-chain pipeline test skips
(reference behavior: rank_model/prepare_mfa.py:10-56 for corpus prep; the
SpeechBrain tts-hifigan checkpoint load at fastspeech2/train.py:225 for the
vocoder conversion).
"""

from pathlib import Path

import numpy as np
import pytest

from emotts.audio.wavio import load_wav, write_wav
from emotts.cli.main import main
from emotts.utils.config import Config, save_config


def _make_emovdb(root: Path, sr=22050):
    """Tiny EmoV-DB-shaped tree: cmuarctic.data + per-speaker emotion dirs."""
    data = root / "EmoV-DB"
    data.mkdir(parents=True)
    (data / "cmuarctic.data").write_text(
        '( arctic_a0001 "Author of the danger trail, Philip Steels, etc." )\n'
        '( arctic_a0002 "Not at this particular case, Tom, apologized Whittemore." )\n'
        '( arctic_b0001 "Dropped: b-set sentences are excluded." )\n'
        "garbage line without parens\n"
    )
    rng = np.random.default_rng(0)
    for speaker, emotions in (("bea", ["neutral", "amused"]), ("josh", ["neutral"])):
        for emotion in emotions:
            d = data / speaker / emotion
            d.mkdir(parents=True)
            for aid in ("0001", "0002", "0099"):  # 0099 has no transcript
                y = rng.standard_normal(sr // 4).astype(np.float32) * 0.1
                write_wav(str(d / f"{emotion}_{aid}.wav"), y, sr)
    return data


def test_prepare_corpus_cli(tmp_path):
    data = _make_emovdb(tmp_path)
    cfg = Config()
    cfg.data.data_path = str(data)
    cfg.data.corpus_path = str(tmp_path / "corpus")
    cfg.data.speakers = ["bea", "josh", "sam"]  # sam absent on disk → skipped
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, str(cfg_path))

    assert main(["prepare-corpus", "--config", str(cfg_path)]) == 0

    # bea: 2 emotions × 2 transcribed ids; josh: 1 × 2 (0099 dropped: no lab)
    labs = sorted(Path(cfg.data.corpus_path).glob("*/*.lab"))
    wavs = sorted(Path(cfg.data.corpus_path).glob("*/*.wav"))
    assert len(labs) == len(wavs) == 6
    assert (Path(cfg.data.corpus_path) / "bea" / "amused_0001.lab").exists()
    assert not list(Path(cfg.data.corpus_path).glob("*/*0099*"))
    assert not (Path(cfg.data.corpus_path) / "sam").exists()

    # transcript: cleaned + noise sentinel, b-set excluded
    lab = (Path(cfg.data.corpus_path) / "bea" / "neutral_0001.lab").read_text()
    assert lab.startswith("[noise]") and lab.rstrip().endswith("[noise]")
    assert "author of the danger trail" in lab
    # resampled to the configured rate
    y = load_wav(
        str(Path(cfg.data.corpus_path) / "bea" / "neutral_0001.wav"),
        cfg.audio.sampling_rate,
    )
    assert abs(len(y) - cfg.audio.sampling_rate // 4) < 16

    # skip-if-exists guard (reference prepare_mfa.py:76-82)
    from emotts.cli.prepare_corpus import prepare_corpus

    assert prepare_corpus(cfg, verbose=False) == 0


def test_convert_vocoder_cli(tmp_path):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from emotts.nn.hifigan import HiFiGANGenerator

    # tiny weight-normed torch HiFi-GAN generator state_dict
    rates, kus, ch0, n_mels = (2, 2), (4, 4), 32, 8
    rng = np.random.default_rng(0)

    def wn(out_ch, in_ch, k):
        v = rng.standard_normal((out_ch, in_ch, k)).astype(np.float32) * 0.3
        g = np.abs(rng.standard_normal((out_ch, 1, 1)).astype(np.float32)) + 0.5
        return g, v

    sd = {}

    def add(name, out_ch, in_ch, k, transpose=False):
        shape = (in_ch, out_ch, k) if transpose else (out_ch, in_ch, k)
        v = rng.standard_normal(shape).astype(np.float32) * 0.3
        g = np.abs(
            rng.standard_normal((shape[0], 1, 1)).astype(np.float32)
        ) + 0.5
        sd[f"{name}.weight_g"] = torch.tensor(g)
        sd[f"{name}.weight_v"] = torch.tensor(v)
        sd[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(out_ch).astype(np.float32) * 0.01
        )

    add("conv_pre", ch0, n_mels, 7)
    ch = ch0
    for i, (u, ku) in enumerate(zip(rates, kus)):
        add(f"ups.{i}", ch // 2, ch, ku, transpose=True)
        for j, k in enumerate((3, 7, 11)):
            m = i * 3 + j
            for d in range(3):
                add(f"resblocks.{m}.convs1.{d}", ch // 2, ch // 2, k)
                add(f"resblocks.{m}.convs2.{d}", ch // 2, ch // 2, k)
        ch //= 2
    add("conv_post", 1, ch, 7)

    ckpt = tmp_path / "generator.pth"
    torch.save(sd, str(ckpt))

    out_npz = tmp_path / "vocoder.npz"
    cfg_path = tmp_path / "cfg.yaml"
    save_config(Config(), str(cfg_path))
    rc = main(
        [
            "convert-vocoder",
            "--config", str(cfg_path),
            "--checkpoint", str(ckpt),
            "--output", str(out_npz),
        ]
    )
    assert rc == 0 and out_npz.exists()

    # the saved npz round-trips into a runnable generator
    from emotts.infer.synthesize import load_vocoder_checkpoint

    variables = load_vocoder_checkpoint(str(out_npz), Config())
    gen = HiFiGANGenerator(
        in_channels=n_mels,
        upsample_initial_channel=ch0,
        upsample_rates=rates,
        upsample_kernel_sizes=kus,
    )
    mel = jnp.asarray(rng.standard_normal((1, 16, n_mels)).astype(np.float32))
    wav = gen.apply(jax.tree_util.tree_map(jnp.asarray, variables), mel)
    assert wav.shape == (1, 16 * 4)
    assert np.all(np.isfinite(np.asarray(wav)))

    # and matches the direct torch→flax conversion exactly
    direct = load_vocoder_checkpoint(str(ckpt), Config())
    wav2 = gen.apply(jax.tree_util.tree_map(jnp.asarray, direct), mel)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)


def test_convert_vocoder_cli_missing_args(tmp_path):
    cfg_path = tmp_path / "cfg.yaml"
    save_config(Config(), str(cfg_path))
    assert main(["convert-vocoder", "--config", str(cfg_path)]) == 2


def test_preprocess_cli_device_mel(tmp_path):
    """data.device_mel=true routes the CLI preprocess through the batched
    device mel path and produces the same artifact contract."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from synthetic_corpus import make_corpus

    cfg = make_corpus(str(tmp_path), utts_per_emotion=3)
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, str(cfg_path))
    rc = main(["preprocess", "--config", str(cfg_path), "data.device_mel=true"])
    assert rc == 0
    npzs = sorted(Path(cfg.data.preprocessed_path).glob("*/*.npz"))
    assert npzs
    d = np.load(npzs[0], allow_pickle=True)
    assert d["mel"].shape[0] == cfg.audio.n_mels
    assert len(d["energy"]) == d["mel"].shape[1] == len(d["pitch"])

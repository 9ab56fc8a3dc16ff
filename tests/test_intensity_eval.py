"""Intensity-control efficacy evaluation (emotts/eval/intensity_eval.py).

The reference demonstrates — but never measures — that bucketized intensity
control works (assets/intensities.png, readme.md:102-125).  These tests pin
the measuring instrument itself: metric correctness on constructed scores,
and the full synthesize → re-extract → frozen-rank-score loop over a trained
tiny pipeline on the synthetic corpus (both the vocoded-audio and the
mel-only feature paths).
"""

import json
import os
import sys

import numpy as np
import pytest

from emotts.eval.intensity_eval import IntensityEfficacyEvaluator
from emotts.utils.config import Config

sys.path.insert(0, os.path.dirname(__file__))


def _bare_evaluator(cfg) -> IntensityEfficacyEvaluator:
    """Metrics-only instance: no synthesizer/rank model needed."""
    ev = object.__new__(IntensityEfficacyEvaluator)
    ev.cfg = cfg
    return ev


def _rows(specs):
    """specs: (text_i, spk, emo, level, score) tuples → row dicts."""
    return [
        dict(text_i=t, spk=s, emo=e, level=float(lv), score=float(sc))
        for t, s, e, lv, sc in specs
    ]


def test_metrics_perfectly_monotone():
    cfg = Config()
    cfg.data.speakers = ["a", "b"]
    cfg.data.emotions = ["neutral", "amused"]
    ev = _bare_evaluator(cfg)
    rows = _rows(
        [
            (0, 0, 1, 0, 0.1), (0, 0, 1, 1, 0.5), (0, 0, 1, 2, 0.9),
            (0, 1, 1, 0, -1.0), (0, 1, 1, 1, 0.0), (0, 1, 1, 2, 2.0),
            (0, 0, 0, 0, 0.0),  # neutral — must be ignored by monotonicity
        ]
    )
    pooled = np.zeros((len(rows), 2), np.float32)
    rep = ev._metrics(rows, pooled, levels=[0.0, 1.0, 2.0])
    assert rep["n_level_cells"] == 2
    assert rep["monotonic_fraction_strict"] == 1.0
    assert rep["pairwise_order_accuracy"] == 1.0
    assert rep["monotonic_fraction_cell_mean"] == 1.0
    assert rep["by_cell"]["a/amused"]["monotone_strict"] is True


def test_metrics_partial_and_pairwise():
    cfg = Config()
    cfg.data.speakers = ["a"]
    cfg.data.emotions = ["neutral", "amused", "angry"]
    ev = _bare_evaluator(cfg)
    # amused: monotone; angry: level-1 dips below level-0 (one bad pair of 3)
    rows = _rows(
        [
            (0, 0, 1, 0, 0.0), (0, 0, 1, 1, 1.0), (0, 0, 1, 2, 2.0),
            (0, 0, 2, 0, 0.5), (0, 0, 2, 1, 0.2), (0, 0, 2, 2, 0.9),
        ]
    )
    pooled = np.zeros((len(rows), 3), np.float32)
    rep = ev._metrics(rows, pooled, levels=[0.0, 1.0, 2.0])
    assert rep["monotonic_fraction_strict"] == pytest.approx(0.5)
    assert rep["pairwise_order_accuracy"] == pytest.approx(5 / 6)
    assert rep["by_cell"]["a/angry"]["monotone_strict"] is False
    # bootstrap CIs over cells: well-formed, bracket the point estimates
    lo, hi = rep["monotonic_fraction_strict_ci95"]
    assert 0.0 <= lo <= rep["monotonic_fraction_strict"] <= hi <= 1.0
    lo, hi = rep["pairwise_order_accuracy_ci95"]
    assert 0.0 <= lo <= rep["pairwise_order_accuracy"] <= hi <= 1.0


def test_metrics_cell_mean_across_texts():
    """Per-(spk,emo) means across texts can be monotone even when single
    texts are not — the cell-mean metric must average before ordering."""
    cfg = Config()
    cfg.data.speakers = ["a"]
    cfg.data.emotions = ["neutral", "amused"]
    ev = _bare_evaluator(cfg)
    rows = _rows(
        [
            # text 0 inverted, text 1 strongly monotone
            (0, 0, 1, 0, 0.6), (0, 0, 1, 1, 0.5),
            (1, 0, 1, 0, 0.0), (1, 0, 1, 1, 2.0),
        ]
    )
    pooled = np.zeros((len(rows), 2), np.float32)
    rep = ev._metrics(rows, pooled, levels=[0.0, 1.0])
    assert rep["monotonic_fraction_strict"] == pytest.approx(0.5)
    # means: level0 = 0.3, level1 = 1.25 → monotone
    assert rep["monotonic_fraction_cell_mean"] == 1.0


def test_intensity_eval_end_to_end(tmp_path):
    """Train the tiny pipeline (rank → bucketize → FS2), then run the
    intensity-efficacy eval through BOTH feature paths and the CLI."""
    from synthetic_corpus import make_corpus

    import jax
    import jax.numpy as jnp

    from emotts.cli.main import main
    from emotts.eval.intensity_eval import evaluate_intensity_efficacy
    from emotts.infer.synthesize import save_vocoder_params_npz
    from emotts.nn.hifigan import HiFiGANGenerator
    from emotts.utils.config import save_config

    cfg = make_corpus(str(tmp_path / "corpus"), utts_per_emotion=5)
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    f = cfg.fastspeech2
    f.enc_num_layers = f.dec_num_layers = 1
    f.enc_d_model = f.dec_d_model = 32
    f.enc_ffn_dim = f.dec_ffn_dim = 64
    f.postnet_embedding_dim = 32
    f.postnet_n_convolutions = 3
    f.max_mel_len = 128
    cfg.train_rank.batch_size = cfg.train_fs2.batch_size = 4
    cfg.train_rank.n_epochs = cfg.train_fs2.n_epochs = 1
    cfg.train_rank.compute_dtype = cfg.train_fs2.compute_dtype = "float32"
    cfg.mesh.data_parallel = 1
    cfg.inference.rank_exp = cfg.inference.fs2_exp = "exp_1"
    cfg.inference.text = "hello world"

    voc = HiFiGANGenerator(
        in_channels=cfg.audio.n_mels, upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    vp = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))
    voc_path = str(tmp_path / "voc.npz")
    save_vocoder_params_npz({"params": jax.device_get(vp)["params"]}, voc_path)
    cfg.inference.vocoder_checkpoint = voc_path
    cfg_path = str(tmp_path / "cfg.yaml")
    save_config(cfg, cfg_path)

    assert main(["preprocess", "--config", cfg_path]) == 0
    assert main(["fs2-splits", "--config", cfg_path]) == 0
    assert main(["train-rank", "--config", cfg_path]) == 0
    assert main(["bucketize", "--config", cfg_path]) == 0
    assert main(["train-fs2", "--config", cfg_path]) == 0

    # CLI → vocoded-audio feature path
    assert main(["eval-intensity", "--config", cfg_path]) == 0
    rep_path = os.path.join(
        cfg.data.experiment_path, "fastspeech2", "exp_1",
        "intensity_eval.json",
    )
    assert os.path.exists(rep_path)
    rep = json.load(open(rep_path))
    assert rep["feature_path"] == "vocoded_audio"
    n_emo_cells = len(cfg.data.speakers) * (len(cfg.data.emotions) - 1)
    assert rep["n_level_cells"] == n_emo_cells
    assert rep["n_synthesized"] == n_emo_cells * 3 + len(cfg.data.speakers)
    assert 0.0 <= rep["monotonic_fraction_strict"] <= 1.0
    assert 0.0 <= rep["pairwise_order_accuracy"] <= 1.0
    # silhouette over ≥2 emotion classes on >n_classes samples must compute
    assert rep["emotion_silhouette_h"] is not None
    assert -1.0 <= rep["emotion_silhouette_h"] <= 1.0
    assert len(rep["by_cell"]) == n_emo_cells

    # mel-only fallback path (no vocoder): pitch/energy channels zeroed
    cfg.inference.vocoder_checkpoint = ""
    rep2 = evaluate_intensity_efficacy(
        cfg, texts=["hello world"],
        out_path=str(tmp_path / "mel_only.json"),
    )
    assert rep2["feature_path"] == "mel_only(pitch/energy zeroed)"
    assert rep2["n_level_cells"] == n_emo_cells
    assert 0.0 <= rep2["pairwise_order_accuracy"] <= 1.0


def test_conditioning_contrast_amplification():
    """contrast=c maps p_lv -> mean + c*(p_lv - mean); c=1 is the bank."""

    class _FakeSynth:
        def __init__(self, bank):
            self.intensity_bank = bank

        def _proto(self, s, e, lv):
            return self.intensity_bank[s, e, int(lv)]

        def intensity_for(self, s, e, lv, n):
            if e == 0:
                return np.zeros((n, self.intensity_bank.shape[-1]), np.float32)
            return np.broadcast_to(
                self._proto(s, e, lv), (n, self.intensity_bank.shape[-1])
            ).astype(np.float32)

    rng = np.random.default_rng(3)
    bank = rng.normal(size=(1, 2, 3, 5)).astype(np.float32)
    cfg = Config()
    ev = _bare_evaluator(cfg)
    ev.synth = _FakeSynth(bank)

    base = ev._conditioning(0, 1, 2.0, 4, contrast=1.0)
    assert np.allclose(base, bank[0, 1, 2])
    amp = ev._conditioning(0, 1, 2.0, 4, contrast=5.0)
    m = bank[0, 1].mean(0)
    assert np.allclose(amp[0], m + 5.0 * (bank[0, 1, 2] - m), atol=1e-6)
    # amplification preserves the per-cell level mean and scales spreads 5x
    rows = np.stack([ev._conditioning(0, 1, float(l), 1, 5.0)[0]
                     for l in range(3)])
    assert np.allclose(rows.mean(0), m, atol=1e-6)
    assert np.allclose(rows - m, 5.0 * (bank[0, 1] - m), atol=1e-5)
    # neutral stays zeros at any contrast
    assert not ev._conditioning(0, 0, 1.0, 3, contrast=5.0).any()


def test_plot_intensity_sweep(tmp_path):
    """The sweep figure renders from a report dict (and from its JSON
    round-trip) — the committed counterpart of the reference's
    assets/intensities.png result artifact."""
    import json

    from emotts.utils.plotting import plot_intensity_sweep

    report = {
        "levels": [0.0, 1.0, 2.0],
        "verdict": "measured",
        "pairwise_order_accuracy": 0.917,
        "by_cell": {
            "spk_a/amused": {"score_mean_per_level": [0.1, 0.5, 0.9],
                             "monotone_strict": True},
            "spk_a/angry": {"score_mean_per_level": [-0.2, 0.4, 0.1],
                            "monotone_strict": False},
            "spk_b/amused": {"score_mean_per_level": [-1.0, 0.0, 2.0],
                             "monotone_strict": True},
        },
    }
    out = tmp_path / "sweep.png"
    plot_intensity_sweep(report, str(out))
    assert out.stat().st_size > 1000
    # JSON round-trip (the saved eval report) renders identically
    rt = json.loads(json.dumps(report))
    out2 = tmp_path / "sweep2.png"
    plot_intensity_sweep(rt, str(out2))
    assert out2.stat().st_size > 1000


def test_plot_intensity_sweep_degenerate_reports(tmp_path):
    """Ragged cells (a combo whose synthesis produced zero frames at some
    level drops that level's score), emotions absent from the first
    speaker, and an empty by_cell must all render without crashing — in
    the campaign this plot runs AFTER the expensive final eval and before
    the summary write, so a crash here loses the whole run's summary."""
    from emotts.utils.plotting import plot_intensity_sweep

    ragged = {
        "levels": [0.0, 1.0, 2.0],
        "verdict": "measured",
        "pairwise_order_accuracy": 0.5,
        "by_cell": {
            # 2 of 3 levels survived synthesis
            "spk_a/amused": {"score_mean_per_level": [0.1, 0.5],
                             "monotone_strict": True},
            # emotion present ONLY for the second speaker: must still
            # appear in the legend
            "spk_b/angry": {"score_mean_per_level": [0.0, 0.2, 0.4],
                            "monotone_strict": True},
        },
    }
    out = tmp_path / "ragged.png"
    plot_intensity_sweep(ragged, str(out))
    assert out.stat().st_size > 1000

    empty = {"levels": [0.0], "verdict": "no-intensity-axis", "by_cell": {}}
    out2 = tmp_path / "empty.png"
    plot_intensity_sweep(empty, str(out2))
    assert out2.exists()

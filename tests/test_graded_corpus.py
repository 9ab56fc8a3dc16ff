"""The graded-emotion synthetic corpus carries a measurable intensity axis.

The round-3 campaign discovered the flat synthetic corpus has *no* intensity
gradient (bucket prototypes collapse, ordering metrics sit at chance by
construction), which is why make_corpus grew graded emotion-strength
signatures (tests/synthetic_corpus.py::_SIGNATURES).  These tests pin that
fix: the recorded ground-truth strengths, the uniform gain treatment, and —
end to end — that a rank model trained on the graded corpus actually learns
the axis (its λ≡1 scores correlate with the true strengths and the
bucketizer's level prototypes spread above the report's gating floor),
while the flat corpus is flagged "no-intensity-axis" by the same gate.
"""

import json
import os
import sys

import numpy as np

from emotts.data import build_rank_pair_lists, preprocess_all
from emotts.eval.intensity_eval import (
    PROTOTYPE_SPREAD_FLOOR,
    prototype_spread,
    rank_strength_correlation,
    spread_verdict,
)
from emotts.train.checkpoint import load_best_params
from emotts.train.rank_trainer import (
    RankTrainer,
    build_rank_model,
    init_rank_params,
)

sys.path.insert(0, os.path.dirname(__file__))

from synthetic_corpus import make_corpus  # noqa: E402


def test_strengths_recorded_and_uniform_peak(tmp_path):
    cfg = make_corpus(
        str(tmp_path / "c"),
        speakers=("spk_a",),
        emotions=("neutral", "amused"),
        utts_per_emotion=6,
        graded_emotions=True,
    )
    strengths = json.loads((tmp_path / "c" / "strengths.json").read_text())
    # one entry per non-neutral utterance, strengths in the sampled range
    assert len(strengths) == 6
    assert all(k.startswith("spk_a/amused_") for k in strengths)
    assert all(0.15 <= s <= 1.0 for s in strengths.values())
    # uniform gain treatment: EVERY graded wav is normalized to the same
    # peak, so there is no s-dependent kink near a renormalization threshold
    from emotts.audio.wavio import read_wav

    peaks = []
    for k in strengths:
        spk, stem = k.split("/")
        wav, sr = read_wav(str(tmp_path / "c" / "corpus" / spk / (stem + ".wav")))
        peaks.append(float(np.abs(wav).max()))
    assert max(peaks) - min(peaks) < 1e-3
    assert abs(peaks[0] - 0.9) < 1e-3
    # flat corpora record nothing
    make_corpus(str(tmp_path / "flat"), utts_per_emotion=2)
    assert not (tmp_path / "flat" / "strengths.json").exists()


def _tiny_rank(cfg, steps: int, lr: float = 3e-4):
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    cfg.train_rank.batch_size = 8
    cfg.train_rank.compute_dtype = "float32"
    cfg.train_rank.learning_rate = lr
    cfg.train_rank.max_iterations = steps
    cfg.train_rank.n_epochs = 10 ** 6
    cfg.train_rank.patience = 10 ** 6
    cfg.train_rank.validate_every_epochs = 5
    cfg.train_rank.artifact_every_epochs = 10 ** 6
    cfg.mesh.data_parallel = 1


def test_graded_corpus_gives_rank_model_an_intensity_axis(tmp_path):
    """make_corpus(graded_emotions=True) → preprocess → short rank training
    yields (a) λ≡1 scores that correlate with the ground-truth strengths and
    (b) bucketized level prototypes whose spread clears the gating floor AND
    the random-bucketing null — i.e. the campaign's default corpus can
    support a real intensity measurement."""
    from emotts.infer.bucketize import (
        compute_intensity_prototypes as _cip,
        spread_significance,
    )

    cfg = make_corpus(
        str(tmp_path / "c"),
        speakers=("spk_a", "spk_b"),
        emotions=("neutral", "amused", "angry"),
        utts_per_emotion=12,
        graded_emotions=True,
    )
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    _tiny_rank(cfg, steps=250)
    trainer = RankTrainer(cfg)
    exp = trainer.fit(verbose=False)
    template = init_rank_params(cfg, build_rank_model(cfg), 0)
    params = load_best_params(exp, {"params": template["params"]})
    protos, storage = _cip(cfg, params, return_storage=True)

    strengths = json.loads((tmp_path / "c" / "strengths.json").read_text())
    rep = rank_strength_correlation(cfg, params, strengths)
    # train split: 12 - 2 held out = 10 per (speaker, emotion≠neutral) cell
    assert rep["n_utts"] == 2 * 2 * 10
    assert len(rep["by_cell"]) == 4
    assert rep["mean_spearman"] is not None
    assert rep["mean_spearman"] > 0.25, rep

    spread = prototype_spread(protos)
    assert spread is not None
    assert spread["mean_pairwise_over_norm"] >= PROTOTYPE_SPREAD_FLOOR, spread
    sig = spread_significance(
        storage, cfg.n_speakers, cfg.n_emotions, cfg.inference.bucket_size
    )
    assert sig["observed"] > sig["null_p95"], sig
    verdict, note = spread_verdict(spread, sig)
    assert verdict == "measured" and note is None


def test_bucketize_writes_significance_sidecar(tmp_path):
    """`bucketize` persists intensity_meta.json; the efficacy eval's verdict
    gate consumes it (evaluate_intensity_efficacy wiring)."""
    from emotts.infer.bucketize import bucketize

    cfg = make_corpus(
        str(tmp_path / "c"),
        speakers=("spk_a",),
        emotions=("neutral", "amused"),
        utts_per_emotion=6,
        graded_emotions=True,
    )
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    _tiny_rank(cfg, steps=10)
    trainer = RankTrainer(cfg)
    exp = trainer.fit(verbose=False)
    cfg.inference.rank_exp = os.path.basename(exp)
    out = bucketize(cfg, exp_path=exp)
    assert os.path.exists(out)
    meta_path = os.path.join(os.path.dirname(out), "intensity_meta.json")
    meta = json.loads(open(meta_path).read())
    assert set(meta) >= {"observed", "null_mean", "null_p95", "n_perm"}


def test_spread_verdict_edge_cases():
    # no bank / sub-floor spread → gated
    assert spread_verdict(None)[0] == "no-intensity-axis"
    low = {"mean_pairwise_over_norm": 0.01, "min": 0.0, "max": 0.02}
    verdict, note = spread_verdict(low)
    assert verdict == "no-intensity-axis"
    assert "no usable intensity axis" in note
    # at/above floor with no sidecar → measured
    ok = {"mean_pairwise_over_norm": PROTOTYPE_SPREAD_FLOOR, "min": 0.0,
          "max": 1.0}
    assert spread_verdict(ok) == ("measured", None)
    # above floor but NOT above the random-bucketing null → gated
    sig_bad = {"observed": 0.2, "null_p95": 0.25, "null_mean": 0.2}
    verdict, note = spread_verdict(
        {"mean_pairwise_over_norm": 0.2, "min": 0.1, "max": 0.3}, sig_bad
    )
    assert verdict == "no-intensity-axis"
    assert "random-bucketing null" in note
    # above both → measured
    sig_ok = {"observed": 0.2, "null_p95": 0.1, "null_mean": 0.08}
    assert spread_verdict(
        {"mean_pairwise_over_norm": 0.2, "min": 0.1, "max": 0.3}, sig_ok
    ) == ("measured", None)
    # single-level banks produce no pairwise distances → None, not NaN
    bank = np.ones((2, 3, 1, 5), np.float32)
    assert prototype_spread(bank) is None

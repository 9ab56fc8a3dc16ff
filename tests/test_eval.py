"""Objective evaluation tests (emotts/eval/): metric correctness on
constructed inputs, and the Evaluator + evaluate CLI over a trained tiny
pipeline on the synthetic corpus."""

import json
import os

import numpy as np
import pytest

from emotts.eval.metrics import (
    dtw_path,
    duration_metrics,
    f0_metrics,
    mcd,
    mcd_dtw,
    mel_cepstra,
)


def test_mcd_identity_is_zero():
    mel = np.random.default_rng(0).standard_normal((50, 80))
    c = mel_cepstra(mel)
    assert c.shape == (50, 13)
    assert mcd(c, c) == 0.0
    # a+b−2ab distance formulation leaves ~1e-8 float residue on the diagonal
    assert mcd_dtw(mel, mel) < 1e-5


def test_mcd_positive_and_scales():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((40, 80))
    b1 = a + 0.1 * rng.standard_normal((40, 80))
    b2 = a + 1.0 * rng.standard_normal((40, 80))
    m1 = mcd(mel_cepstra(a), mel_cepstra(b1))
    m2 = mcd(mel_cepstra(a), mel_cepstra(b2))
    assert 0 < m1 < m2


def test_dtw_aligns_time_stretch():
    """A 2× time-stretched copy must align to near-zero DTW-MCD while the
    frame-aligned comparison of the truncated pair is large."""
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((30, 20)).cumsum(axis=0)  # smooth-ish track
    stretched = np.repeat(mel, 2, axis=0)  # (60, 20)
    assert mcd_dtw(mel, stretched) < 1e-4
    assert mcd(mel_cepstra(mel), mel_cepstra(stretched[:30])) > 1.0


def test_dtw_path_monotonic():
    cost = np.random.default_rng(3).random((7, 11))
    pi, pj = dtw_path(cost)
    assert pi[0] == 0 and pj[0] == 0
    assert pi[-1] == 6 and pj[-1] == 10
    assert (np.diff(pi) >= 0).all() and (np.diff(pj) >= 0).all()
    assert ((np.diff(pi) + np.diff(pj)) >= 1).all()


def test_dtw_native_and_numpy_identical():
    """The C++ DTW (native/dtw.cc) and the anti-diagonal numpy sweep must
    produce byte-identical paths (same accumulation + argmin-tie backtrack
    semantics as the original per-cell dynamic program)."""
    from emotts.audio import native
    from emotts.eval.metrics import _dtw_accumulate, _dtw_backtrack

    rng = np.random.default_rng(7)
    for t1, t2 in [(1, 1), (5, 1), (1, 5), (37, 53), (211, 187)]:
        cost = rng.random((t1, t2))
        acc = _dtw_accumulate(cost)
        pi_np, pj_np = _dtw_backtrack(acc, t1, t2)
        assert pi_np[0] == 0 and pj_np[0] == 0
        assert pi_np[-1] == t1 - 1 and pj_np[-1] == t2 - 1
        if native.have_native_dtw():
            pi_n, pj_n = native.dtw_path_native(cost)
            assert np.array_equal(pi_np, pi_n)
            assert np.array_equal(pj_np, pj_n)


def test_f0_metrics():
    ref = np.array([0, 100, 110, 120, 0, 0, 130], float)
    syn = np.array([0, 102, 110, 118, 0, 140, 130], float)
    rmse, vuv = f0_metrics(ref, syn)
    assert vuv == pytest.approx(1 / 7)
    assert rmse == pytest.approx(np.sqrt((4 + 0 + 4 + 0) / 4))
    # different lengths: compared on the overlap
    rmse2, _ = f0_metrics(ref, syn[:4])
    assert rmse2 == pytest.approx(np.sqrt((4 + 0 + 4) / 3))


def test_duration_metrics_roundtrip():
    dur = np.array([3, 1, 4, 2, 0, 0], np.float32)
    valid = np.array([1, 1, 1, 1, 0, 0], np.float32)
    exact_log = np.log1p(dur)
    mae, rel = duration_metrics(dur, exact_log, valid)
    assert mae == 0.0 and rel == 0.0
    off = exact_log + np.log(2.0)  # roughly doubles each duration
    mae2, rel2 = duration_metrics(dur, off, valid)
    assert mae2 > 0 and rel2 > 0.5


def test_bootstrap_ci():
    """95% bootstrap CI of the mean: brackets the sample mean, narrows
    with n, and skips metrics with <2 samples."""
    from emotts.eval.evaluate import aggregate, bootstrap_ci

    rng = np.random.default_rng(0)
    small = [{"speaker": "a", "emotion": "x", "m": float(v)}
             for v in rng.normal(5.0, 1.0, 20)]
    big = [{"speaker": "a", "emotion": "x", "m": float(v)}
           for v in rng.normal(5.0, 1.0, 500)]
    ci_small = bootstrap_ci(small)["m"]
    ci_big = bootstrap_ci(big)["m"]
    for rows, ci in ((small, ci_small), (big, ci_big)):
        mean = np.mean([r["m"] for r in rows])
        assert ci[0] < mean < ci[1]
    assert (ci_big[1] - ci_big[0]) < (ci_small[1] - ci_small[0])
    # deterministic given the seed
    assert bootstrap_ci(small) == bootstrap_ci(small)
    # single-sample metrics are omitted; report carries the CI block
    rows = [{"speaker": "a", "emotion": "x", "m": 1.0, "rare": 2.0},
            {"speaker": "a", "emotion": "x", "m": 3.0}]
    report = aggregate(rows)
    assert "m" in report["overall_ci95"]
    assert "rare" not in report["overall_ci95"]


def test_evaluator_end_to_end(tmp_path):
    """Train the tiny pipeline on the synthetic corpus, then evaluate:
    teacher-forced MCD finite, free-running DTW-MCD present, eval.json
    written, and the CLI prints the report."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_corpus import make_corpus

    from emotts.cli.main import main
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
    cfg_path = str(tmp_path / "cfg.yaml")

    # tiny vocoder npz so the F0-through-vocoder metrics activate
    import jax
    import jax.numpy as jnp

    from emotts.infer.synthesize import save_vocoder_params_npz
    from emotts.nn.hifigan import HiFiGANGenerator

    voc = HiFiGANGenerator(
        in_channels=cfg.audio.n_mels, upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    vp = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.audio.n_mels)))
    voc_path = str(tmp_path / "voc.npz")
    save_vocoder_params_npz({"params": jax.device_get(vp)["params"]}, voc_path)
    cfg.inference.vocoder_checkpoint = voc_path
    save_config(cfg, cfg_path)

    assert main(["preprocess", "--config", cfg_path]) == 0
    assert main(["fs2-splits", "--config", cfg_path]) == 0
    assert main(["train-rank", "--config", cfg_path]) == 0
    assert main(["train-fs2", "--config", cfg_path]) == 0
    assert main(["evaluate", "--config", cfg_path]) == 0

    eval_path = os.path.join(
        cfg.data.experiment_path, "fastspeech2", "exp_1", "eval.json"
    )
    assert os.path.exists(eval_path)
    report = json.load(open(eval_path))
    assert report["n_utterances"] > 0
    overall = report["overall"]
    assert np.isfinite(overall["mcd_teacher_forced"])
    assert overall["mcd_teacher_forced"] > 0
    assert "mcd_dtw_free_running" in overall
    assert np.isfinite(overall["duration_mae_frames"])
    assert len(report["by_speaker_emotion"]) > 0
    # F0-through-vocoder metrics present and finite (random vocoder weights
    # give poor accuracy, but the chain must run end to end)
    assert "vuv_error_rate" in overall
    assert 0.0 <= overall["vuv_error_rate"] <= 1.0
    assert np.isfinite(overall.get("f0_rmse_hz", 0.0))

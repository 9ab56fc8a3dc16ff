"""Hermetic smoke test for the convergence campaign orchestration.

benchmarks/convergence_run.py is the script that produces the repo's
trained-quality evidence on the real chip; orchestration bugs that only
surface mid-campaign have already cost one on-chip run (the
VocoderTrainer.fit cumulative-target bug, BENCH_NOTES).  This test runs the
ENTIRE campaign — corpus → rank (+ strength correlation) → bucketize →
vocoder stages → FS2 stages with per-stage eval + THROUGH-VOCODER intensity
eval → per-vocoder-stage intensity evals → base final vocoded eval →
FS2-conditioned fine-tune leg(s) → FT final eval — in --tiny mode on CPU
and asserts the summary-JSON schema, so the plumbing can never again break
silently between on-chip runs.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_INT_KEYS = {
    "verdict", "prototype_spread", "monotonic_fraction_strict",
    "pairwise_order_accuracy", "monotonic_fraction_cell_mean",
    "emotion_silhouette_h", "feature_path",
}


def _env():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    return env


def test_tiny_campaign_end_to_end(tmp_path):
    root = tmp_path / "conv"
    # leave a stale partial behind to verify the final write cleans it up
    root.mkdir()
    (root / "convergence_summary.partial.json").write_text("{}")
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "benchmarks" / "convergence_run.py"),
            "--tiny",
            "--root", str(root),
            "--speakers", "2",
            "--utts-per-emotion", "4",
            "--rank-steps", "6",
            "--fs2-stages", "4,4",
            "--voc-stages", "4",
            "--eval-max-batches", "1",
            "--eval-f0-utts", "1",
            "--intensity-texts", "hello world",
            "--finetune-legs", "1",
            "--finetune-steps-per-leg", "2",
        ],
        cwd=str(REPO),
        env=_env(),
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    summary = json.loads((root / "convergence_summary.json").read_text())
    # provenance: graded emotions are the DEFAULT corpus mode
    assert summary["corpus"]["graded_emotions"] is True
    assert summary["corpus"]["speakers"] == 2

    # rank model evidence: validation-loss series (parity + informative)
    # + ground-truth strength correlation (the corpus is graded)
    assert len(summary["rank_valid_loss"]) >= 1
    assert len(summary["rank_pair_order_acc"]) >= 1
    assert len(summary["rank_valid_loss_informative"]) >= 1
    for row in summary["rank_pair_order_acc"]:
        assert 0.0 <= row["value"] <= 1.0
    corr = summary["rank_strength_spearman"]
    assert corr["n_utts"] == 2 * 4 * (4 - 2)  # spk × emo≠neutral × train
    assert corr["mean_spearman"] is None or -1 <= corr["mean_spearman"] <= 1

    # per-FS2-stage eval + THROUGH-VOCODER intensity series (round-4
    # verdict item 3: the vocoder now trains first so every FS2 stage is
    # measured through it)
    assert len(summary["stages"]) == 2
    for k, row in enumerate(summary["stages"]):
        assert row["stage"] == k
        assert row["fs2_steps_total"] == 4 * (k + 1)
        assert any("mcd" in key for key in row), sorted(row)
        intensity = row["intensity"]
        assert _INT_KEYS <= set(intensity)
        assert intensity["verdict"] in ("measured", "no-intensity-axis")
        assert intensity["feature_path"] == "vocoded_audio"

    # vocoder stage series: mel-L1 + its own through-vocoder intensity row
    assert len(summary["vocoder"]) == 1
    assert summary["vocoder"][0]["steps_total"] == 4
    assert summary["vocoder"][0]["intensity"]["feature_path"] == \
        "vocoded_audio"

    # base final vocoded eval and intensity eval
    assert "final_with_vocoder" in summary
    assert _INT_KEYS <= set(summary["final_intensity"])
    assert summary["final_intensity"]["feature_path"] == "vocoded_audio"

    # fine-tune saturation leg(s) + FT final (the production recipe)
    sat = summary["finetune_saturation"]
    assert sat["steps_per_leg"] == 2
    assert len(sat["legs"]) == 1
    leg = sat["legs"][0]
    assert leg["to_step"] == leg["from_step"] + 2
    assert _INT_KEYS <= set(leg["reduced_sweep"])
    assert sat["baseline_reduced"]["feature_path"] == "vocoded_audio"
    assert "final_with_vocoder_ft" in summary
    assert _INT_KEYS <= set(summary["final_intensity_ft"])
    assert summary["production_vocoder"].endswith("vocoder.npz")
    assert "walls_s" in summary

    # per-stage artifacts on disk; stale partial removed by the final write
    assert (root / "eval_stage0.json").exists()
    assert (root / "intensity_stage0.json").exists()
    assert (root / "intensity_voc_stage0.json").exists()
    assert (root / "intensity_final_vocoded.json").exists()
    assert (root / "intensity_ftleg1.json").exists()
    assert (root / "eval_final_ft.json").exists()
    assert (root / "intensity_final_ft.json").exists()
    assert (root / "intensity_final_ft.png").exists()
    assert not (root / "convergence_summary.partial.json").exists()

    # the intensity reports carry the spread-significance sidecar data
    rep = json.loads((root / "intensity_stage0.json").read_text())
    assert "prototype_spread_significance" in rep
    assert rep["prototype_spread_significance"] is not None


def test_resume_refuses_mismatched_corpus_flags(tmp_path):
    """--final-only/--contrast-ab regenerate the corpus from the CURRENT
    flags; a mismatch with the original campaign would silently evaluate
    the trained models against different features/stats.  The provenance
    guard must refuse before touching anything."""
    root = tmp_path / "conv"
    root.mkdir()
    (root / "campaign_args.json").write_text(json.dumps({
        "speakers": 2, "utts_per_emotion": 4,
        "graded_emotions": True, "tiny": True,
    }))
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "benchmarks" / "convergence_run.py"),
            "--tiny", "--root", str(root),
            "--speakers", "3", "--utts-per-emotion", "4",
            "--contrast-ab", "1",
        ],
        cwd=str(REPO), env=_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode != 0
    assert "do not match the original campaign" in (proc.stderr + proc.stdout)
    # nothing was regenerated under the root
    assert not (root / "corpus").exists()
    assert not (root / "preprocessed").exists()


def test_invalid_flag_combinations_fail_before_corpus(tmp_path):
    """Round-4 advisor finding: invalid flag combinations must fail BEFORE
    the (minutes-long, full-size) corpus+preprocess leg regenerates and
    rewrites features under a trained campaign."""
    root = tmp_path / "conv"
    for extra in (
        ["--final-only", "--contrast-ab", "1"],
        ["--voc-finetune-fs2", "-3"],
        ["--rank-ab", "2,4", "--final-only"],
        ["--finetune-legs", "-1"],
    ):
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "benchmarks" / "convergence_run.py"),
                "--tiny", "--root", str(root),
            ] + extra,
            cwd=str(REPO), env=_env(), capture_output=True, text=True,
            timeout=600,
        )
        assert proc.returncode != 0, extra
        # refused before any corpus work touched the root
        assert not (root / "corpus").exists(), extra
        assert not (root / "preprocessed").exists(), extra


def test_tiny_rank_ab(tmp_path):
    """--rank-ab trains the rank model alone at each step budget and
    records per-cell strength Spearman + spread significance per arm
    without touching the campaign's experiment tree."""
    root = tmp_path / "conv"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "benchmarks" / "convergence_run.py"),
            "--tiny", "--root", str(root),
            "--speakers", "2", "--utts-per-emotion", "4",
            "--rank-ab", "2,4",
        ],
        cwd=str(REPO), env=_env(), capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    ab = json.loads((root / "rank_ab.json").read_text())
    assert [a["steps"] for a in ab["arms"]] == [2, 4]
    for arm in ab["arms"]:
        assert arm["strength_spearman"]["n_utts"] == 2 * 4 * (4 - 2)
        assert (root / "rank_ab" / f"steps_{arm['steps']}"
                / "intensity.npy").exists()
        assert len(arm["rank_pair_order_acc"]) >= 1
    assert set(ab["per_emotion_spearman"]) == {"2", "4"}
    # the A/B must NOT pollute the campaign's own experiment numbering
    assert not (root / "experiments" / "rank_model").exists()


def test_tiny_campaign_final_only_resume(tmp_path):
    """--final-only reruns JUST the finalization from a completed root —
    the recovery path for a campaign that dies in the final leg (the
    round-4 on-chip run OOM'd exactly there, in the pre-chunking vocode)."""
    root = tmp_path / "conv"
    base_args = [
        sys.executable, str(REPO / "benchmarks" / "convergence_run.py"),
        "--tiny",
        "--root", str(root),
        "--speakers", "2",
        "--utts-per-emotion", "4",
        "--rank-steps", "4",
        "--fs2-stages", "4",
        "--voc-stages", "4",
        "--eval-max-batches", "1",
        "--eval-f0-utts", "1",
        "--intensity-texts", "hello world",
        "--finetune-legs", "1",
        "--finetune-steps-per-leg", "2",
    ]
    proc = subprocess.run(base_args, cwd=str(REPO), env=_env(),
                          capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    full = json.loads((root / "convergence_summary.json").read_text())

    # simulate the death-in-final-leg state: keep experiments + partial,
    # drop the final artifacts
    (root / "convergence_summary.json").unlink()
    (root / "intensity_final_vocoded.json").unlink()
    partial = dict(full)
    for key in ("final_with_vocoder", "final_with_vocoder_ci95",
                "final_intensity", "finetune_saturation",
                "final_with_vocoder_ft", "final_with_vocoder_ft_ci95",
                "final_intensity_ft", "production_vocoder", "walls_s"):
        partial.pop(key, None)
    (root / "convergence_summary.partial.json").write_text(
        json.dumps(partial))

    proc = subprocess.run(base_args + ["--final-only"], cwd=str(REPO),
                          env=_env(), capture_output=True, text=True,
                          timeout=2400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    resumed = json.loads((root / "convergence_summary.json").read_text())
    assert resumed["resumed_final_only"] is True
    # stage rows carried over from the partial; final leg re-measured
    assert resumed["stages"] == full["stages"]
    assert resumed["rank_valid_loss"] == full["rank_valid_loss"]
    assert _INT_KEYS <= set(resumed["final_intensity"])
    assert resumed["final_intensity"]["feature_path"] == "vocoded_audio"
    # the resumed finalization restarted its leg chain from the BASE
    # (exp_1) vocoder, not from the first run's fine-tune leg
    leg = resumed["finetune_saturation"]["legs"][0]
    assert leg["from_step"] == 4  # the GT stage's step counter
    assert _INT_KEYS <= set(resumed["final_intensity_ft"])
    assert (root / "intensity_final_vocoded.json").exists()
    assert (root / "intensity_final_vocoded.png").exists()
    assert not (root / "convergence_summary.partial.json").exists()

    # third leg: --contrast-ab reuses the same experiments (the LATEST
    # vocoder = the production fine-tuned one) and reruns only the vocoded
    # intensity eval at each conditioning contrast, now with the objective
    # quality axis (round-4 verdict item 5)
    proc = subprocess.run(
        base_args + ["--contrast-ab", "1,2", "--quality-max-batches", "1",
                     "--quality-f0-utts", "1"],
        cwd=str(REPO), env=_env(), capture_output=True,
        text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    ab = json.loads((root / "contrast_ab.json").read_text())
    assert set(ab["contrast"]) == {"1", "2"}
    for row in ab["contrast"].values():
        assert _INT_KEYS <= set(row)
        assert row["feature_path"] == "vocoded_audio"
        assert "quality" in row and "mcd_dtw_free_running" in row["quality"]
        assert row["quality_n_utterances"] >= 1
    assert (root / "intensity_contrast_2.json").exists()
    assert (root / "quality_contrast_2.json").exists()
    rep = json.loads((root / "intensity_contrast_2.json").read_text())
    assert rep["contrast"] == 2.0
    q = json.loads((root / "quality_contrast_2.json").read_text())
    assert q["conditioning"] == "prototype" and q["contrast"] == 2.0

    # fourth leg: --voc-finetune-fs2 resumes the vocoder, fine-tunes on
    # FS2-predicted mels, and re-measures the final vocoded metrics
    proc = subprocess.run(base_args + ["--voc-finetune-fs2", "2"],
                          cwd=str(REPO), env=_env(), capture_output=True,
                          text=True, timeout=2400)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    ft = json.loads((root / "finetune_fs2.json").read_text())
    assert ft["finetune_steps"] == 2
    assert ft["to_step"] == ft["from_step"] + 2
    assert ft["before"]["eval"] is not None  # straight-through run existed
    assert "mcd_teacher_forced" in ft["after"]["eval"]
    assert _INT_KEYS <= set(ft["after"]["intensity"])
    assert (root / "eval_final_ft.json").exists()
    assert (root / "intensity_final_ft.json").exists()

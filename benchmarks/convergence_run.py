"""Quality-convergence campaign on the real TPU.

Demonstrates that sustained FULL-SIZE training improves the framework's own
objective metrics (the reference's only "eval" is listening to the released
samples, readme.md:102-125; this repo has an Evaluator, so we use it):

  1. synthetic corpus (4 speakers x 5 emotions, held-out n>=150) ->
     preprocess/splits
  2. full-size rank model: >=1k steps (validation-loss series recorded)
  3. bucketize -> intensity.npy
  4. full-size FS2: trained in stages; after EVERY stage the Evaluator runs
     on the held-out split -> eval_stage{k}.json (MCD, DTW-MCD, duration
     MAE/acc series, each with bootstrap 95% CIs) AND the intensity-control
     efficacy eval (emotts/eval/intensity_eval.py) scores the synthesized
     (speaker x emotion x level) sweep with the frozen rank model ->
     monotonicity + emotion-silhouette series (the TITLE capability)
  5. full-size vocoder GAN (ground-truth condition): staged, mel-L1 series
  6. final evaluate WITH the self-trained vocoder (adds F0 metrics) + the
     intensity eval through real vocoded audio

Outputs land under --root; the per-stage eval series is also printed as a
summary table and written to <root>/convergence_summary.json for
BENCH_NOTES.

Run (default env, real TPU):
    python benchmarks/convergence_run.py --root /tmp/emotts_conv
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/emotts_conv")
    # 4 speakers x 5 emotions x 40 = 800 utterances -> 160 held out (the
    # round-2 campaign's n=36 left stage deltas inside eval noise)
    ap.add_argument("--speakers", type=int, default=4)
    ap.add_argument("--utts-per-emotion", type=int, default=40)
    ap.add_argument("--intensity-texts", default=(
        "The wind was rising steadily over the hills.|"
        "She answered the question without any hesitation.|"
        "Nobody expected the results to arrive so early."
    ), help="pipe-separated sentences for the intensity-efficacy sweep")
    ap.add_argument("--rank-steps", type=int, default=1000)
    # the reference's rank lr (1e-6, rank_model/parameter.yaml:45) is tuned
    # for its ~multi-100k-step EmoV-DB schedule; at a 1k-step budget the
    # model never leaves init (valid CE pinned at ln 2).  The campaign
    # scales lr to its budget — a benchmark-script choice, not a framework
    # default change.
    ap.add_argument("--rank-lr", type=float, default=1e-4)
    ap.add_argument("--fs2-stages", default="700,700,700")
    ap.add_argument("--voc-stages", default="1000,1000")
    ap.add_argument("--eval-f0-utts", type=int, default=16)
    ap.add_argument("--graded-emotions", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="give the synthetic corpus graded emotion-strength "
                    "signatures (tests/synthetic_corpus.py::_SIGNATURES) so "
                    "the rank model has a real intensity axis — the DEFAULT, "
                    "because without it the corpus carries no intensity "
                    "gradient and the ordering metrics sit at chance by "
                    "construction (--no-graded-emotions opts into that "
                    "degenerate mode explicitly)")
    ap.add_argument("--eval-max-batches", type=int, default=None,
                    help="cap the PER-STAGE Evaluator runs to this many "
                    "batches (deterministic head of the valid split, so the "
                    "stage series stays like-for-like); the FINAL eval "
                    "always uses the full held-out split")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink every model to smoke-test the campaign "
                    "plumbing on CPU (numbers are meaningless)")
    ap.add_argument("--contrast-ab", default=None, metavar="C,C,...",
                    help="reuse a completed campaign's experiments under "
                    "--root and rerun ONLY the through-vocoder intensity "
                    "eval at each conditioning-contrast value (prototypes "
                    "exaggerated as m + c*(p - m)); writes "
                    "intensity_contrast_<c>.json per value plus "
                    "contrast_ab.json — measures how much the continuous "
                    "intensity-scale lever widens the synthesized level "
                    "separation")
    ap.add_argument("--voc-finetune-fs2", type=int, default=0, metavar="N",
                    help="reuse a completed campaign's experiments under "
                    "--root, fine-tune its vocoder for N MORE GAN steps "
                    "conditioned on teacher-forced FS2-PREDICTED mels (the "
                    "HiFi-GAN paper's TTS recipe — closes the analysis-mel/"
                    "predicted-mel mismatch), then rerun the final vocoded "
                    "eval + intensity eval; writes eval_final_ft.json, "
                    "intensity_final_ft.json and finetune_fs2.json (before/"
                    "after comparison)")
    ap.add_argument("--final-only", action="store_true",
                    help="resume a campaign that died in the final leg: "
                    "reuse the trained rank/FS2/vocoder experiments and the "
                    "stage rows from <root>/convergence_summary.partial.json "
                    "and rerun ONLY the final vocoded eval + intensity "
                    "efficacy + summary write")
    args = ap.parse_args()

    from synthetic_corpus import make_corpus

    from emotts.data import (
        build_fs2_splits,
        build_rank_pair_lists,
        preprocess_all,
    )
    from emotts.eval.evaluate import Evaluator
    from emotts.infer.bucketize import bucketize
    from emotts.train.fs2_trainer import (
        FS2Trainer,
        extractor_params_from_rank,
    )
    from emotts.train.rank_trainer import RankTrainer
    from emotts.train.checkpoint import load_best_params
    from emotts.train.rank_trainer import build_rank_model, init_rank_params
    from emotts.train.vocoder_trainer import VocoderTrainer

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    walls = {}
    summary = {
        "corpus": {
            "speakers": args.speakers,
            "emotions": 5,  # overwritten from len(emotions) below
            "utts_per_emotion": args.utts_per_emotion,
            "graded_emotions": bool(args.graded_emotions),
        },
        "stages": [],
    }

    t0 = time.time()
    speakers = tuple(f"spk_{chr(97 + i)}" for i in range(args.speakers))
    emotions = ("neutral", "amused", "angry", "sleepy", "disgust")
    summary["corpus"]["emotions"] = len(emotions)
    # corpus provenance guard: resume modes (--final-only/--contrast-ab)
    # regenerate the corpus from the CURRENT flags, so a flag mismatch
    # would silently overwrite features/stats under the trained models and
    # evaluate them against a different corpus.  Refuse instead.
    corpus_flags = {
        "speakers": args.speakers,
        "utts_per_emotion": args.utts_per_emotion,
        "graded_emotions": bool(args.graded_emotions),
        "tiny": bool(args.tiny),
    }
    flags_path = root / "campaign_args.json"
    if ((args.final_only or args.contrast_ab or args.voc_finetune_fs2)
            and flags_path.exists()):
        recorded = json.loads(flags_path.read_text())
        if recorded != corpus_flags:
            raise SystemExit(
                f"resume flags {corpus_flags} do not match the original "
                f"campaign's {recorded} (from {flags_path}); rerun with "
                "the original corpus flags or use a fresh --root")
    cfg = make_corpus(
        str(root), speakers=speakers, emotions=emotions,
        utts_per_emotion=args.utts_per_emotion,
        graded_emotions=args.graded_emotions,
    )
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    build_fs2_splits(cfg)
    flags_path.write_text(json.dumps(corpus_flags, indent=2))
    walls["corpus+preprocess"] = time.time() - t0
    print(f"[conv] corpus ready ({walls['corpus+preprocess']:.0f}s)",
          flush=True)

    if args.tiny:
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
        cfg.mesh.data_parallel = 1  # smoke-test hosts force 8 CPU devices
        v = cfg.train_vocoder
        v.batch_size = 2
        v.segment_frames = 8
        v.upsample_initial_channel = 16
        v.resblock_kernel_sizes = [3]
        v.resblock_dilations = [[1, 3]]
        v.disc_channel_mult = 0.05
        v.mpd_periods = [2]
        v.msd_scales = 1
        v.compute_dtype = "float32"
        cfg.train_rank.compute_dtype = cfg.train_fs2.compute_dtype = "float32"

    # full-size models are the config defaults; disable early stopping so
    # step budgets are exact, keep the reference batch size
    cfg.train_rank.max_iterations = args.rank_steps
    cfg.train_rank.learning_rate = args.rank_lr
    cfg.train_rank.n_epochs = 10 ** 6
    cfg.train_rank.patience = 10 ** 6
    cfg.train_fs2.n_epochs = 10 ** 6
    cfg.train_fs2.patience = 10 ** 6
    # 800-utt corpus -> ~150 rank steps/epoch -> ~7 epochs in a 1k-step
    # budget; validate every epoch so the campaign records a proper
    # validation-loss SERIES (t-SNE artifacts stay on the sparse cadence)
    cfg.train_rank.validate_every_epochs = 1
    cfg.train_rank.artifact_every_epochs = 200
    cfg.train_fs2.validate_every_epochs = 5
    cfg.train_fs2.artifact_every_epochs = 20

    n_resume_modes = sum(bool(m) for m in (args.voc_finetune_fs2,
                                           args.contrast_ab,
                                           args.final_only))
    if n_resume_modes > 1:
        raise SystemExit("pass at most ONE of --voc-finetune-fs2 / "
                         "--contrast-ab / --final-only per invocation")
    if args.voc_finetune_fs2 < 0:
        raise SystemExit("--voc-finetune-fs2 must be a positive step count")

    if args.voc_finetune_fs2:
        rank_exp, fs2_exp, voc_exp, intensity_texts = _resume_setup(
            cfg, root, args)
        # before: the straight-through campaign's final numbers, and — for
        # chained fine-tune legs — the PREVIOUS leg's after (so each
        # report's before/after delta matches its own finetune_steps)
        before = {}
        prev = root / "convergence_summary.json"
        if prev.exists():
            s = json.loads(prev.read_text())
            before = {"eval": s.get("final_with_vocoder"),
                      "eval_ci95": s.get("final_with_vocoder_ci95"),
                      "intensity": s.get("final_intensity")}
        prev_leg = root / "finetune_fs2.json"
        previous_leg = (json.loads(prev_leg.read_text())["after"]
                        if prev_leg.exists() else None)
        cfg.train_vocoder.condition = "fs2"
        trainer = VocoderTrainer(cfg)
        t0 = time.time()
        if not trainer.restore(voc_exp):
            raise SystemExit(f"--voc-finetune-fs2: no vocoder checkpoint to "
                             f"fine-tune under {voc_exp}")
        start = int(np.asarray(trainer.gen_state.step))
        if start == 0:
            raise SystemExit(f"--voc-finetune-fs2: {voc_exp} restored at "
                             "step 0 — refusing to present a from-scratch "
                             "run as a fine-tune")
        target = start + args.voc_finetune_fs2
        # fine-tune into a FRESH experiment dir so the straight-through
        # campaign's vocoder (checkpoints + vocoder.npz) stays intact and
        # reproducible; later resume legs pick up the new dir as latest
        from emotts.utils.experiment import increment_path

        ft_exp = increment_path(str(root / "experiments" / "vocoder"))
        print(f"[conv] fs2-condition fine-tune: {voc_exp} step {start} -> "
              f"{target} (into {ft_exp})", flush=True)
        trainer.fit(exp_path=ft_exp, resume=False, n_steps=target)
        # fit() exports vocoder.npz into the exp dir at the end
        walls["voc_finetune_fs2"] = time.time() - t0

        from emotts.eval.evaluate import Evaluator
        from emotts.infer.synthesize import load_vocoder_checkpoint

        voc_npz = str(Path(ft_exp) / "vocoder.npz")
        voc_params = load_vocoder_checkpoint(voc_npz, cfg)
        t0 = time.time()
        ev = Evaluator(cfg, fs2_exp=fs2_exp, rank_exp=rank_exp,
                       vocoder_params=voc_params)
        report = ev.run(split="valid",
                        out_path=str(root / "eval_final_ft.json"),
                        f0_max_utts=args.eval_f0_utts)
        walls["eval_final_ft"] = time.time() - t0
        cfg.inference.vocoder_checkpoint = voc_npz
        after_int = _intensity_eval(cfg, root, walls, rank_exp,
                                    intensity_texts, fs2_exp, "final_ft")
        from emotts.utils.plotting import plot_intensity_sweep

        plot_intensity_sweep(
            json.loads((root / "intensity_final_ft.json").read_text()),
            str(root / "intensity_final_ft.png"),
        )
        out = {
            "finetune_steps": args.voc_finetune_fs2,
            "from_step": start, "to_step": target,
            "from_exp": str(voc_exp), "vocoder_exp": str(ft_exp),
            "before": before,
            "previous_leg": previous_leg,
            "after": {"eval": report["overall"],
                      "eval_ci95": report["overall_ci95"],
                      "intensity": after_int},
            "walls_s": {k: round(v, 1) for k, v in walls.items()},
        }
        (root / "finetune_fs2.json").write_text(json.dumps(out, indent=2))
        print("[conv] fs2 fine-tune summary: " + json.dumps(out["after"]),
              flush=True)
        return 0

    if args.contrast_ab:
        rank_exp, fs2_exp, voc_exp, intensity_texts = _resume_setup(
            cfg, root, args)
        voc_npz = str(Path(voc_exp) / "vocoder.npz")
        cfg.inference.vocoder_checkpoint = voc_npz
        ab = {"contrast": {}, "vocoder_checkpoint": voc_npz}
        for c in [float(x) for x in args.contrast_ab.split(",")]:
            tag = f"contrast_{c:g}"
            row = _intensity_eval(cfg, root, walls, rank_exp,
                                  intensity_texts, fs2_exp, tag, contrast=c)
            ab["contrast"][f"{c:g}"] = row
            print(f"[conv] contrast={c:g}: {json.dumps(row)}", flush=True)
        ab["walls_s"] = {k: round(v, 1) for k, v in walls.items()}
        (root / "contrast_ab.json").write_text(json.dumps(ab, indent=2))
        print(f"[conv] contrast A/B written to {root / 'contrast_ab.json'}"
              f" (vocoder: {voc_npz})", flush=True)
        return 0

    if args.final_only:
        partial = root / "convergence_summary.partial.json"
        if partial.exists():
            summary.update(json.loads(partial.read_text()))
        summary["resumed_final_only"] = True
        rank_exp, fs2_exp, voc_exp, intensity_texts = _resume_setup(
            cfg, root, args)
        print(f"[conv] --final-only: rank={rank_exp} fs2={fs2_exp} "
              f"voc={voc_exp}", flush=True)
        return _finalize(args, cfg, root, walls, summary, rank_exp,
                         fs2_exp, voc_exp, intensity_texts)

    # ---- rank model ---------------------------------------------------
    t0 = time.time()
    rank_trainer = RankTrainer(cfg)
    rank_exp = rank_trainer.fit(verbose=True)
    walls[f"rank_{args.rank_steps}steps"] = time.time() - t0
    print(f"[conv] rank done: {rank_exp} ({walls[list(walls)[-1]]:.0f}s)",
          flush=True)
    # the rank model's own convergence evidence: validation-loss series
    rank_metrics = (Path(rank_exp) / "metrics.jsonl").read_text().splitlines()
    rank_metrics = [json.loads(ln) for ln in rank_metrics]
    summary["rank_valid_loss"] = [
        {"step": r.get("step"), "value": round(r["value"], 5)}
        for r in rank_metrics if r.get("tag") == "valid/loss"
    ]
    print(f"[conv] rank valid-loss series: "
          f"{[r['value'] for r in summary['rank_valid_loss']]}", flush=True)

    rank_template = init_rank_params(cfg, build_rank_model(cfg), 0)
    rank_params = load_best_params(rank_exp, {"params": rank_template["params"]})
    ext_params = extractor_params_from_rank(rank_params)

    t0 = time.time()
    cfg.inference.rank_exp = Path(rank_exp).name
    bucketize(cfg, exp_path=rank_exp)
    walls["bucketize"] = time.time() - t0

    # did the rank model learn the corpus's intensity axis?  With the graded
    # corpus the ground-truth strengths are on disk — correlate them against
    # the frozen model's λ≡1 scores (the bucketizer's sort key)
    strengths_path = root / "strengths.json"
    if strengths_path.exists():
        from emotts.eval.intensity_eval import rank_strength_correlation

        t0 = time.time()
        summary["rank_strength_spearman"] = rank_strength_correlation(
            cfg, rank_params, json.loads(strengths_path.read_text())
        )
        walls["strength_corr"] = time.time() - t0
        print("[conv] rank-score vs ground-truth strength: "
              + json.dumps(summary["rank_strength_spearman"]), flush=True)

    # ---- FS2 in stages, evaluating after each -------------------------
    intensity_texts = [t for t in args.intensity_texts.split("|") if t.strip()]

    def intensity_eval(fs2_exp, tag):
        return _intensity_eval(cfg, root, walls, rank_exp, intensity_texts,
                               fs2_exp, tag)

    fs2_stages = [int(s) for s in args.fs2_stages.split(",") if s]
    fs2_trainer = FS2Trainer(cfg, ext_params)
    fs2_exp = None
    total_steps = 0
    for k, steps in enumerate(fs2_stages):
        cfg.train_fs2.max_iterations = steps
        t0 = time.time()
        if fs2_exp is None:
            fs2_exp = fs2_trainer.fit(verbose=False)
        else:
            fs2_trainer.fit(exp_path=fs2_exp, verbose=False, resume=True)
        total_steps += steps
        wall = time.time() - t0
        walls[f"fs2_stage{k}"] = wall

        t0 = time.time()
        ev = Evaluator(cfg, fs2_exp=fs2_exp, rank_exp=rank_exp)
        report = ev.run(
            split="valid",
            max_batches=args.eval_max_batches,
            out_path=str(root / f"eval_stage{k}.json"),
            f0_max_utts=0,
        )
        walls[f"eval_stage{k}"] = time.time() - t0
        row = {
            "stage": k,
            "fs2_steps_total": total_steps,
            "train_wall_s": round(wall, 1),
            **report["overall"],
            "ci95": report["overall_ci95"],
            # the TITLE capability, measured per stage (mel-only path —
            # the vocoder trains later)
            "intensity": intensity_eval(fs2_exp, f"stage{k}"),
        }
        summary["stages"].append(row)
        print(f"[conv] fs2 stage {k} ({total_steps} steps): "
              + json.dumps(row), flush=True)
        (root / "convergence_summary.partial.json").write_text(
            json.dumps(summary, indent=2)
        )

    # ---- vocoder GAN in stages ----------------------------------------
    voc_stages = [int(s) for s in args.voc_stages.split(",") if s]
    voc_trainer = VocoderTrainer(cfg)
    voc_exp = None
    voc_steps = 0
    for k, steps in enumerate(voc_stages):
        t0 = time.time()
        # fit() treats n_steps as the TOTAL step target (training resumes at
        # the checkpointed step counter), so later stages must pass the
        # cumulative target, not the per-stage increment.
        if voc_exp is None:
            voc_exp = voc_trainer.fit(n_steps=voc_steps + steps)
        else:
            voc_trainer.fit(
                n_steps=voc_steps + steps, exp_path=voc_exp, resume=True
            )
        voc_steps += steps
        walls[f"voc_stage{k}"] = time.time() - t0
        # mel-L1 series from the trainer's own metrics stream
        lines = (Path(voc_exp) / "metrics.jsonl").read_text().splitlines()
        mel_l1 = [json.loads(ln) for ln in lines]
        mel_l1 = [r["value"] for r in mel_l1 if r.get("tag") == "train/mel_l1"]
        summary.setdefault("vocoder", []).append(
            {"stage": k, "steps_total": voc_steps,
             "train_wall_s": round(walls[f"voc_stage{k}"], 1),
             "mel_l1_last": mel_l1[-1] if mel_l1 else None}
        )
        print(f"[conv] vocoder stage {k}: mel_l1 series tail "
              f"{mel_l1[-3:]}", flush=True)
        (root / "convergence_summary.partial.json").write_text(
            json.dumps(summary, indent=2)
        )

    return _finalize(args, cfg, root, walls, summary, rank_exp, fs2_exp,
                     voc_exp, intensity_texts)


_INT_KEYS = ("verdict", "prototype_spread",
             "monotonic_fraction_strict", "monotonic_fraction_strict_ci95",
             "pairwise_order_accuracy", "pairwise_order_accuracy_ci95",
             "monotonic_fraction_cell_mean", "emotion_silhouette_h")


def _intensity_eval(cfg, root, walls, rank_exp, intensity_texts, fs2_exp, tag,
                    contrast=1.0):
    from emotts.eval.intensity_eval import evaluate_intensity_efficacy

    t0 = time.time()
    rep = evaluate_intensity_efficacy(
        cfg, fs2_exp=fs2_exp, rank_exp=rank_exp, texts=intensity_texts,
        out_path=str(root / f"intensity_{tag}.json"), contrast=contrast,
    )
    walls[f"intensity_{tag}"] = time.time() - t0
    row = {k: rep.get(k) for k in _INT_KEYS}
    row["feature_path"] = rep["feature_path"]
    return row


def _resume_setup(cfg, root: Path, args):
    """Shared setup for the resume modes (--final-only / --contrast-ab /
    --voc-finetune-fs2): resolve the campaign's latest experiments, point
    cfg.inference at them, and parse the sweep texts.  One copy so the
    three modes cannot drift apart."""
    exp_root = root / "experiments"
    rank_exp = _latest_exp(exp_root / "rank_model")
    fs2_exp = _latest_exp(exp_root / "fastspeech2")
    voc_exp = _latest_exp(exp_root / "vocoder")
    cfg.inference.rank_exp = Path(rank_exp).name
    cfg.inference.fs2_exp = Path(fs2_exp).name
    intensity_texts = [t for t in args.intensity_texts.split("|")
                       if t.strip()]
    return rank_exp, fs2_exp, voc_exp, intensity_texts


def _latest_exp(base: Path) -> str:
    """Highest-numbered exp_N under base (the campaign's own runs)."""
    exps = sorted((p for p in base.glob("exp_*") if p.is_dir()),
                  key=lambda p: int(p.name.split("_")[1]))
    if not exps:
        raise SystemExit(f"campaign resume: no experiments under {base}")
    return str(exps[-1])


def _finalize(args, cfg, root, walls, summary, rank_exp, fs2_exp, voc_exp,
              intensity_texts):
    """Final leg: eval through the trained vocoder + vocoded intensity
    efficacy + summary write.  Shared by the straight-through run and
    --final-only resume."""
    import time as _time

    from emotts.eval.evaluate import Evaluator
    from emotts.infer.synthesize import load_vocoder_checkpoint

    voc_params = load_vocoder_checkpoint(str(Path(voc_exp) / "vocoder.npz"),
                                         cfg)
    t0 = _time.time()
    ev = Evaluator(cfg, fs2_exp=fs2_exp, rank_exp=rank_exp,
                   vocoder_params=voc_params)
    report = ev.run(
        split="valid",
        out_path=str(root / "eval_final_with_vocoder.json"),
        f0_max_utts=args.eval_f0_utts,
    )
    walls["eval_final"] = _time.time() - t0
    summary["final_with_vocoder"] = report["overall"]
    summary["final_with_vocoder_ci95"] = report["overall_ci95"]
    # intensity efficacy through REAL vocoded audio (mel+pitch+energy
    # re-extracted from the synthesized waveforms)
    cfg.inference.vocoder_checkpoint = str(Path(voc_exp) / "vocoder.npz")
    summary["final_intensity"] = _intensity_eval(
        cfg, root, walls, rank_exp, intensity_texts, fs2_exp, "final_vocoded"
    )
    print(f"[conv] final intensity efficacy: "
          + json.dumps(summary["final_intensity"]), flush=True)
    # the visual counterpart of the reference's assets/intensities.png:
    # score-vs-level sweep per (speaker, emotion) through vocoded audio
    from emotts.utils.plotting import plot_intensity_sweep

    plot_intensity_sweep(
        json.loads((root / "intensity_final_vocoded.json").read_text()),
        str(root / "intensity_final_vocoded.png"),
    )
    summary["walls_s"] = {k: round(v, 1) for k, v in walls.items()}
    (root / "convergence_summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    # the incremental partial file is superseded by the final summary —
    # remove it so an interrupted older run can't masquerade as current
    (root / "convergence_summary.partial.json").unlink(missing_ok=True)
    print("[conv] SUMMARY")
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

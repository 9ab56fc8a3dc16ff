"""Unified CLI: ``python -m emotts.cli.main <command> [--config cfg.yaml] [a.b=c ...]``.

Entry points mirror the reference's per-package scripts (SURVEY.md §1 L3b):

  prepare-corpus → rank_model/prepare_mfa.py
  preprocess     → rank_model/preprocess.py (features + pair lists)
  fs2-splits     → fastspeech2/preprocess.py
  train-rank     → rank_model/train.py
  bucketize      → rank_model/inference.py
  train-fs2      → fastspeech2/train.py
  synthesize     → fastspeech2/inference.py
  convert-vocoder → (new) torch HiFi-GAN checkpoint → .npz params
  import-reference → (new) reference-trained torch checkpoints (rank model
                     best_model.pth / FastSpeech2 best_model.pth /
                     intensity.npy) → emotts experiment artifacts
  train-vocoder  → (new) HiFi-GAN GAN training on corpus wavs; exports the
                   vocoder.npz that synthesize consumes (the reference can
                   only download a pretrained vocoder)
  evaluate       → (new) objective metrics on the held-out split:
                   teacher-forced MCD, free-running DTW-MCD, duration
                   accuracy, per (speaker, emotion) → eval.json (the
                   reference evaluates only visually)
  g2p            → (new) debug surface: per-word pronunciation trace with
                   the resolving tier (homograph/lexicon/morphology/
                   neural/lts) for --text or inference.text
"""

from __future__ import annotations

import argparse
import os
import sys

from emotts.utils.config import Config, load_config


def _parse(argv):
    parser = argparse.ArgumentParser(prog="emotts")
    parser.add_argument(
        "command",
        choices=[
            "prepare-corpus",
            "preprocess",
            "fs2-splits",
            "train-rank",
            "bucketize",
            "train-fs2",
            "synthesize",
            "convert-vocoder",
            "import-reference",
            "train-vocoder",
            "evaluate",
            "eval-intensity",
            "serve",
            "g2p",
        ],
    )
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--checkpoint", default=None, help="(convert-vocoder) torch ckpt")
    parser.add_argument("--output", default=None, help="(convert-vocoder) output .npz")
    parser.add_argument(
        "--resume", default=None, metavar="EXP_PATH",
        help="(train-*) resume full train state from an experiment directory",
    )
    parser.add_argument(
        "--rank-checkpoint", default=None, metavar="PTH",
        help="(import-reference) reference rank-model best_model.pth",
    )
    parser.add_argument(
        "--fs2-checkpoint", default=None, metavar="PTH",
        help="(import-reference) reference FastSpeech2 best_model.pth",
    )
    parser.add_argument(
        "--intensity", default=None, metavar="NPY",
        help="(import-reference) reference intensity.npy prototype bank",
    )
    parser.add_argument(
        "--text-file", default=None, metavar="PATH",
        help="(synthesize) long-form mode: split PATH into sentences and "
        "write one stitched wav for --speaker/--emotion/--level",
    )
    parser.add_argument(
        "--ssml-file", default=None, metavar="PATH",
        help="(synthesize) SSML-lite mode: render PATH's markup "
        "(<voice>/<emotion>/<prosody rate>/<break>/<phoneme>) to one wav; "
        "--speaker/--emotion/--level are the defaults for unmarked spans",
    )
    parser.add_argument("--speaker", default=None,
                        help="(synthesize --text-file) speaker name")
    parser.add_argument("--emotion", default=None,
                        help="(synthesize --text-file) emotion name")
    parser.add_argument("--level", type=float, default=0.0,
                        help="(synthesize --text-file) intensity level; "
                        "fractional values interpolate between bucket "
                        "prototypes (e.g. 1.5)")
    parser.add_argument("--conditioning", default="own",
                        choices=["own", "prototype"],
                        help="(evaluate) intensity conditioning for the "
                        "objective metrics: 'own' = each utterance's "
                        "extracted representation (training-time bridge); "
                        "'prototype' = the bucketized intensity bank at the "
                        "middle level — the USER-facing synthesis path, "
                        "measurable at any --contrast operating point "
                        "(shares the --contrast flag with eval-intensity: "
                        "prototypes exaggerated as m + c*(p - m))")
    parser.add_argument("--intensity-scale", type=float, default=1.0,
                        help="(synthesize --text-file) multiplier on the "
                        "intensity conditioning vector (0=neutral-like, "
                        ">1=exaggerated)")
    parser.add_argument("--pace", type=float, default=1.0,
                        help="(synthesize --text-file) speaking-rate multiplier")
    parser.add_argument("--speaker-mix", default=None, metavar="NAME:W,...",
                        help="(synthesize --text-file) blended voice, e.g. "
                        "bea:0.5,josh:0.5 (weights renormalize; overrides "
                        "--speaker)")
    parser.add_argument("--emotion-mix", default=None,
                        metavar="NAME[@LVL]:W,...",
                        help="(synthesize --text-file) blended affect, e.g. "
                        "amused:0.6,sleepy:0.4 or amused@2:0.7,angry@1:0.3 "
                        "(per-entry level defaults to --level; overrides "
                        "--emotion)")
    parser.add_argument("--host", default="127.0.0.1",
                        help="(serve) bind address")
    parser.add_argument("--port", type=int, default=8080,
                        help="(serve) TCP port (0 = pick a free one)")
    parser.add_argument("--text", default=None,
                        help="(g2p / eval-intensity) input text (default: "
                        "inference.text from the config)")
    parser.add_argument("--texts-file", default=None,
                        help="(eval-intensity) file of sentences, one per "
                        "line, to average the sweep over")
    parser.add_argument("--contrast", type=float, default=1.0,
                        help="(eval-intensity) exaggerate level prototypes "
                        "around their per-cell mean (diagnostic; 1.0 = the "
                        "production bank)")
    parser.add_argument("--plot", default=None, metavar="PNG",
                        help="(eval-intensity) also render the score-vs-"
                        "level sweep figure (the measurable counterpart of "
                        "the reference's assets/intensities.png)")
    parser.add_argument("--stream", action="store_true",
                        help="(synthesize --text-file) streaming mode: vocode "
                        "in chunks and report time-to-first-audio")
    parser.add_argument("overrides", nargs="*", help="a.b.c=value overrides")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])
    cfg: Config = load_config(args.config, args.overrides)

    if args.command == "prepare-corpus":
        from emotts.cli.prepare_corpus import prepare_corpus

        n = prepare_corpus(cfg)
        print(f"[prepare] wrote {n} corpus utterances")

    elif args.command == "preprocess":
        from emotts.data.preprocess import preprocess_all
        from emotts.data.splits import build_rank_pair_lists

        counts = preprocess_all(cfg, device_mel=cfg.data.device_mel)
        train, test = build_rank_pair_lists(cfg)
        print(
            f"[preprocess] {sum(counts.values())} utterances; "
            f"{len(train)} train pairs, {len(test)} test pairs"
        )

    elif args.command == "fs2-splits":
        from emotts.data.splits import build_fs2_splits

        train, valid = build_fs2_splits(cfg)
        print(f"[fs2-splits] {len(train)} train / {len(valid)} valid")

    elif args.command == "train-rank":
        from emotts.train.rank_trainer import RankTrainer

        exp = RankTrainer(cfg).fit(exp_path=args.resume, resume=bool(args.resume))
        print(f"[train-rank] experiment: {exp}")

    elif args.command == "bucketize":
        from emotts.infer.bucketize import bucketize

        out = bucketize(cfg)
        print(f"[bucketize] prototypes saved to {out}")

    elif args.command == "train-fs2":

        from emotts.train.checkpoint import load_best_params
        from emotts.train.fs2_trainer import FS2Trainer, extractor_params_from_rank
        from emotts.train.rank_trainer import build_rank_model, init_rank_params

        rank_exp = os.path.join(
            cfg.data.experiment_path, "rank_model", cfg.inference.rank_exp
        )
        template = init_rank_params(cfg, build_rank_model(cfg), 0)
        rank_params = load_best_params(rank_exp, template)
        vocoder = vocoder_params = None
        if cfg.inference.vocoder_checkpoint and os.path.exists(
            cfg.inference.vocoder_checkpoint
        ):
            from emotts.infer.synthesize import load_vocoder_checkpoint
            from emotts.nn.hifigan import (
                HiFiGANGenerator,
                generator_structure_from_params,
            )

            vocoder_params = load_vocoder_checkpoint(
                cfg.inference.vocoder_checkpoint, cfg
            )
            vocoder = HiFiGANGenerator(
                **generator_structure_from_params(
                    vocoder_params, expected_upsample=cfg.audio.hop_length
                )
            )
        exp = FS2Trainer(
            cfg,
            extractor_params_from_rank(rank_params),
            vocoder=vocoder,
            vocoder_params=vocoder_params,
        ).fit(exp_path=args.resume, resume=bool(args.resume))
        print(f"[train-fs2] experiment: {exp}")

    elif args.command == "synthesize":
        from emotts.infer.synthesize import load_synthesizer

        synth = load_synthesizer(cfg)
        if args.ssml_file:
            from emotts.audio.wavio import write_wav
            from emotts.infer.synthesize import resolve_name
            from emotts.text.ssml import SSMLError

            if args.speaker_mix or args.emotion_mix:
                print("--speaker-mix/--emotion-mix cannot combine with "
                      "--ssml-file; use <voice>/<emotion> spans instead",
                      file=sys.stderr)
                return 2
            try:
                spk = (resolve_name(args.speaker, cfg.data.speakers, "speaker")
                       if args.speaker is not None else 0)
                emo = (resolve_name(args.emotion, cfg.data.emotions, "emotion")
                       if args.emotion is not None else 0)
            except ValueError as e:
                print(str(e), file=sys.stderr)
                return 2
            try:
                wav = synth.synthesize_ssml(
                    open(args.ssml_file).read(), speaker=spk, emotion=emo,
                    level=args.level, intensity_scale=args.intensity_scale,
                    pace=args.pace,
                )
            except SSMLError as e:
                print(f"SSML error: {e}", file=sys.stderr)
                return 2
            os.makedirs(cfg.inference.output_path, exist_ok=True)
            out_wav = os.path.join(cfg.inference.output_path, "ssml.wav")
            write_wav(out_wav, wav, cfg.audio.sampling_rate)
            dur = len(wav) / cfg.audio.sampling_rate
            print(f"[synthesize] wrote {out_wav} ({dur:.1f}s)")
        elif args.text_file:
            from emotts.audio.wavio import write_wav

            if (args.speaker is None and args.speaker_mix is None) or (
                args.emotion is None and args.emotion_mix is None
            ):
                print("synthesize --text-file requires --speaker (or "
                      "--speaker-mix) and --emotion (or --emotion-mix)",
                      file=sys.stderr)
                return 2
            from emotts.infer.synthesize import resolve_name

            try:
                spk = (resolve_name(args.speaker, cfg.data.speakers, "speaker")
                       if args.speaker is not None else 0)
                emo = (resolve_name(args.emotion, cfg.data.emotions, "emotion")
                       if args.emotion is not None else 0)
                speaker_mix = emotion_mix = None
                if args.speaker_mix:
                    speaker_mix = [
                        (resolve_name(name, cfg.data.speakers, "speaker"),
                         float(w))
                        for name, w in
                        (p.split(":") for p in args.speaker_mix.split(","))
                    ]
                if args.emotion_mix:
                    emotion_mix = []
                    for part in args.emotion_mix.split(","):
                        name, w = part.split(":")
                        lvl = args.level
                        if "@" in name:
                            name, lvl_s = name.split("@")
                            lvl = float(lvl_s)
                        emotion_mix.append(
                            (resolve_name(name, cfg.data.emotions, "emotion"),
                             lvl, float(w))
                        )
            except ValueError as e:
                print(str(e), file=sys.stderr)
                return 2
            text = open(args.text_file).read()
            if args.stream:
                if speaker_mix or emotion_mix:
                    print("--speaker-mix/--emotion-mix are not supported "
                          "with --stream yet", file=sys.stderr)
                    return 2
                import time

                import numpy as np

                from emotts.infer.streaming import stream_text

                t0 = time.perf_counter()
                ttfa = None
                chunks = []
                for chunk in stream_text(
                    synth, text, spk, emo, level=args.level, pace=args.pace,
                    intensity_scale=args.intensity_scale,
                ):
                    if ttfa is None:
                        ttfa = time.perf_counter() - t0
                    chunks.append(chunk)
                wav = np.concatenate(chunks)
                print(f"[synthesize] time-to-first-audio {ttfa * 1e3:.0f} ms "
                      f"({len(chunks)} chunks)")
            else:
                wav = synth.synthesize_text(
                    text, spk, emo, level=args.level, pace=args.pace,
                    intensity_scale=args.intensity_scale,
                    speaker_mix=speaker_mix, emotion_mix=emotion_mix,
                )
            os.makedirs(cfg.inference.output_path, exist_ok=True)
            spk_label = (args.speaker_mix.replace(":", "").replace(",", "+")
                         if args.speaker_mix else args.speaker)
            emo_label = (args.emotion_mix.replace(":", "").replace(",", "+")
                         .replace("@", "") if args.emotion_mix
                         else args.emotion)
            out_wav = os.path.join(
                cfg.inference.output_path,
                f"longform_{spk_label}_{emo_label}_{args.level:g}.wav",
            )
            write_wav(out_wav, wav, cfg.audio.sampling_rate)
            dur = len(wav) / cfg.audio.sampling_rate
            print(f"[synthesize] wrote {out_wav} ({dur:.1f}s)")
        else:
            out = synth.intensity_sweep(
                cfg.inference.text, cfg.inference.output_path
            )
            print(f"[synthesize] wrote {len(out)} items to "
                  f"{cfg.inference.output_path}")

    elif args.command == "convert-vocoder":
        from emotts.infer.synthesize import load_vocoder_checkpoint, save_vocoder_params_npz

        if not args.checkpoint or not args.output:
            print("convert-vocoder requires --checkpoint and --output", file=sys.stderr)
            return 2
        params = load_vocoder_checkpoint(args.checkpoint, cfg)
        save_vocoder_params_npz(params, args.output)
        print(f"[convert-vocoder] saved {args.output}")

    elif args.command == "serve":
        from emotts.infer.server import make_server
        from emotts.infer.synthesize import load_synthesizer

        synth = load_synthesizer(cfg)
        httpd = make_server(cfg, synth, host=args.host, port=args.port,
                            verbose=True)
        host, port = httpd.server_address[:2]
        print(f"[serve] listening on http://{host}:{port}  "
              f"(endpoints: GET /health, POST /synthesize, POST /batch)",
              flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()

    elif args.command == "evaluate":
        from emotts.eval.evaluate import Evaluator

        from emotts.infer.synthesize import maybe_load_vocoder

        run_kwargs = {}
        if args.conditioning == "prototype":
            import os as _os

            import numpy as _np

            bank_path = _os.path.join(
                cfg.data.experiment_path, "rank_model",
                cfg.inference.rank_exp, "intensity.npy",
            )
            run_kwargs = dict(
                conditioning="prototype",
                intensity_bank=_np.load(bank_path),
                contrast=args.contrast,
            )
        report = Evaluator(cfg, vocoder_params=maybe_load_vocoder(cfg)).run(
            **run_kwargs)
        overall = report["overall"]
        print(f"[evaluate] {report['n_utterances']} utterances")
        for k, v in overall.items():
            print(f"[evaluate]   {k}: {v:.4f}")
        # the title capability is part of the standard quality report: run
        # the intensity-efficacy sweep too when its artifacts exist
        # (intensity.npy + best FS2 checkpoint), and fold it into eval.json
        try:
            from emotts.eval.intensity_eval import evaluate_intensity_efficacy

            intensity = evaluate_intensity_efficacy(cfg)
        except FileNotFoundError as exc:
            print(f"[evaluate] intensity efficacy skipped: {exc}")
        else:
            import json as _json

            for k in ("monotonic_fraction_strict", "pairwise_order_accuracy",
                      "emotion_silhouette_h"):
                v = intensity.get(k)
                val = f"{v:.4f}" if v is not None else "n/a"
                print(f"[evaluate]   intensity/{k}: {val}")
            with open(report["path"]) as f:
                merged = _json.load(f)
            merged["intensity_efficacy"] = {
                k: v for k, v in intensity.items() if k != "path"
            }
            with open(report["path"], "w") as f:
                _json.dump(merged, f, indent=2)
        print(f"[evaluate] report: {report['path']}")

    elif args.command == "eval-intensity":
        from emotts.eval.intensity_eval import evaluate_intensity_efficacy

        texts = None
        if args.texts_file:
            with open(args.texts_file) as f:
                texts = [ln.strip() for ln in f if ln.strip()]
        elif args.text:
            texts = [args.text]
        report = evaluate_intensity_efficacy(
            cfg, texts=texts, contrast=args.contrast
        )
        if args.plot:
            from emotts.utils.plotting import plot_intensity_sweep

            plot_intensity_sweep(report, args.plot)
            print(f"[eval-intensity] sweep plot: {args.plot}")
        print(f"[eval-intensity] {report['n_synthesized']} synthesized "
              f"({report['feature_path']}, contrast {args.contrast:g})")
        for k in ("monotonic_fraction_strict", "pairwise_order_accuracy",
                  "monotonic_fraction_cell_mean", "emotion_silhouette_h"):
            v = report.get(k)
            val = f"{v:.4f}" if v is not None else "n/a"
            print(f"[eval-intensity]   {k}: {val}")
        print(f"[eval-intensity] report: {report['path']}")

    elif args.command == "train-vocoder":
        from emotts.train.vocoder_trainer import VocoderTrainer

        exp = VocoderTrainer(cfg).fit(
            exp_path=args.resume, resume=bool(args.resume)
        )
        print(f"[train-vocoder] experiment: {exp} "
              f"(generator exported to {exp}/vocoder.npz)")

    elif args.command == "import-reference":
        import shutil

        import numpy as np

        from emotts.train.checkpoint import save_best_export

        if not (args.rank_checkpoint or args.fs2_checkpoint or args.intensity):
            print("import-reference requires at least one of "
                  "--rank-checkpoint/--fs2-checkpoint/--intensity",
                  file=sys.stderr)
            return 2

        def torch_state_dict(path):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

        rank_exp = os.path.join(
            cfg.data.experiment_path, "rank_model", cfg.inference.rank_exp
        )
        if args.rank_checkpoint:
            from emotts.nn.convert import rank_params_from_torch

            tree = rank_params_from_torch(
                torch_state_dict(args.rank_checkpoint),
                cfg.rank_model.n_encoder_layers,
                cfg.rank_model.n_heads,
            )
            path = save_best_export(rank_exp, tree)
            print(f"[import-reference] rank params → {path}")

        if args.fs2_checkpoint:
            from emotts.nn.convert import fs2_params_from_reference_torch

            f = cfg.fastspeech2
            if f.prenet_style != "embedding" or f.postnet_style != "speechbrain":
                print(
                    "import-reference: reference FastSpeech2 checkpoints need "
                    "the compat architecture — set "
                    "fastspeech2.prenet_style=embedding and "
                    "fastspeech2.postnet_style=speechbrain in the config used "
                    "for import AND for later synthesis/training",
                    file=sys.stderr,
                )
                return 2
            tree = fs2_params_from_reference_torch(
                torch_state_dict(args.fs2_checkpoint), f
            )
            fs2_exp = os.path.join(
                cfg.data.experiment_path, "fastspeech2", cfg.inference.fs2_exp
            )
            path = save_best_export(fs2_exp, tree)
            print(f"[import-reference] fastspeech2 params → {path}")

        if args.intensity:
            bank = np.load(args.intensity)
            os.makedirs(rank_exp, exist_ok=True)
            dst = os.path.join(rank_exp, "intensity.npy")
            if os.path.abspath(args.intensity) != os.path.abspath(dst):
                shutil.copyfile(args.intensity, dst)
            print(f"[import-reference] intensity bank {bank.shape} → {dst}")

    elif args.command == "g2p":
        from emotts.text.g2p import G2P

        text = args.text if args.text is not None else cfg.inference.text
        rows = G2P().explain(text)
        for word, tier, phones in rows:
            print(f"{word:>24s}  {tier:<10s}  {' '.join(phones)}")
        print("[g2p]", " ".join(p for _, _, ph in rows for p in ph))

    return 0


if __name__ == "__main__":
    sys.exit(main())

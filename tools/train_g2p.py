"""Train the neural G2P (emotts/text/neural_g2p.py) on the bundled lexicon.

The reference relies on the pretrained SoundChoice neural G2P
(fastspeech2/util.py:20-27); this tool trains the rebuild's equivalent from
in-repo data only (zero-egress friendly): the curated lexicon plus regular
morphological expansions generated through the same voicing rules the
runtime morphology uses (emotts/text/g2p.py), so the model learns both root
orthography->ARPABET patterns and the regular-inflection system.

Held-out evaluation splits by BASE word (derived forms follow their base to
the same side) so there is no orthographic leakage, and reports the rule-LTS
baseline on the same split.

Run (CPU is plenty — ~1M params):
    JAX_PLATFORMS=cpu python tools/train_g2p.py \
        --out emotts/text/data/g2p_weights.npz
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emotts.text import g2p as g2p_mod
from emotts.text import homograph as ng_homograph
from emotts.text import neural_g2p as ng
from emotts.text.g2p import G2P, letter_to_sound


# ---------------------------------------------------------------------------
# Data: lexicon + morphological expansion
# ---------------------------------------------------------------------------


def _derived_forms(word: str):
    """Candidate regular inflections of ``word`` (orthography only)."""
    out = []
    sibilant_end = word.endswith(("s", "x", "z", "ch", "sh"))
    if word.endswith("y") and len(word) > 2 and word[-2] not in "aeiou":
        out += [word[:-1] + "ies", word[:-1] + "ied", word[:-1] + "ier",
                word[:-1] + "iest", word[:-1] + "ily"]
    elif sibilant_end:
        out.append(word + "es")
    else:
        out.append(word + "s")
    if word.endswith("e"):
        out += [word + "d", word[:-1] + "ing", word + "r", word + "st",
                word[:-1] + "able", word[:-1] + "ish"]
    else:
        out += [word + "ed", word + "ing", word + "er", word + "est",
                word + "able", word + "ish"]
    out += [word + "ly", word + "ness", word + "ful", word + "less",
            word + "ment", word + "hood", word + "ship"]
    out += ["un" + word, "re" + word, "non" + word, "dis" + word,
            "mis" + word, "over" + word, "under" + word, "out" + word,
            "pre" + word]
    return out


def build_pairs(seed: int = 0, holdout_frac: float = 0.1):
    """(train_pairs, eval_pairs) of (word, phoneme-list), split by base word."""
    g2p = G2P()
    base_words = sorted(g2p.lexicon.keys())
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(base_words))
    n_eval = int(len(base_words) * holdout_frac)
    eval_bases = {base_words[i] for i in order[:n_eval]}

    train, evalp = [], []
    skipped = 0
    for w in base_words:
        pron = g2p.lexicon[w]
        bucket = evalp if w in eval_bases else train
        if ng.encode_word(w) is None or ng.encode_phonemes(pron) is None:
            skipped += 1
            continue
        bucket.append((w, list(pron)))
        for d in _derived_forms(w):
            if d in g2p.lexicon:
                continue  # real entry wins; avoid duplicate conflicting targets
            # homograph verb stems first: 'used'/'closed'/'recorded' must
            # train on the verb voicing/stress, not the noun default
            morph = ng_homograph.resolve_word(d) or g2p._morph(d)
            if morph is None:
                continue
            if ng.encode_word(d) is None or ng.encode_phonemes(morph) is None:
                continue
            bucket.append((d, morph))
    # dedup derived forms that multiple bases can generate (first wins)
    def dedup(pairs):
        seen, out = set(), []
        for w, p in pairs:
            if w in seen:
                continue
            seen.add(w)
            out.append((w, p))
        return out

    train, evalp = dedup(train), dedup(evalp)
    # a derived form whose surface appears on both sides leaks; drop from train
    eval_words = {w for w, _ in evalp}
    train = [(w, p) for w, p in train if w not in eval_words]
    print(f"pairs: train={len(train)} eval={len(evalp)} (skipped {skipped})")
    return train, evalp


def vectorize(pairs):
    n = len(pairs)
    chars = np.zeros((n, ng.MAX_WORD_LEN), np.int32)
    targets = np.zeros((n, ng.MAX_PHON_LEN), np.int32)
    for i, (w, p) in enumerate(pairs):
        chars[i] = ng.encode_word(w)
        targets[i] = ng.encode_phonemes(p)
    # decoder input: BOS-shifted targets
    dec_in = np.zeros_like(targets)
    dec_in[:, 0] = ng.PHON_BOS
    dec_in[:, 1:] = targets[:, :-1]
    return chars, dec_in, targets


# ---------------------------------------------------------------------------
# Training (JAX)
# ---------------------------------------------------------------------------


def _run_fingerprint(args) -> str:
    """Hyperparameters the resume format/semantics depend on: model dims
    rebuild the tree structure; batch/epochs/lr/seeds position the restored
    step inside the LR schedule and the pre-split dropout-key stream; the
    data flags pin the split the optimizer state was trained on."""
    import json

    return json.dumps({
        k: getattr(args, k)
        for k in ("d_model", "d_ff", "layers", "heads", "batch", "epochs",
                  "lr", "dropout", "label_smoothing", "swa_frac", "holdout",
                  "seed", "init_seed")
    }, sort_keys=True)


def _save_resume(path, params, opt_state, swa_sum, epoch_done, it, swa_n,
                 fingerprint: str = ""):
    """Persist the full training state (params + optimizer + SWA accumulator)
    so a killed run restarts at the last finished epoch instead of from
    scratch.  Tree STRUCTURE is not serialized — it is rebuilt from
    code+args on resume and only the flattened leaves are stored, so the
    format stays a plain npz."""
    import jax

    leaves = jax.tree.flatten((params, opt_state))[0]
    out = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    out["__fingerprint__"] = np.array(fingerprint)
    if swa_sum is not None:
        for i, v in enumerate(jax.tree.flatten(swa_sum)[0]):
            out[f"swa_{i}"] = np.asarray(v)
    out["__epoch_done__"] = np.array([epoch_done], np.int64)
    out["__it__"] = np.array([it], np.int64)
    out["__swa_n__"] = np.array([swa_n], np.int64)
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **out)
    Path(tmp).replace(path)  # atomic: never a torn checkpoint at `path`
    print(f"[resume] checkpoint @ epoch {epoch_done} -> {path}", flush=True)


def _load_resume(path, params, opt_state, swa_template, fingerprint: str = ""):
    """Inverse of :func:`_save_resume`; templates provide the tree defs.

    Refuses a checkpoint whose hyperparameter fingerprint differs from the
    current run's — a silent mismatch would either crash deep inside
    unflatten with an opaque leaf-shape error (model dims) or desync the LR
    schedule / dropout-key stream against the restored optimizer counter
    (batch/epochs/seeds)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    saved_fp = (str(data["__fingerprint__"])
                if "__fingerprint__" in data.files else None)
    if fingerprint and saved_fp and saved_fp != fingerprint:
        raise SystemExit(
            f"[resume] REFUSING {path}: it was written by a run with "
            f"different hyperparameters.\n  checkpoint: {saved_fp}\n"
            f"  this run:  {fingerprint}\n"
            "Delete the stale checkpoint or rerun with matching flags."
        )
    leaves, treedef = jax.tree.flatten((params, opt_state))
    new_leaves = [jnp.asarray(data[f"leaf_{i}"]).astype(l.dtype)
                  if hasattr(l, "dtype") else type(l)(data[f"leaf_{i}"])
                  for i, l in enumerate(leaves)]
    params, opt_state = jax.tree.unflatten(treedef, new_leaves)
    swa_sum = None
    if "swa_0" in data.files:
        s_leaves, s_def = jax.tree.flatten(swa_template)
        swa_sum = jax.tree.unflatten(
            s_def, [jnp.asarray(data[f"swa_{i}"], jnp.float32)
                    for i in range(len(s_leaves))])
    return (params, opt_state, swa_sum, int(data["__epoch_done__"][0]),
            int(data["__it__"][0]), int(data["__swa_n__"][0]))


def train(args):
    import jax
    import jax.numpy as jnp
    import optax

    # the SPLIT seed stays args.seed so ensemble members trained with
    # different --init-seed share one honest held-out set
    init_seed = args.seed if args.init_seed is None else args.init_seed
    train_pairs, eval_pairs = build_pairs(seed=args.seed,
                                          holdout_frac=args.holdout)
    chars, dec_in, targets = vectorize(train_pairs)
    n = len(chars)
    # dataset lives on-device; per-step batches are on-device gathers so the
    # host only ships a (B,) index array per step
    d_chars, d_dec_in, d_targets = (jnp.asarray(a)
                                    for a in (chars, dec_in, targets))

    params = {k: jnp.asarray(v) for k, v in ng.init_params(
        init_seed, d_model=args.d_model, d_ff=args.d_ff,
        n_enc=args.layers, n_dec=args.layers).items()}
    steps_per_epoch = max(1, n // args.batch)
    total_steps = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, total_steps // 10),
        decay_steps=total_steps)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    smooth = args.label_smoothing

    def loss_fn(p, c, di, tg, rng):
        logits = ng.jax_forward(p, c, di, dropout_rate=args.dropout, rng=rng,
                                n_heads=args.heads)
        mask = (tg != ng.PHON_PAD).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tg[..., None], axis=-1)[..., 0]
        uni = -logp.mean(-1)
        ce = (1.0 - smooth) * nll + smooth * uni
        return (ce * mask).sum() / mask.sum()

    @jax.jit
    def epoch_steps(p, s, idxs, keys):
        """One dispatch per EPOCH: lax.scan over (K, B) batch indices.

        Per-step dispatch through the axon tunnel costs ~25 ms against ~3 ms
        of compute for this ~14 M-param model — 475 steps/epoch ran at
        178 s/epoch dispatched singly; scanned, the whole epoch is one
        device program."""

        def body(carry, xs):
            p, s = carry
            idx, rng = xs
            c, di, tg = d_chars[idx], d_dec_in[idx], d_targets[idx]
            l, g = jax.value_and_grad(loss_fn)(p, c, di, tg, rng)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), l

        (p, s), ls = jax.lax.scan(body, (p, s), (idxs, keys))
        return p, s, ls

    np_rng = np.random.default_rng(init_seed + 1)
    rng = jax.random.PRNGKey(init_seed)
    step_keys = jax.random.split(rng, total_steps)  # pre-split: no host sync
    # stochastic weight averaging over the cosine tail: the averaged iterate
    # sits nearer the basin center than any single late-schedule point
    swa_start = int(args.epochs * (1.0 - args.swa_frac))
    swa_sum, swa_n = None, 0
    start_epoch, it = 0, 0
    resume_path = Path(args.out).with_suffix(".resume.npz")
    if args.resume_from or (args.checkpoint_every and resume_path.exists()):
        src = Path(args.resume_from) if args.resume_from else resume_path
        swa_template = {k: v.astype(jnp.float32) for k, v in params.items()}
        params, opt_state, swa_sum, start_epoch, it, swa_n = _load_resume(
            src, params, opt_state, swa_template,
            fingerprint=_run_fingerprint(args))
        # replay the host-side permutation stream so batch order continues
        # exactly where the killed run left off (keys are index-sliced)
        for _ in range(start_epoch):
            np_rng.permutation(n)
        print(f"[resume] continuing from {src} at epoch {start_epoch}/"
              f"{args.epochs} (it={it}, swa_n={swa_n})", flush=True)
    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        perm = np_rng.permutation(n)[:steps_per_epoch * args.batch]
        idxs = jnp.asarray(perm.reshape(steps_per_epoch, args.batch))
        params, opt_state, losses = epoch_steps(
            params, opt_state, idxs, step_keys[it:it + steps_per_epoch]
        )
        it += steps_per_epoch
        if args.swa_frac > 0 and epoch >= swa_start:
            if swa_sum is None:
                swa_sum = {k: v.astype(jnp.float32) for k, v in params.items()}
            else:
                swa_sum = jax.tree.map(lambda a, b: a + b, swa_sum, params)
            swa_n += 1
        if (epoch + 1) % max(1, args.epochs // 12) == 0 or epoch == 0:
            ep_loss = float(jnp.mean(losses))
            print(f"epoch {epoch + 1:3d}/{args.epochs}  loss {ep_loss:.4f}"
                  f"  ({time.time() - t0:.0f}s)", flush=True)
        if args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0 \
                and epoch + 1 < args.epochs:
            _save_resume(resume_path, params, opt_state, swa_sum,
                         epoch + 1, it, swa_n,
                         fingerprint=_run_fingerprint(args))

    np_params = {k: np.asarray(v, np.float32) for k, v in params.items()}
    swa_params = None
    if swa_n > 0:
        swa_params = {k: np.asarray(v / swa_n, np.float32)
                      for k, v in swa_sum.items()}
    return np_params, swa_params, train_pairs, eval_pairs


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def _edit(a, b):
    m, k = len(a), len(b)
    d = np.arange(k + 1)
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, k + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return int(d[k])


def _strip(ps):
    return [p.rstrip("012") for p in ps]


def evaluate(np_params, pairs, label, decode="greedy", beam=4,
             n_heads=ng.N_HEADS):
    """np_params: one weight dict, or a list of dicts (ensemble decode —
    averaged per-step log-probs, emotts.text.neural_g2p).  For an ensemble,
    n_heads may be a per-member list."""
    members = np_params if isinstance(np_params, list) else None
    heads_list = (n_heads if isinstance(n_heads, list)
                  else [n_heads] * (len(members) if members else 1))
    # greedy (single or ensemble) runs batched on the default JAX backend —
    # a full 27k-pair held-out sweep in seconds instead of ~1 h of per-word
    # numpy decodes; beam search stays on the sequential numpy path
    batched_hyps = None
    if decode == "greedy":
        ids_all = np.stack([ng.encode_word(w) for w, _ in pairs])
        rows = ng.jax_batched_greedy_decode(
            members if members is not None else np_params,
            ids_all, heads_list if members is not None else heads_list[0])
        batched_hyps = [ng.decode_phoneme_ids(r) for r in rows]
    exact = exact_ns = 0
    per_num = per_den = 0
    lts_exact = lts_per_num = 0
    for i, (w, ref) in enumerate(pairs):
        if batched_hyps is not None:
            hyp = batched_hyps[i]
        else:
            ids = ng.encode_word(w)
            if members is not None:
                out = ng.np_ensemble_greedy_decode(members, ids, heads_list)
            else:
                out = ng.np_beam_decode(np_params, ids, beam=beam,
                                        n_heads=heads_list[0])
            hyp = ng.decode_phoneme_ids(out)
        lts = letter_to_sound(w)
        exact += hyp == ref
        exact_ns += _strip(hyp) == _strip(ref)
        per_num += _edit(hyp, ref)
        per_den += len(ref)
        lts_exact += lts == ref
        lts_per_num += _edit(lts, ref)
    n = len(pairs)
    print(f"[{label}] n={n} decode={decode}")
    print(f"  neural: exact {exact / n:.3f}  exact(no-stress) {exact_ns / n:.3f}"
          f"  PER {per_num / per_den:.3f}")
    print(f"  rule LTS: exact {lts_exact / n:.3f}  PER {lts_per_num / per_den:.3f}")
    return dict(exact=exact / n, exact_ns=exact_ns / n, per=per_num / per_den,
                lts_exact=lts_exact / n, lts_per=lts_per_num / per_den)


def eval_ensemble(paths, holdout=0.1, seed=0, limit=None):
    """Evaluate 1..N trained member files and their ensemble on the SAME
    held-out split they were trained against (split is seed-derived, so all
    members must share --seed)."""
    members = []
    heads = []
    for path in paths:
        data = np.load(path)
        members.append({k: np.asarray(data[k], np.float32)
                        for k in data.files if not k.startswith("__")})
        heads.append(int(data["__n_heads__"][0])
                     if "__n_heads__" in data.files else ng.N_HEADS)
    _, eval_pairs = build_pairs(seed=seed, holdout_frac=holdout)
    if limit:
        rng = np.random.default_rng(11)
        eval_pairs = [eval_pairs[i]
                      for i in rng.permutation(len(eval_pairs))[:limit]]
    for i, m in enumerate(members):
        evaluate(m, eval_pairs, f"member {i} ({paths[i]})", n_heads=heads[i])
    if len(members) > 1:
        return evaluate(members, eval_pairs, f"ensemble x{len(members)}",
                        n_heads=heads)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-ensemble", default=None, metavar="NPZ[,NPZ...]",
                    help="skip training; evaluate these member files and "
                    "their log-prob-averaged ensemble on the shared "
                    "held-out split")
    ap.add_argument("--eval-limit", type=int, default=None,
                    help="subsample the held-out set for --eval-ensemble")
    ap.add_argument("--out", default=str(Path(g2p_mod.BUNDLED_LEXICON).parent
                                         / "g2p_weights.npz"))
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--d-model", type=int, default=ng.D_MODEL)
    ap.add_argument("--d-ff", type=int, default=ng.D_FF)
    ap.add_argument("--layers", type=int, default=ng.N_ENC,
                    help="encoder AND decoder layer count")
    ap.add_argument("--heads", type=int, default=ng.N_HEADS)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--holdout", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-seed", type=int, default=None,
                    help="weight-init/order seed (default: --seed); vary "
                    "this, not --seed, to train ensemble members that share "
                    "one held-out split")
    ap.add_argument("--checkpoint-every", type=int, default=0, metavar="E",
                    help="save a full resume checkpoint (params+optimizer+"
                    "SWA) every E epochs to <out>.resume.npz; a restart "
                    "with the same flags auto-resumes from it")
    ap.add_argument("--resume-from", default=None, metavar="NPZ",
                    help="explicit resume checkpoint (default: "
                    "<out>.resume.npz when --checkpoint-every is set and "
                    "the file exists)")
    ap.add_argument("--swa-frac", type=float, default=0.25,
                    help="average weights over the last FRAC of epochs")
    ap.add_argument("--final-eval-limit", type=int, default=None,
                    help="subsample the held-out set for the post-training "
                    "evaluation (the numpy decode is per-word sequential; "
                    "full 20k+-pair sweeps can dominate wall time)")
    ap.add_argument("--beam-eval", type=int, default=0, metavar="N",
                    help="also run the sequential numpy beam-4 eval on N "
                    "held-out words (~1 s/word at d256 — default off; the "
                    "batched greedy sweep is the headline metric)")
    args = ap.parse_args()

    if args.eval_ensemble:
        eval_ensemble(args.eval_ensemble.split(","), holdout=args.holdout,
                      seed=args.seed, limit=args.eval_limit)
        return

    raw_params, swa_params, train_pairs, eval_pairs = train(args)

    def save(np_params, metrics=None, path=None):
        out = dict(np_params)
        out["__version__"] = np.array([1], np.int32)
        out["__n_heads__"] = np.array([args.heads], np.int32)
        if metrics is not None:
            out["__eval_exact__"] = np.array([metrics["exact"]], np.float32)
            out["__eval_per__"] = np.array([metrics["per"]], np.float32)
        path = str(path or args.out)
        np.savez_compressed(path, **out)
        if not path.endswith(".npz"):
            path += ".npz"  # np.savez appends the suffix if missing
        size = Path(path).stat().st_size / 1e6
        print(f"saved {path} ({size:.1f} MB)", flush=True)

    # crash insurance: persist the final iterate before any evaluation — to a
    # DISTINCT path, so a run that dies mid-eval can never leave an
    # unevaluated artifact at args.out masquerading as a shipped model
    # (tests/test_neural_g2p.py expects bundled weights to carry metrics)
    save(raw_params, path=Path(args.out).with_suffix(".unevaluated.npz"))

    if args.final_eval_limit and len(eval_pairs) > args.final_eval_limit:
        sub_rng = np.random.default_rng(11)
        keep = sub_rng.permutation(len(eval_pairs))[: args.final_eval_limit]
        eval_pairs = [eval_pairs[i] for i in keep]
    rng = np.random.default_rng(9)
    sample = [train_pairs[i] for i in rng.permutation(len(train_pairs))[:800]]

    # pick the better of final-iterate vs SWA on a held-out subsample
    sub = eval_pairs[:: max(1, len(eval_pairs) // 1000)]
    cands = [("final", raw_params)]
    if swa_params is not None:
        cands.append(("swa", swa_params))
    scored = [(evaluate(p, sub, f"held-out sub ({name})",
                        n_heads=args.heads)["exact"], name, p)
              for name, p in cands]
    scored.sort(reverse=True, key=lambda s: s[0])
    _, best_name, np_params = scored[0]
    print(f"selected: {best_name}")

    evaluate(np_params, sample, "train sample", n_heads=args.heads)
    metrics = evaluate(np_params, eval_pairs, "held-out", n_heads=args.heads)
    save(np_params, metrics)  # save with the recorded quality metrics
    Path(args.out).with_suffix(".unevaluated.npz").unlink(missing_ok=True)
    Path(args.out).with_suffix(".resume.npz").unlink(missing_ok=True)
    # base (lexicon-root) words only — the hardest, most honest subset:
    # unseen roots with no morphological signal
    g2p = G2P()
    base_eval = [(w, p) for w, p in eval_pairs if w in g2p.lexicon]
    if base_eval:
        evaluate(np_params, base_eval, "held-out base words",
                 n_heads=args.heads)
    if args.beam_eval:
        # seeded subsample (not a corpus-ordered head slice) so the beam
        # metric is representative of the held-out distribution
        beam_rng = np.random.default_rng(13)
        pick = beam_rng.permutation(len(eval_pairs))[: args.beam_eval]
        sub = [eval_pairs[i] for i in pick]
        evaluate(np_params, sub, f"held-out beam ({len(sub)})",
                 decode="beam", n_heads=args.heads)


if __name__ == "__main__":
    main()

"""Neural G2P: packaged weights, numpy==jax parity, quality gates, fallback
chain integration (reference capability: SoundChoice neural G2P,
fastspeech2/util.py:20-27)."""

import sys
from pathlib import Path

import numpy as np
import pytest

from emotts.text import neural_g2p as ng
from emotts.text.g2p import G2P, letter_to_sound
from emotts.text.vocab import VALID_TOKENS

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def model():
    assert ng.NeuralG2P.available(), "packaged g2p_weights.npz missing"
    return ng.NeuralG2P()


def test_weights_packaged_and_versioned(model):
    # vocab dims must match the packaged weights; width/depth derive from
    # the artifact itself (shipped primary: d256/ff1024/3+3/h8)
    arch = ng.arch_of(model.params, model.n_heads)
    assert model.params["char_emb"].shape == (ng.N_CHAR_TOKENS,
                                              arch["d_model"])
    assert model.params["out_proj"].shape == (arch["d_model"],
                                              ng.N_PHON_TOKENS)
    # training metrics recorded in the artifact pass the quality bar.
    # Shipped: band-15 split, n=8000: 0.670 exact / 0.070 PER.  Floors are
    # SPLIT-RELATIVE: the band-12-15 curated additions (proper nouns,
    # low-frequency vocab) hardened the held-out pool — the previous
    # band-11 weights read 0.761 on their own split but only 0.536 on
    # clean words unseen by their training, where the shipped band-15
    # weights score 0.561 (BENCH_NOTES "round-4 retrain: contamination").
    data = np.load(ng.BUNDLED_WEIGHTS)
    assert float(data["__eval_exact__"][0]) >= 0.65
    assert float(data["__eval_per__"][0]) <= 0.075
    # the SPLIT-STABLE floor: accuracy on the clean common set (held-out
    # words unseen by BOTH the band-11 and band-15 trainings, n=2000
    # seeded) — this number cannot be inflated by lexicon growth
    # reshuffling the split, so it protects against a regression back to
    # old-split-level quality that the split-relative floors above would
    # admit (band-11 weights read 0.536/0.108 here; shipped band-15:
    # 0.561/0.096)
    assert float(data["__eval_clean_common_exact__"][0]) >= 0.55
    assert float(data["__eval_clean_common_per__"][0]) <= 0.10


def test_decode_outputs_valid_vocab(model):
    for word in ["blorptastic", "xylophagous", "zembla", "quixotry"]:
        phones = model.word_to_phonemes(word)
        assert phones, word
        assert all(p in VALID_TOKENS for p in phones), (word, phones)


def test_decode_deterministic(model):
    a = model.word_to_phonemes("crystalline")
    b = ng.NeuralG2P().word_to_phonemes("crystalline")
    assert a == b


def test_beam_decode_option(model):
    # beam=1 must be exactly the greedy path; beam>1 must yield valid
    # vocab output and route through np_beam_decode (single member)
    beamed = ng.NeuralG2P(beam=4)
    assert beamed.beam == 4
    for word in ["blorptastic", "zembla"]:
        greedy = model.word_to_phonemes(word)
        b4 = beamed.word_to_phonemes(word)
        assert b4, word
        assert all(p in VALID_TOKENS for p in b4), (word, b4)
        ids = ng.encode_word(word)
        assert b4 == ng.decode_phoneme_ids(
            ng.np_beam_decode(beamed.params, ids, beam=4,
                              n_heads=beamed.n_heads)
        )
        assert greedy == ng.decode_phoneme_ids(
            ng.np_greedy_decode(model.params, ids, model.n_heads)
        )


def test_g2p_neural_beam_plumbing():
    g = G2P(neural=True, neural_beam=3)
    assert g.neural is not None and g.neural.beam == 3


def test_unencodable_words_return_none(model):
    assert model.word_to_phonemes("café") is None
    assert model.word_to_phonemes("x" * 40) is None
    assert model.word_to_phonemes("") is None


def test_numpy_jax_forward_parity(model):
    """The jax training forward and the numpy inference forward are the same
    function of the same weight dict."""
    p = model.params
    heads = model.n_heads
    arch = ng.arch_of(p, heads)
    words = ["parity", "checking", "zyzzyva"]
    for w in words:
        cid = ng.encode_word(w)
        t = int((cid != ng.CHAR_PAD).sum())
        # numpy teacher-forced pass over the model's own greedy output
        out_ids = ng.np_greedy_decode(p, cid, heads)
        prev = np.array([ng.PHON_BOS] + out_ids, dtype=np.int32)
        logits_jax = np.asarray(
            ng.jax_forward(p, cid[None, :t], prev[None], n_heads=heads)[0]
        )
        # numpy mirror: rerun the decoder stack over the full prefix
        enc = ng._np_encode(p, cid, heads)
        tp = len(prev)
        x = p["phon_emb"][prev] + p["phon_pos"][:tp]
        causal = np.triu(np.full((tp, tp), -1e9, dtype=np.float32), k=1)
        enc_mask = np.zeros((tp, enc.shape[0]), dtype=np.float32)
        for i in range(arch["n_dec"]):
            x = ng._dec_layer(x, enc, p, f"dec{i}_", causal, enc_mask, heads)
        x = ng._ln(x, p["dec_ln_g"], p["dec_ln_b"])
        logits_np = x @ p["out_proj"]
        np.testing.assert_allclose(logits_np, logits_jax, rtol=2e-4, atol=2e-4)
        # same argmax path
        assert list(np.argmax(logits_np, -1)) == list(np.argmax(logits_jax, -1))


def test_heldout_quality_beats_rule_lts(model):
    """On truly held-out lexicon words (seeded split from the training tool),
    the neural model must beat the rule LTS by a wide margin."""
    from train_g2p import _edit, build_pairs

    _, eval_pairs = build_pairs(seed=0, holdout_frac=0.1)
    rng = np.random.default_rng(3)
    sample = [eval_pairs[i] for i in rng.permutation(len(eval_pairs))[:150]]
    n_exact = per_num = per_den = lts_per_num = 0
    for w, ref in sample:
        hyp = model.word_to_phonemes(w) or []
        n_exact += hyp == ref
        per_num += _edit(hyp, ref)
        per_den += len(ref)
        lts_per_num += _edit(letter_to_sound(w), ref)
    # floors pinned within ~3 pts of the shipped weights' measured quality
    # on THIS fixed sample (d256 primary: 0.740 exact / 0.063 PER,
    # lts ratio 0.185) so the component cannot silently degrade
    assert n_exact / len(sample) >= 0.71, n_exact / len(sample)
    assert per_num / per_den <= 0.075, per_num / per_den
    assert per_num < lts_per_num * 0.30  # >=70% PER reduction vs rules


def test_beam_decode_wellformed(model):
    """Beam search is an optional decode mode: outputs must be valid and at
    least match greedy's sequence score on the model's own distribution.
    (Measured: beam4 == greedy in quality on held-out — the model is
    confident — so greedy stays the default; see tools/train_g2p.py.)"""
    heads = model.n_heads
    for word in ["blorptastic", "zyzzyva", "crystalline"]:
        cid = ng.encode_word(word)
        hyp_beam = ng.decode_phoneme_ids(
            ng.np_beam_decode(model.params, cid, 4, heads))
        hyp_greedy = ng.decode_phoneme_ids(
            ng.np_greedy_decode(model.params, cid, heads))
        assert hyp_beam, word
        assert all(p in VALID_TOKENS for p in hyp_beam)
        # beam with width 1 degenerates to greedy exactly
        hyp_b1 = ng.decode_phoneme_ids(
            ng.np_beam_decode(model.params, cid, 1, heads))
        assert hyp_b1 == hyp_greedy


def test_g2p_fallback_chain_uses_neural():
    g = G2P()
    assert g.neural is not None
    # pick an OOV that neither lexicon nor morphology resolves
    word = "zyzzyva"
    assert word not in g.lexicon and g._morph(word) is None
    assert g.word_to_phonemes(word) == g.neural.word_to_phonemes(word)
    # lexicon still wins for known words
    assert g.word_to_phonemes("about") == g.lexicon["about"]
    # neural=False restores the pure rule path
    g_rules = G2P(neural=False)
    assert g_rules.neural is None
    assert g_rules.word_to_phonemes(word) == letter_to_sound(word)


def test_g2p_full_sentence_valid():
    g = G2P()
    seq = g.text_to_sequence("The quixotic zyzzyva vocalized, 3 times!")
    assert len(seq) > 10
    assert all(isinstance(i, int) for i in seq)


def test_batched_greedy_decode_matches_numpy(model):
    """jax_batched_greedy_decode (the eval-tool fast path) reproduces the
    per-word numpy greedy decode token-for-token, including EOS-then-PAD
    tail semantics and per-row termination inside one batch."""
    words = [
        "parity", "checking", "zyzzyva", "cat", "a",
        "uncopyrightable", "blorptastic", "reminiscence", "ox",
    ]
    ids = np.stack([ng.encode_word(w) for w in words])
    rows = ng.jax_batched_greedy_decode(model.params, ids,
                                        n_heads=model.n_heads)
    assert rows.shape == (len(words), ng.MAX_PHON_LEN - 1)
    for w, row in zip(words, rows):
        np_out = ng.np_greedy_decode(model.params, ng.encode_word(w),
                                     model.n_heads)
        assert ng.decode_phoneme_ids(row) == ng.decode_phoneme_ids(np_out), w


def test_batched_greedy_decode_ensemble_matches_numpy(model):
    """Ensemble batched decode == per-word numpy ensemble decode.  A second
    'member' is the same weights perturbed, so the averaged-log-prob path is
    genuinely exercised (not the single-member shortcut)."""
    rng = np.random.default_rng(3)
    member2 = {k: v + rng.normal(0, 1e-3, v.shape).astype(np.float32)
               for k, v in model.params.items()}
    members = [model.params, member2]
    heads = [model.n_heads, model.n_heads]
    words = ["parity", "zyzzyva", "reminiscence", "ox"]
    ids = np.stack([ng.encode_word(w) for w in words])
    rows = ng.jax_batched_greedy_decode(members, ids, n_heads=heads)
    for w, row in zip(words, rows):
        np_out = ng.np_ensemble_greedy_decode(members, ng.encode_word(w),
                                              heads)
        assert ng.decode_phoneme_ids(row) == ng.decode_phoneme_ids(np_out), w


def test_resume_checkpoint_fingerprint(tmp_path):
    """A resume checkpoint written under one hyperparameter set must be
    refused — with a clear message — by a run with different flags, instead
    of crashing deep in unflatten or silently desyncing the LR/dropout
    streams (tools/train_g2p.py::_run_fingerprint)."""
    import argparse

    import jax.numpy as jnp
    from train_g2p import _load_resume, _run_fingerprint, _save_resume

    def args(**over):
        base = dict(d_model=32, d_ff=64, layers=1, heads=2, batch=8,
                    epochs=4, lr=1e-3, dropout=0.1, label_smoothing=0.0,
                    swa_frac=0.0, holdout=0.1, seed=0, init_seed=None)
        base.update(over)
        return argparse.Namespace(**base)

    params = {"w": jnp.ones((2, 3))}
    opt_state = {"m": jnp.zeros((2, 3))}
    path = tmp_path / "g2p.resume.npz"
    fp = _run_fingerprint(args())
    _save_resume(path, params, opt_state, None, 2, 10, 0, fingerprint=fp)

    # same flags: loads and restores counters bitwise
    p2, o2, swa, epoch, it, swa_n = _load_resume(
        path, params, opt_state, params, fingerprint=fp)
    assert (epoch, it, swa_n) == (2, 10, 0)
    assert np.array_equal(np.asarray(p2["w"]), np.ones((2, 3)))

    # changed model dims OR batch: refused with an explanatory error
    for changed in (args(d_model=64), args(batch=16), args(epochs=8)):
        with pytest.raises(SystemExit, match="REFUSING"):
            _load_resume(path, params, opt_state, params,
                         fingerprint=_run_fingerprint(changed))

    # legacy checkpoint without a fingerprint still loads (best effort)
    _save_resume(path, params, opt_state, None, 1, 5, 0)
    out = _load_resume(path, params, opt_state, params,
                       fingerprint=_run_fingerprint(args(d_model=64)))
    assert out[3] == 1

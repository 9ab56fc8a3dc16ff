"""Sentence-level homograph disambiguation (emotts/text/homograph.py).

The reference gets this capability from the pretrained SoundChoice G2P
(fastspeech2/util.py:20-27); the rebuild uses a curated homograph table plus
a deterministic context tagger.  These tests pin the table's well-formedness
and the tagger's behavior on the canonical contrast pairs.
"""

import pytest

from emotts.text.g2p import G2P
from emotts.text.homograph import H, THIRD_WAVE, resolve, resolve_word, words_of
from emotts.text.vocab import VALID_TOKENS


@pytest.fixture(scope="module")
def g2p():
    return G2P(neural=False)


def test_table_wellformed():
    valid = set(VALID_TOKENS)
    for word, entry in H.items():
        assert entry["d"] in entry, word
        for meta in ("ed", "det", "cue_tag"):
            if meta in entry:
                assert entry[meta] in entry, (word, meta)
        for tag, pron in entry.items():
            if tag in ("d", "next", "cues", "cue_tag", "er", "ed", "det"):
                continue
            phones = pron.split()
            assert all(p in valid for p in phones), (word, tag, phones)
            # exactly one primary stress per reading
            assert sum(p.endswith("1") for p in phones) == 1, (word, tag)
        if "cues" in entry:
            assert entry["cue_tag"] in entry, word


def test_third_wave_coverage():
    """The round-3 extension toward the full Wikipedia heteronym list:
    every enumerated word is in the table with >=2 phonemically distinct
    readings."""
    assert len(THIRD_WAVE) >= 55
    assert len(H) >= 150
    reading_tags = {"n", "v", "a", "past"}
    for word in THIRD_WAVE:
        entry = H.get(word)
        assert entry is not None, word
        readings = {t: p for t, p in entry.items() if t in reading_tags}
        assert len(set(readings.values())) >= 2, word


def test_defaults_match_lexicon(g2p):
    """No-context behavior is unchanged: default tag == lexicon entry."""
    for word, entry in H.items():
        if word in g2p.lexicon:
            assert entry[entry["d"]].split() == g2p.lexicon[word], word


@pytest.mark.parametrize(
    "text,expect",
    [
        # noun/verb stress alternation
        ("We need to record the show.", "R IH0 K AO1 R D"),
        ("She broke the world record.", "R EH1 K ER0 D"),
        ("She records a record.", "R IH0 K AO1 R D Z"),
        ("The records were lost.", "R EH1 K ER0 D Z"),
        ("Present the award now.", "P R IH0 Z EH1 N T"),
        ("A birthday present.", "P R EH1 Z AH0 N T"),
        ("I object to that.", "AH0 B JH EH1 K T"),
        ("A strange object appeared.", "AA1 B JH EH0 K T"),
        # tense homograph incl. passive
        ("I read the book.", "R IY1 D"),
        ("He has read the book.", "R EH1 D"),
        ("It was read aloud.", "R EH1 D"),
        # vowel-quality
        ("They live here.", "L IH1 V"),
        ("A live concert.", "L AY1 V"),
        ("Their lives were changed.", "L AY1 V Z"),
        ("He lives here.", "L IH1 V Z"),
        ("The wind blew.", "W IH1 N D"),
        ("Wind up the clock.", "W AY1 N D"),
        ("He wound up the clock.", "W AW1 N D"),
        ("The wound healed.", "W UW1 N D"),
        ("Lead pipes are toxic.", "L EH1 D"),
        ("They lead the way.", "L IY1 D"),
        ("Tears rolled down her cheek.", "T IH1 R Z"),
        ("He tears the paper.", "T EH1 R Z"),
        # voicing pairs
        ("Close the door.", "K L OW1 Z"),
        ("We are close to the end.", "K L OW1 S"),
        ("We use it.", "Y UW1 Z"),
        ("The use of force.", "Y UW1 S"),
        # -ate adjective vs verb
        ("A separate issue.", "S EH1 P ER0 AH0 T"),
        ("To separate them.", "S EH1 P ER0 EY2 T"),
        ("An estimate of the cost.", "EH1 S T AH0 M AH0 T"),
        ("We estimate the cost.", "EH1 S T AH0 M EY2 T"),
        ("A graduate student.", "G R AE1 JH UW0 AH0 T"),
        # copula → adjective reading
        ("He is content.", "K AH0 N T EH1 N T"),
        ("The content of the book.", "K AA1 N T EH0 N T"),
        ("Everyone is present.", "P R EH1 Z AH0 N T"),
        # second-wave entries
        ("We will resume the meeting.", "R IH0 Z UW1 M"),
        ("Send me your resume.", "R EH1 Z AH0 M EY2"),
        ("They offer a discount.", "D IH1 S K AW0 N T"),
        ("They discount the claims.", "D IH0 S K AW1 N T"),
        ("The proceeds go to charity.", "P R OW1 S IY0 D Z"),
        ("An attribute of success.", "AE1 T R AH0 B Y UW2 T"),
        ("It was attributed to him.", "AH0 T R IH1 B Y UW0 T AH0 D"),
        # noun-compound evidence: determiner two back
        ("A software upgrade.", "AH1 P G R EY2 D"),
        ("A tax increase.", "IH1 N K R IY2 S"),
        # det + content word after → adjective reading, not the noun
        ("A compact car.", "K AH0 M P AE1 K T"),
        # det-two-back must NOT override a following object (still a verb)
        ("The man records everything.", "R IH0 K AO1 R D Z"),
        # review-pass regressions: noun readings must survive a following
        # copula/adverb; -s forms never take a pluralized adjective
        ("Two minutes later he left.", "M IH1 N AH0 T S"),
        ("The content is great.", "K AA1 N T EH0 N T"),
        ("The contents were lost.", "K AA1 N T EH0 N T S"),
        ("The upset was huge.", "AH1 P S EH2 T"),
        ("He took the lead.", "L IY1 D"),
        ("Lead paint is toxic.", "L EH1 D"),
        ("The dove in the cage cooed.", "D AH1 V"),
        # irregular verb pasts: regular -ed belongs to the other reading
        ("He was winded after the sprint.", "W IH1 N D AH0 D"),
        ("The road was winding.", "W AY1 N D IH0 NG"),
        # third-wave entries: noun/verb stress
        ("Storms will impact the coast.", "IH0 M P AE1 K T"),
        ("The impact was severe.", "IH1 M P AE0 K T"),
        ("They plan to annex the region.", "AH0 N EH1 K S"),
        ("The annex was built last year.", "AE1 N EH2 K S"),
        ("Please update the software.", "AH0 P D EY1 T"),
        ("A software update.", "AH1 P D EY2 T"),
        ("We will segment the market.", "S EH0 G M EH1 N T"),
        ("A segment of the market.", "S EH1 G M AH0 N T"),
        ("They torment the prisoners.", "T AO0 R M EH1 N T"),
        ("The torment never ended.", "T AO1 R M EH2 N T"),
        ("An abstract idea.", "AE1 B S T R AE2 K T"),
        ("They recall the event.", "R IH0 K AO1 L"),
        ("A product recall.", "R IY1 K AO2 L"),
        ("An army of one ally.", "AE1 L AY0"),
        ("They ally themselves with us.", "AH0 L AY1"),
        # third-wave: determiner prefers adjective where flagged
        ("An invalid argument.", "IH0 N V AE1 L AH0 D"),
        ("The results were invalid.", "IH0 N V AE1 L AH0 D"),
        # third-wave: voicing pairs and -ate pairs
        ("They misuse the system.", "M IH0 S Y UW1 Z"),
        ("A misuse of power.", "M IH0 S Y UW1 S"),
        ("The light was diffuse.", "D IH0 F Y UW1 S"),
        ("We estimate it will diffuse slowly.", "D IH0 F Y UW1 Z"),
        ("A subordinate clause.", "S AH0 B AO1 R D AH0 N AH0 T"),
        ("The predicate of the sentence.", "P R EH1 D AH0 K AH0 T"),
        ("We will initiate the sequence.", "IH0 N IH1 SH IY0 EY2 T"),
        # third-wave: cue-driven (buffet the meal vs the battering)
        ("The breakfast buffet opens early.", "B AH0 F EY1"),
        ("Strong winds buffet the coast.", "B AH1 F AH0 T"),
    ],
)
def test_context_disambiguation(g2p, text, expect):
    out = " ".join(g2p(text))
    assert expect in out, f"{text!r} -> {out!r}"


def test_inflected_verb_stems(g2p):
    """ed/ing/er forms take the verb reading even without context — the
    plain morphology path would inherit the noun default."""
    assert g2p.word_to_phonemes("recorded") == \
        ["R", "IH0", "K", "AO1", "R", "D", "AH0", "D"]
    assert g2p.word_to_phonemes("recording") == \
        ["R", "IH0", "K", "AO1", "R", "D", "IH0", "NG"]
    assert g2p.word_to_phonemes("recorders") == \
        ["R", "IH0", "K", "AO1", "R", "D", "ER0", "Z"]
    assert g2p.word_to_phonemes("used") == ["Y", "UW1", "Z", "D"]
    # the short-stem guard still finds e-drop stems ('us'+'e' → use) but
    # never fires on 3-letter words
    assert resolve_word("used") == ["Y", "UW1", "Z", "D"]
    assert resolve_word("bed") is None and resolve_word("ring") is None
    # irregular-past routing and user-lexicon precedence
    assert resolve_word("teared") == ["T", "IH1", "R", "D"]
    assert resolve_word("leaded") == ["L", "EH1", "D", "AH0", "D"]
    assert g2p.word_to_phonemes("closing") == ["K", "L", "OW1", "Z", "IH0", "NG"]
    assert g2p.word_to_phonemes("separated") == \
        ["S", "EH1", "P", "ER0", "EY2", "T", "AH0", "D"]
    # comparative -er keeps the base (adjective) reading: no agentive flag
    assert resolve_word("closer") is None
    assert g2p.word_to_phonemes("closer") == ["K", "L", "OW1", "S", "ER0"]


def test_no_context_defers_to_lexicon():
    """Without contextual evidence, in-lexicon words resolve to None so the
    normal lookup chain (and its default) applies."""
    words = words_of("record")
    assert resolve(words, 0, in_lexicon=True) is None
    # out-of-lexicon homographs still get their default reading
    assert resolve(["alternate"], 0, in_lexicon=False) == \
        ["AO1", "L", "T", "ER0", "N", "AH0", "T"]


def test_non_homograph_untouched(g2p):
    assert resolve(["hello", "world"], 0, in_lexicon=True) is None
    assert resolve_word("walking") is None


def test_explain_tiers(g2p):
    rows = g2p.explain("We record unhappily.")
    assert [(w, t) for w, t, _ in rows] == [
        ("we", "lexicon"), ("record", "homograph"),
        ("unhappily", "morphology")]
    # explain() and __call__ are the same chain
    assert [p for _, _, ph in rows for p in ph] == g2p("We record unhappily.")


def test_g2p_cli_verb(capsys):
    from emotts.cli.main import main

    assert main(["g2p", "--text", "Close the door."]) == 0
    out = capsys.readouterr().out
    assert "homograph" in out and "K L OW1 Z" in out
    assert out.strip().splitlines()[-1].startswith("[g2p]")


# ---------------------------------------------------------------------------
# OOV POS-aware stress (the neural tier's context awareness)
# ---------------------------------------------------------------------------

from emotts.text.homograph import oov_pos, shift_disyllable_stress


def test_oov_pos_strong_evidence_only():
    assert oov_pos("we need to zembla the door".split(), 3) == "v"
    assert oov_pos("the zembla was heavy".split(), 1) == "n"
    # weak/no evidence abstains
    assert oov_pos("zembla arrived early".split(), 0) is None
    assert oov_pos("it was zembla".split(), 2) is None


def test_shift_disyllable_stress_rules():
    troch = ["Z", "EH1", "M", "B", "L", "AH0"]
    iamb = ["Z", "EH0", "M", "B", "L", "AH1"]
    assert shift_disyllable_stress(troch, "v") == iamb
    assert shift_disyllable_stress(iamb, "n") == troch
    # already-correct patterns untouched
    assert shift_disyllable_stress(iamb, "v") == iamb
    assert shift_disyllable_stress(troch, "n") == troch
    # non-disyllables untouched
    tri = ["B", "L", "AO0", "R", "P", "T", "AE1", "S", "T", "IH0", "K"]
    assert shift_disyllable_stress(tri, "v") == tri
    mono = ["D", "AO1", "G"]
    assert shift_disyllable_stress(mono, "v") == mono


def test_neural_oov_stress_follows_pos_context():
    g = G2P(neural=True)
    if g.neural is None:
        pytest.skip("bundled neural weights unavailable")
    rows_v = {w: (t, p) for w, t, p in g.explain("we need to zembla the door")}
    rows_n = {w: (t, p) for w, t, p in g.explain("the zembla was heavy")}
    tier_v, pron_v = rows_v["zembla"]
    tier_n, pron_n = rows_n["zembla"]
    assert tier_v == "neural" and tier_n == "neural"
    vowels_v = [p for p in pron_v if p[-1:] in "012"]
    vowels_n = [p for p in pron_n if p[-1:] in "012"]
    if len(vowels_v) == 2:  # guards against future weights changing syllables
        assert vowels_v[1].endswith("1"), pron_v   # verb context: iambic
        assert vowels_n[0].endswith("1"), pron_n   # noun context: trochaic

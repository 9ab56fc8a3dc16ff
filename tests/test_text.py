"""Text frontend tests: cleaners, numbers, vocab, G2P."""

import pytest

from emotts.text import (
    G2P,
    PAD_ID,
    VALID_TOKENS,
    clean_text,
    phoneme_to_sequence,
    sequence_to_phoneme,
    vocab_size,
)
from emotts.text.numbers import normalize_numbers, number_to_words


def test_vocab_layout():
    # reference layout: '@' pad + 84 ARPABET + 4 silence tokens = 89
    assert vocab_size() == 89
    assert VALID_TOKENS[0] == "@"
    assert PAD_ID == 0
    assert VALID_TOKENS[-4:] == ["sil", "spn", "sp", ""]
    # stressed vowels and consonants present
    for tok in ["AA", "AA0", "AA1", "AA2", "ZH", "B", "NG"]:
        assert tok in VALID_TOKENS


def test_phoneme_sequence_roundtrip():
    phones = ["HH", "AH0", "L", "OW1", "sp"]
    seq = phoneme_to_sequence(phones)
    assert sequence_to_phoneme(seq) == phones


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert number_to_words(1_000_000) == "one million"


def test_normalize_numbers():
    assert normalize_numbers("I have 2 cats") == "I have two cats"
    assert "nineteen eighty four" in normalize_numbers("born in 1984")
    assert "two dollars" in normalize_numbers("$2")
    assert "first" in normalize_numbers("1st place")
    assert "three point one four" in normalize_numbers("3.14")
    # commas stripped, then year-style reading (tacotron-cleaner convention)
    assert normalize_numbers("1,200") == "twelve hundred"


def test_english_cleaners():
    assert clean_text("Mr. Smith   has 2 cats.") == "mister smith has two cats."
    assert clean_text("Café") == "cafe"
    assert clean_text("DR. WHO") == "doctor who"


def test_g2p_rule_fallback():
    g2p = G2P()
    phones = g2p("hello world")
    assert len(phones) > 0
    assert all(p in VALID_TOKENS for p in phones)
    seq = g2p.text_to_sequence("hello world")
    assert all(isinstance(i, int) and 0 < i < vocab_size() for i in seq)


def test_g2p_lexicon(tmp_path):
    lex = tmp_path / "lexicon.dict"
    lex.write_text("HELLO  HH AH0 L OW1\nHELLO(2)  HH EH0 L OW1\nWORLD  W ER1 L D\n")
    g2p = G2P(str(lex))
    assert g2p.word_to_phonemes("hello") == ["HH", "AH0", "L", "OW1"]
    assert g2p("hello world") == ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]


def test_g2p_deterministic():
    g2p = G2P()
    text = "The quick brown fox jumps over 12 lazy dogs."
    assert g2p(text) == g2p(text)

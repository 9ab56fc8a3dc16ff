"""Sentence segmentation for long-form synthesis (emotts/text/segment.py)."""

from emotts.text.segment import split_sentences


def test_basic_split():
    assert split_sentences("Hello there. How are you? Fine!") == [
        "Hello there.", "How are you?", "Fine!",
    ]


def test_abbreviations_do_not_split():
    out = split_sentences("Mr. Smith met Dr. Jones. They talked.")
    assert out == ["Mr. Smith met Dr. Jones.", "They talked."]


def test_initials_do_not_split():
    out = split_sentences("J. R. Tolkien wrote it. It was long.")
    assert out == ["J. R. Tolkien wrote it.", "It was long."]


def test_decimals_do_not_split():
    out = split_sentences("It costs 3.50 dollars. Cheap!")
    assert out == ["It costs 3.50 dollars.", "Cheap!"]


def test_semicolons_and_multiple_punctuation():
    assert split_sentences("Wait; what?! Really...") == [
        "Wait;", "what?!", "Really...",
    ]


def test_trailing_text_without_punctuation():
    assert split_sentences("One sentence. and a tail") == [
        "One sentence.", "and a tail",
    ]


def test_quotes_after_punctuation():
    out = split_sentences('"Stop." He ran.')
    assert out == ['"Stop."', "He ran."]


def test_empty_and_whitespace():
    assert split_sentences("") == []
    assert split_sentences("   \n ") == []


def test_dotted_acronyms_do_not_split():
    assert split_sentences("The U.S. economy grew. Then it shrank.") == [
        "The U.S. economy grew.",
        "Then it shrank.",
    ]
    assert split_sentences("We met at 5 p.m. sharp. It was late.") == [
        "We met at 5 p.m. sharp.",
        "It was late.",
    ]


def test_pronoun_i_ends_sentence():
    # "I" is a pronoun here, not an initial — must split (review finding)
    assert split_sentences("So did I. Then we left.") == [
        "So did I.", "Then we left.",
    ]
    # genuine initials still merge
    assert split_sentences("J. R. Tolkien wrote. I agree.") == [
        "J. R. Tolkien wrote.", "I agree.",
    ]

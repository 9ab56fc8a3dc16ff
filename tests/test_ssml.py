"""SSML-lite parser tests (emotts/text/ssml.py)."""

import pytest

from emotts.text.ssml import Controls, SSMLError, parse_ssml


def test_plain_text_wraps():
    segs = parse_ssml("Hello world.")
    assert len(segs) == 1
    assert segs[0].kind == "text" and segs[0].text == "Hello world."
    assert segs[0].controls == Controls()


def test_spans_and_inheritance():
    segs = parse_ssml(
        '<speak>Intro. <voice name="bea"><emotion name="amused" level="2">'
        "Joyful bit.</emotion> Still bea.</voice> Outro.</speak>"
    )
    kinds = [(s.kind, s.text) for s in segs]
    assert kinds == [
        ("text", "Intro."), ("text", "Joyful bit."),
        ("text", "Still bea."), ("text", "Outro."),
    ]
    assert segs[0].controls == Controls()
    assert segs[1].controls.speaker == "bea"
    assert segs[1].controls.emotion == "amused"
    assert segs[1].controls.level == 2.0
    # the tail after </emotion> inherits only the <voice> scope
    assert segs[2].controls.speaker == "bea"
    assert segs[2].controls.emotion is None
    assert segs[3].controls == Controls()


def test_break_phoneme_prosody():
    segs = parse_ssml(
        'One.<break time="300ms"/><prosody rate="1.5">Fast.</prosody>'
        '<phoneme ph="T EH1 S T">ignored</phoneme><break time="0.5s"/>'
    )
    assert [s.kind for s in segs] == [
        "text", "break", "text", "phonemes", "break"]
    assert segs[1].seconds == pytest.approx(0.3)
    assert segs[2].controls.rate == 1.5
    assert segs[3].phonemes == ["T", "EH1", "S", "T"]
    assert segs[4].seconds == pytest.approx(0.5)


@pytest.mark.parametrize("bad", [
    "<speak><blink>x</blink></speak>",           # unknown tag
    '<speak><break time="soon"/></speak>',        # bad time
    '<speak><break time="5"/></speak>',           # unit is required
    '<speak><break time="."/></speak>',           # regex-pass float-fail
    '<speak><break time="120s"/></speak>',        # exceeds the 30s cap
    "<speak><phoneme>x</phoneme></speak>",        # missing ph
    '<speak><phoneme ph="HH QQ">x</phoneme></speak>',   # non-ARPABET token
    '<speak><phoneme ph="hh ah0">x</phoneme></speak>',  # lowercase
    '<speak><voice>x</voice></speak>',            # missing name
    "<speak>unclosed <voice name='a'>",           # malformed XML
    '<speak><prosody rate="fast">x</prosody></speak>',  # non-numeric rate
])
def test_errors(bad):
    with pytest.raises(SSMLError):
        parse_ssml(bad)


def test_nested_prosody_override():
    segs = parse_ssml(
        '<prosody rate="0.8">Slow <prosody rate="1.2">fast</prosody>'
        " slow again</prosody>"
    )
    assert [s.controls.rate for s in segs] == [0.8, 1.2, 0.8]


def test_namespaced_ssml_accepted():
    """Spec-conformant markup with the SSML xmlns parses normally."""
    segs = parse_ssml(
        '<speak xmlns="http://www.w3.org/2001/10/synthesis">'
        'Hi <break time="100ms"/>there.</speak>'
    )
    assert [s.kind for s in segs] == ["text", "break", "text"]

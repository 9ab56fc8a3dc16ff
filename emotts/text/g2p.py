"""Grapheme-to-phoneme frontend.

The reference uses the pretrained SpeechBrain ``soundchoice-g2p`` neural model
(fastspeech2/util.py:20-27, downloaded from HuggingFace).  In a hermetic TPU
deployment we instead use a **pronunciation lexicon** (CMUdict format — the
same lexicon family MFA aligns with, readme.md:57) with a deterministic
rule-based letter-to-sound fallback for out-of-vocabulary words.  The output
contract is identical: ARPABET tokens filtered to the model vocabulary.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional

from emotts.text.cleaners import clean_text
from emotts.text.vocab import filter_to_vocab, phoneme_to_sequence

_WORD_RE = re.compile(r"[a-z']+")

# ---------------------------------------------------------------------------
# Rule-based letter-to-sound fallback.
# Longest-match substring rules, applied left to right.  This is intentionally
# compact — the lexicon covers normal vocabulary; rules only catch OOVs.
# ---------------------------------------------------------------------------

_LTS_RULES: List[tuple] = [
    # multigraph rules first (longest match wins)
    ("tion", ["SH", "AH0", "N"]),
    ("sion", ["ZH", "AH0", "N"]),
    ("ought", ["AO1", "T"]),
    ("aught", ["AO1", "T"]),
    ("ight", ["AY1", "T"]),
    ("tch", ["CH"]),
    ("sch", ["S", "K"]),
    ("dge", ["JH"]),
    ("igh", ["AY1"]),
    ("eau", ["OW1"]),
    ("ais", ["EY1"]),
    ("ing", ["IH0", "NG"]),
    ("qu", ["K", "W"]),
    ("ch", ["CH"]),
    ("ck", ["K"]),
    ("sh", ["SH"]),
    ("th", ["TH"]),
    ("ph", ["F"]),
    ("wh", ["W"]),
    ("ng", ["NG"]),
    ("gh", ["G"]),
    ("kn", ["N"]),
    ("wr", ["R"]),
    ("ee", ["IY1"]),
    ("ea", ["IY1"]),
    ("oo", ["UW1"]),
    ("ou", ["AW1"]),
    ("ow", ["OW1"]),
    ("oi", ["OY1"]),
    ("oy", ["OY1"]),
    ("ay", ["EY1"]),
    ("ai", ["EY1"]),
    ("au", ["AO1"]),
    ("aw", ["AO1"]),
    ("ey", ["IY1"]),
    ("ie", ["IY1"]),
    ("oa", ["OW1"]),
    ("ue", ["UW1"]),
    ("ui", ["UW1"]),
    ("ar", ["AA1", "R"]),
    ("er", ["ER0"]),
    ("ir", ["ER1"]),
    ("or", ["AO1", "R"]),
    ("ur", ["ER1"]),
    ("a", ["AE1"]),
    ("b", ["B"]),
    ("c", ["K"]),
    ("d", ["D"]),
    ("e", ["EH1"]),
    ("f", ["F"]),
    ("g", ["G"]),
    ("h", ["HH"]),
    ("i", ["IH1"]),
    ("j", ["JH"]),
    ("k", ["K"]),
    ("l", ["L"]),
    ("m", ["M"]),
    ("n", ["N"]),
    ("o", ["AA1"]),
    ("p", ["P"]),
    ("r", ["R"]),
    ("s", ["S"]),
    ("t", ["T"]),
    ("u", ["AH1"]),
    ("v", ["V"]),
    ("w", ["W"]),
    ("x", ["K", "S"]),
    ("y", ["Y"]),
    ("z", ["Z"]),
    ("'", []),
]
_LTS_BY_LEN: List[tuple] = sorted(_LTS_RULES, key=lambda r: -len(r[0]))


def letter_to_sound(word: str) -> List[str]:
    """Deterministic rule-based fallback for OOV words."""
    word = word.lower()
    phones: List[str] = []
    i = 0
    while i < len(word):
        for pat, ph in _LTS_BY_LEN:
            if word.startswith(pat, i):
                # trailing silent 'e'
                if pat == "e" and i == len(word) - 1 and len(word) > 2:
                    i += 1
                    break
                phones.extend(ph)
                i += len(pat)
                break
        else:  # unknown character: skip
            i += 1
    return phones


class G2P:
    """Lexicon-first G2P with rule fallback.

    Output contract matches the reference ``text2phoneme``
    (fastspeech2/util.py:20-27): cleaned text → ARPABET tokens → filtered to
    the model vocabulary.
    """

    def __init__(self, lexicon_path: Optional[str] = None):
        self.lexicon: Dict[str, List[str]] = {}
        if lexicon_path:
            self.load_lexicon(lexicon_path)

    def load_lexicon(self, path: str) -> None:
        """Load a CMUdict-format lexicon: ``WORD  PH1 PH2 ...`` per line.

        Alternate pronunciations (``WORD(2)``) are ignored; the first wins.
        """
        for line in Path(path).read_text(errors="ignore").splitlines():
            line = line.strip()
            if not line or line.startswith(";;;"):
                continue
            parts = line.split()
            word = parts[0].lower()
            if "(" in word:  # alternate pronunciation
                continue
            self.lexicon[word] = parts[1:]

    def word_to_phonemes(self, word: str) -> List[str]:
        if word in self.lexicon:
            return list(self.lexicon[word])
        return letter_to_sound(word)

    def __call__(self, text: str) -> List[str]:
        text = clean_text(text, ["english_cleaners"])
        phones: List[str] = []
        for word in _WORD_RE.findall(text):
            phones.extend(self.word_to_phonemes(word))
        return filter_to_vocab(phones)

    def text_to_sequence(self, text: str) -> List[int]:
        """Reference ``text2sequence`` (fastspeech2/util.py:14-17)."""
        return phoneme_to_sequence(self(text))

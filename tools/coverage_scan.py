"""Token-coverage scan of the G2P chain over a broad word list.

The reference leans on a pretrained neural G2P for every word
(fastspeech2/util.py:20-27); this framework's chain is lexicon → morphology
→ neural → rule LTS, so synthesis quality hinges on how much everyday text
the *deterministic* tiers (lexicon+morphology — dictionary-exact by
construction) absorb before the neural fallback sees anything.

This tool measures that: for every word in a word list it reports which
tier resolves it.  The bundled list (emotts/text/data/wordlist_en.txt,
frequency-tiered general English + the literary register the cmuarctic
prompts draw from) is the hermetic default; pass --words / --corpus-index
to scan project text (e.g. a real cmuarctic.data index file or .lab
transcript directory) instead.

Run:
    python tools/coverage_scan.py            # bundled broad list
    python tools/coverage_scan.py --corpus-index /path/cmuarctic.data
    python tools/coverage_scan.py --show-gaps
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emotts.text.cleaners import clean_text
from emotts.text.g2p import G2P

BUNDLED_WORDLIST = str(
    Path(__file__).resolve().parent.parent
    / "emotts" / "text" / "data" / "wordlist_en.txt"
)

_WORD_RE = re.compile(r"[a-z']+")


def tokens_from_corpus_index(path: str):
    """cmuarctic.data-style index: ( arctic_a0001 "..." ) — or plain text."""
    toks = []
    for line in Path(path).read_text().splitlines():
        m = re.search(r'"(.*)"', line)
        text = m.group(1) if m else line
        toks.extend(_WORD_RE.findall(clean_text(text, ["english_cleaners"])))
    return toks


def classify(g2p: G2P, word: str) -> str:
    if word in g2p.lexicon:
        return "lexicon"
    if g2p._morph(word):
        return "morph"
    if g2p.neural is not None and g2p.neural.word_to_phonemes(word):
        return "neural"
    return "lts"


def scan(words, weighted=False):
    g2p = G2P()  # bundled lexicon + morphology + neural + rules
    counts: Counter = Counter()
    gaps = []
    uniq = Counter(words)
    for w, n in uniq.items():
        tier = classify(g2p, w)
        counts[tier] += n if weighted else 1
        if tier not in ("lexicon", "morph"):
            gaps.append((w, n, tier))
    total = sum(counts.values())
    det = counts["lexicon"] + counts["morph"]
    gaps.sort(key=lambda g: -g[1])
    return {
        "n_tokens": total,
        "n_unique": len(uniq),
        "by_tier": dict(counts),
        "deterministic_coverage": det / max(total, 1),
        "gaps": gaps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", default=BUNDLED_WORDLIST,
                    help="word list file (one word per line, # comments)")
    ap.add_argument("--corpus-index", default=None,
                    help="scan a cmuarctic.data index / transcript file "
                    "instead (token-weighted)")
    ap.add_argument("--show-gaps", action="store_true")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    if args.corpus_index:
        words = tokens_from_corpus_index(args.corpus_index)
        weighted, src = True, args.corpus_index
    else:
        words = [
            w.strip().lower()
            for w in Path(args.words).read_text().splitlines()
            if w.strip() and not w.startswith("#")
        ]
        weighted, src = False, args.words

    rep = scan(words, weighted=weighted)
    print(f"source: {src}")
    print(f"tokens: {rep['n_tokens']}  unique: {rep['n_unique']}")
    for tier in ("lexicon", "morph", "neural", "lts"):
        n = rep["by_tier"].get(tier, 0)
        print(f"  {tier:8s} {n:6d}  ({n / max(rep['n_tokens'], 1):6.2%})")
    print(f"deterministic (lexicon+morphology) coverage: "
          f"{rep['deterministic_coverage']:.2%}")
    if args.show_gaps:
        for w, n, tier in rep["gaps"]:
            print(f"  gap: {w} (x{n}, -> {tier})")
    if args.json_out:
        rep["gaps"] = [list(g) for g in rep["gaps"]]
        Path(args.json_out).write_text(json.dumps(rep, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Regenerate the golden wc/ii outputs for the reference's own corpus.

The reference repo's ONLY executable contract is `make test`
(makefile:12-22): run `client ./input/large/ wc` and `... ii` and
eyeball the output — no assertions, no goldens.  This script freezes
that contract: it recomputes, in pure Python with exact reference
semantics, what the Go engine writes for the checked-in copy of its
`input/small/` corpus (tests/golden/corpus_small/), and stores the
result as sorted `key: value` lines.  tests/test_reference_golden.py
then compares the Spark CLI's output byte-for-byte against these
files forever after.

Reference semantics reproduced here (independent of the Spark code —
this is the judge's second opinion, not a re-export of the engine):

* tokenizer: `strings.FieldsFunc(value, func(r) { return
  !unicode.IsLetter(r) })` (mapper.go:181, 194) — split on every rune
  whose Unicode category is not L*; case PRESERVED.  NOTE: this is
  deliberately NOT `\\w`-based — the corpus contains U+00BD (½,
  category No) and U+FFFD, which `\\w` keeps but IsLetter splits.
* wc reduce: integer sum of "1"s per word (reducer.go:159-170);
  sink line `word: count` (reducer.go:125).
* ii reduce: sort values, adjacent-dedup, strip the staged `input_`
  prefix (reducer.go:172-186, value[6:]); sink line
  `word: {n} f1,f2,...`.

Usage: python tools/make_reference_golden.py
"""

from __future__ import annotations

import os
import unicodedata
from collections import Counter, defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "..", "tests", "golden")
CORPUS_DIR = os.path.join(GOLDEN_DIR, "corpus_small")


def is_letter(ch: str) -> bool:
    """Go `unicode.IsLetter`: Unicode general category L*."""
    return unicodedata.category(ch).startswith("L")


def tokenize(text: str) -> list[str]:
    """strings.FieldsFunc(text, !IsLetter) — maximal letter runs."""
    words, cur = [], []
    for ch in text:
        if is_letter(ch):
            cur.append(ch)
        elif cur:
            words.append("".join(cur))
            cur = []
    if cur:
        words.append("".join(cur))
    return words


def main() -> None:
    files = sorted(os.listdir(CORPUS_DIR))
    wc: Counter = Counter()
    ii: defaultdict = defaultdict(set)
    for name in files:
        text = open(os.path.join(CORPUS_DIR, name), encoding="utf-8").read()
        for w in tokenize(text):
            wc[w] += 1
            ii[w].add(name)

    with open(os.path.join(GOLDEN_DIR, "wc_small.golden"), "w",
              encoding="utf-8") as f:
        for w in sorted(wc):
            f.write(f"{w}: {wc[w]}\n")

    with open(os.path.join(GOLDEN_DIR, "ii_small.golden"), "w",
              encoding="utf-8") as f:
        for w in sorted(ii):
            srcs = sorted(ii[w])  # reducer.go:175 sorts, then dedups
            f.write(f"{w}: {len(srcs)} {','.join(srcs)}\n")

    print(f"{len(wc)} distinct words over {len(files)} files")


if __name__ == "__main__":
    main()

"""Byte-for-byte golden parity against the reference's OWN corpus.

The reference ships its real inputs (`/root/reference/input/` —
Project Gutenberg books; makefile:12-22 `testwc`/`testii` over them is
its only executable "test").  A copy of `input/small/` is checked in
at tests/golden/corpus_small/, and tools/make_reference_golden.py
froze the expected `wc`/`ii` outputs (independent pure-Python
recompute of mapper.go:179-203 + reducer.go:159-186 semantics —
Unicode-letter tokenization, case preserved, sorted-distinct source
lists with the staged `input_` prefix stripped).

This pins reference parity FOREVER: any tokenizer/aggregation/sink
drift — including Unicode-class regressions the synthetic fixtures
can't see (the corpus contains ½, ⅔, U+FFFD, accented letters) —
fails a byte-level diff, not a recomputed approximation.
"""

from __future__ import annotations

import os
from pathlib import Path

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(HERE, "golden", "corpus_small")


def _job_lines(spark, tmp_path, fn: str) -> str:
    from grpc_map_reduce_spark.sinks import run_reference_job

    out_dir = str(tmp_path / f"golden_{fn}")
    run_reference_job(spark, CORPUS, fn, out_dir)
    lines: list[str] = []
    for f in Path(out_dir).glob("part-*"):
        lines += f.read_text(encoding="utf-8").splitlines()
    # the reference writes one unordered file per reducer; canonical
    # form on both sides is the key-sorted concatenation
    return "\n".join(sorted(lines)) + "\n"


def _golden(name: str) -> str:
    text = Path(HERE, "golden", name).read_text(encoding="utf-8")
    return "\n".join(sorted(text.splitlines())) + "\n"


def test_wc_golden_byte_parity(spark, tmp_path):
    assert _job_lines(spark, tmp_path, "wc") == _golden("wc_small.golden")


def test_ii_golden_byte_parity(spark, tmp_path):
    assert _job_lines(spark, tmp_path, "ii") == _golden("ii_small.golden")


def test_golden_corpus_is_the_reference_corpus():
    """The checked-in corpus must stay byte-identical to the
    reference's input/small/ (guards accidental re-encoding); skipped
    where the reference tree isn't mounted."""
    import pytest

    ref = "/root/reference/input/small"
    if not os.path.isdir(ref):
        pytest.skip("reference corpus not mounted")
    for name in sorted(os.listdir(CORPUS)):
        ours = Path(CORPUS, name).read_bytes()
        theirs = Path(ref, name).read_bytes()
        assert ours == theirs, f"{name} differs from the reference corpus"

"""BPE merge induction must exactly match a pure-Python reference
implementation (the repo's gate pattern for non-SQL-expressible ops):
same corpus word counts, same count-desc / lexicographic tie-break,
same merge application — the full merge table row-for-row."""

from __future__ import annotations

import re
from collections import Counter

from grpc_map_reduce_spark.operators.vocab import BPE_MERGES, bpe_merges
from grpc_map_reduce_spark.sources.tables import table

TOKEN_RE = re.compile(r"[^a-zA-Z]+")


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    out = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max count, ties broken lexicographically on (left, right)
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((rank, left, right, left + right, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return out


def test_bpe_merges_match_pure_python(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    wc: Counter = Counter()
    for r in docs.select("text").collect():
        for w in TOKEN_RE.split(r["text"].lower()):
            if w:
                wc[w] += 1
    want = _python_bpe(wc, BPE_MERGES)

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs).orderBy("rank").collect()
    ]
    assert got == want

    # the large-table path (per-round Spark loop) must produce the
    # identical merge table — force it past the driver-local gate
    got_dist = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, local_max_words=0).orderBy("rank").collect()
    ]
    assert got_dist == want


def test_bpe_encode_matches_pure_python(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    wc: Counter = Counter()
    for t in texts.values():
        for w in TOKEN_RE.split(t.lower()):
            if w:
                wc[w] += 1
    merges = _python_bpe(wc, BPE_MERGES)
    pairs = [(m[1], m[2]) for m in merges]

    def encode(word: str) -> int:
        syms = list(word)
        for left, right in pairs:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        return len(syms)

    want = {}
    for d, t in texts.items():
        ws = [w for w in TOKEN_RE.split(t.lower()) if w]
        n_tokens = sum(encode(w) for w in ws)
        want[d] = (len(ws), n_tokens, n_tokens * 10000 // len(ws))

    from grpc_map_reduce_spark.operators.vocab import (
        bpe_encode_stats,
        bpe_merges,
        doc_term_freqs,
    )

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_bp"])
        for r in bpe_encode_stats(doc_term_freqs(docs), bpe_merges(docs)).collect()
    }
    assert got == want

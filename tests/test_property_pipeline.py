"""Property-based checks (hypothesis) for the LLM training-prep
operators — sequence packing, decontamination, and passage chunking —
against independent pure-Python reconstructions on randomized corpora
(complementing the fixed-fixture DuckDB oracles)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
DOC = st.lists(WORD, min_size=0, max_size=30).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=15)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, texts):
    # two sources so the per-source partitioning is exercised
    data = [(i, t, f"src{i % 2}") for i, t in enumerate(texts)]
    return spark.createDataFrame(data, "doc_id long, text string, source string")


@given(texts=CORPUS)
@_SETTINGS
def test_pack_sequences_property(spark, texts):
    """Walking each source's docs in doc_id order with a running token
    total must reproduce every (seq_id, seq_off); offsets stay inside
    the budget; token counts are conserved."""
    from grpc_map_reduce_spark.operators.packing import pack_sequences

    budget = 16
    got = {
        r.doc_id: (r.source, r.n_tokens, r.seq_id, r.seq_off)
        for r in pack_sequences(_docs_df(spark, texts), seq_tokens=budget).collect()
    }
    assert len(got) == len(texts)

    by_source: dict[str, list] = {}
    for i, t in enumerate(texts):
        by_source.setdefault(f"src{i % 2}", []).append((i, t))
    for source, docs in by_source.items():
        running = 0
        for doc_id, text in sorted(docs):
            n = len([w for w in re.split(r"[^a-z]+", text.lower()) if w])
            want = (source, n, running // budget, running % budget)
            assert got[doc_id] == want, (doc_id, got[doc_id], want)
            assert 0 <= got[doc_id][3] < budget
            running += n


@given(texts=CORPUS)
@_SETTINGS
def test_decontaminate_property(spark, texts):
    """n_hits must equal the count of the train doc's distinct
    3-shingles present in the union of benchmark-doc shingles; the
    benchmark docs themselves never appear in the output."""
    from grpc_map_reduce_spark.operators.packing import decontaminate

    mod = 3  # every 3rd doc is "benchmark" so small corpora have both splits
    df = _docs_df(spark, texts)
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(df, bench_mod=mod, min_hits=2).collect()}

    def sh(text):
        ws = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
        if not ws:
            return set()
        if len(ws) <= 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    bench = set()
    for i, t in enumerate(texts):
        if i % mod == 0:
            bench |= sh(t)
    for i, t in enumerate(texts):
        if i % mod == 0:
            assert i not in got
            continue
        hits = len(sh(t) & bench)
        assert got[i] == (hits, hits >= 2), (i, got[i], hits)


@given(texts=CORPUS)
@_SETTINGS
def test_passage_chunks_property(spark, texts):
    """Chunks tile each doc's token list exactly: concatenating a
    doc's chunks in chunk_idx order reproduces its token sequence, and
    every chunk except possibly the last is full."""
    from grpc_map_reduce_spark.operators.udf_surface import passage_chunks

    rows = passage_chunks(spark, _docs_df(spark, texts)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_words))
    for i, t in enumerate(texts):
        ws = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        chunks = sorted(by_doc.get(i, []))
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        rebuilt = [w for _, text, _ in chunks for w in text.split()]
        assert rebuilt == ws, (i, rebuilt, ws)
        for idx, (_, text, n) in enumerate(chunks):
            assert n == len(text.split())
            if idx < len(chunks) - 1:
                assert n == 10


@given(texts=CORPUS)
@_SETTINGS
def test_strip_boilerplate_property(spark, texts):
    """A pure-Python walk — segment every doc into SEG_WORDS-word
    units, mark units appearing in ≥2 distinct docs, strip them —
    must reproduce every count and the cleaned-text md5."""
    import hashlib

    from grpc_map_reduce_spark.operators.web import SEG_WORDS, strip_boilerplate

    got = {
        r.doc_id: (r.n_segs, r.n_removed, r.n_kept, r.cleaned_md5)
        for r in strip_boilerplate(_docs_df(spark, texts)).collect()
    }

    seg_lists = {}
    for i, t in enumerate(texts):
        ws = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
        if ws:
            seg_lists[i] = [
                " ".join(ws[j : j + SEG_WORDS])
                for j in range(0, len(ws), SEG_WORDS)
            ]
    df_count: dict[str, set] = {}
    for i, segs in seg_lists.items():
        for s in set(segs):
            df_count.setdefault(s, set()).add(i)
    boiler = {s for s, docs in df_count.items() if len(docs) >= 2}

    assert set(got) == set(seg_lists)
    for i, segs in seg_lists.items():
        kept = [s for s in segs if s not in boiler]
        want = (
            len(segs),
            len(segs) - len(kept),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
        assert got[i] == want, (i, got[i], want)

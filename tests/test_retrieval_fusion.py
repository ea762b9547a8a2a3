"""Containment dedup and hybrid-RRF fusion semantics.

Planted-fixture checks (synthesized in-session DataFrames, not the
driver parquet) so the *semantics* are pinned independently of what
pairs happen to exist at a given scale factor:

  * a short doc fully contained in a long one must score containment
    1.0 in the short→long direction even though its Jaccard is low —
    the exact shape the symmetric near-dup operators miss;
  * RRF must fuse ranks (not scores), handle single-leg docs, and
    respect the (rrf desc, doc_id) tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.dedup import (
    containment_pairs,
    lsh_near_dup,
)
from grpc_map_reduce_spark.operators.retrieval import RRF_K, hybrid_rrf
from grpc_map_reduce_spark.sources.tables import table


def test_containment_catches_planted_subset(spark):
    base = " ".join(f"w{i} common{i % 7} token{i}" for i in range(40))
    long_doc = base + " " + " ".join(f"extra{i} pad{i} fill{i}" for i in range(160))
    rows = [
        (1, long_doc),
        (2, base),  # fully contained in doc 1
        (3, " ".join(f"other{i} unrelated{i}" for i in range(50))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) in got
    ca, cb = got[(1, 2)]
    # doc 2's shingles are a subset of doc 1's: containment(2→1)=1.0,
    # while 1→2 is the small size ratio.
    assert cb == 1.0
    assert ca < 0.5

    # ...and the same pair is invisible to symmetric Jaccard at any
    # near-dup-ish threshold (that's the point of the operator).
    jac = {
        (r.doc_a, r.doc_b)
        for r in lsh_near_dup(docs, threshold=0.5).collect()
    }
    assert (1, 2) not in jac


def test_containment_is_subset_of_candidates(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = containment_pairs(docs).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert max(r.cont_a_in_b, r.cont_b_in_a) >= 0.5
        assert r.n_common >= 1


def test_hybrid_rrf_fuses_ranks(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    rows = hybrid_rrf(docs, emb, ["join", "hash", "scan"]).collect()
    assert rows, "hybrid RRF returned nothing"
    # rank column is a contiguous 1..n permutation ordered by score
    ranks = [r.rank for r in sorted(rows, key=lambda r: r.rank)]
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0.0
        if r.r_text > 0:
            expect += 1.0 / (RRF_K + r.r_text)
        if r.r_vec > 0:
            expect += 1.0 / (RRF_K + r.r_vec)
        assert abs(r.rrf - round(expect, 6)) < 1e-9
        # absent legs are encoded as 0, never null (driver hash contract)
        assert r.r_text is not None and r.r_vec is not None
    # fused list must actually mix legs at the fixture scale: at least
    # one doc per leg-presence class would be ideal, but guarantee the
    # weaker invariant that both legs contribute somewhere.
    assert any(r.r_text > 0 for r in rows)
    assert any(r.r_vec > 0 for r in rows)

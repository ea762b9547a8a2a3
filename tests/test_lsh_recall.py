"""Property checks for the approximate near-dup scale path: the LSH
candidate set must recover a healthy fraction of the exact-Jaccard
pairs (recall), and the composed pipeline must be a subset of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.dedup import (
    lsh_near_dup,
    minhash_candidates,
    ngram_jaccard_pairs,
)
from grpc_map_reduce_spark.sources.tables import table


def test_lsh_near_dup_subset_and_recall(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.05)
    composed = lsh_near_dup(docs, threshold=0.05)

    exact_pairs = {(r.doc_a, r.doc_b) for r in exact.collect()}
    composed_pairs = {(r.doc_a, r.doc_b) for r in composed.collect()}

    assert composed_pairs <= exact_pairs, "LSH+rescore must be a subset of exact"
    if exact_pairs:
        recall = len(composed_pairs) / len(exact_pairs)
        # 2-row bands on ~0.05+ Jaccard: modest but nonzero recall;
        # this guards against a broken banding join, not LSH theory.
        assert recall > 0.05, f"LSH recall collapsed: {recall}"


def test_minhash_candidates_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = sorted((r.doc_a, r.doc_b, r.n_bands) for r in minhash_candidates(docs).collect())
    b = sorted((r.doc_a, r.doc_b, r.n_bands) for r in minhash_candidates(docs).collect())
    assert a == b and len(a) > 0

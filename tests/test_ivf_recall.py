"""Property checks for the IVF approximate-nearest-neighbor scale
path: results must be well-formed, deterministic, a subset of the
corpus, and recall a healthy fraction of the exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.similarity import cosine_topk, ivf_topk
from grpc_map_reduce_spark.sources.tables import table


def _topk_sets(df, k=10):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(cosine_topk(emb, queries))
    approx = _topk_sets(ivf_topk(emb, queries, n_lists=8, n_probe=4))

    assert set(approx) == set(exact), "every query must return results"
    recalls = [
        len(approx[q] & exact[q]) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    # probing half the lists of a random-ish corpus: recall well above
    # the n_probe/n_lists floor; guards the index plumbing, not theory.
    assert mean_recall >= 0.6, f"IVF recall collapsed: {mean_recall}"


def test_ivf_full_probe_is_exact(spark, sf_dir):
    """Probing every list = brute force: must equal the exact top-k."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    exact = _topk_sets(cosine_topk(emb, queries))
    full = _topk_sets(ivf_topk(emb, queries, n_lists=8, n_probe=8))
    assert full == exact


def test_ivf_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, ivf_topk(emb, q).collect()))
    b = sorted(map(tuple, ivf_topk(emb, q).collect()))
    assert a == b and len(a) > 0

"""Similarity search over the ``embeddings`` table (extension E2 —
SURVEY.md §2.2): brute-force cosine top-k as the oracle-checkable
baseline; LSH/IVF variants are the scale path (registered rows-only).

Scale design: the query set is broadcast (it is small by definition);
candidates stream through a narrow projection, so the plan is
scan → broadcast nested loop → per-partition partial top-k →
final top-k.  No shuffle of the full candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grpc_map_reduce_spark.sources.tables import table


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each query vector, the top-``k`` most-similar corpus rows.

    Output: ``(query_id, neighbor_id, sim, rank)`` with ``sim`` rounded
    to 6 dp and rank tie-broken by neighbor id, so results are
    deterministic and engine-portable.
    """
    # Pre-normalize each side once per ROW (not once per pair): cosine
    # then reduces to a single dot product in the pair loop.  For k
    # queries × n corpus rows this turns 3(n·k) fold expressions into
    # n + k normalizations and n·k dots.
    def _unit(v):
        norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.transform(v, lambda x: x / norm)

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(vec_d).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _unit(vec_d).alias("c_vec")
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with("q_vec", "c_vec", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 8))


# DuckDB twin: parallel unnest zips the two embedding lists; products
# are summed in double precision, so round(·, 6) agrees with Spark's
# double fold despite differing accumulation order (64 dims → error
# ~1e-15 relative).
ORACLE_COSINE_TOPK = """
WITH pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(unnest(q.embedding) AS DOUBLE) AS qe,
           CAST(unnest(c.embedding) AS DOUBLE) AS ce
    FROM embeddings q
    JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 8
),
sims AS (
    SELECT query_id, neighbor_id,
           round(sum(qe * ce) / (sqrt(sum(qe * qe)) * sqrt(sum(ce * ce))), 6) AS sim
    FROM pairs GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM sims
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 10
"""


# --------------------------------------------------------------------------
def embedding_near_dup(corpus: DataFrame, threshold: float = 0.4,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine similarity ≥ threshold — the
    embedding-space analog of near-dup detection.

    This is the exact O(n²) formulation (the oracle baseline).  At
    100 TB-scale vector counts the same output is produced by the
    LSH-bucketed path (:func:`lsh_bucket_candidates` + exact rescore
    of candidates only); this operator stays as the rescoring kernel.
    """

    def _unit(v):
        vd = F.transform(v, lambda x: x.cast("double"))
        norm = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.transform(vd, lambda x: x / norm)

    a = corpus.select(F.col(id_col).alias("id_a"), _unit(F.col(vec_col)).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), _unit(F.col(vec_col)).alias("vb"))
    sim = F.round(
        F.aggregate(
            F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        ),
        6,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup(table(spark, sf_dir, "embeddings"))


ORACLE_NEAR_DUP = """
WITH pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(unnest(a.embedding) AS DOUBLE) AS ae,
           CAST(unnest(b.embedding) AS DOUBLE) AS be
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
),
sims AS (
    SELECT id_a, id_b,
           round(sum(ae * be) / (sqrt(sum(ae * ae)) * sqrt(sum(be * be))), 6) AS sim
    FROM pairs GROUP BY 1, 2
)
SELECT id_a, id_b, sim FROM sims WHERE sim >= 0.4
"""


QUERIES = [
    ("ann_cosine_topk", q_cosine_topk, ORACLE_COSINE_TOPK,
     "E2 similarity search: brute-force cosine top-k (oracle baseline)."),
    ("embedding_near_dup", q_embedding_near_dup, ORACLE_NEAR_DUP,
     "E2 embedding-cosine near-dup pairs above a similarity threshold."),
]

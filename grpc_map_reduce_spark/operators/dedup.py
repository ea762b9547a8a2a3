"""Deduplication operators over the ``documents`` corpus (extension E1
and the near-dup half of E2 — SURVEY.md §2.2).

Scale design:
  * Exact dedup is a hash aggregation on the dedup key — map-side
    partial keeps shuffle volume at O(distinct keys).  At 100 TB,
    group on a fixed-width digest (xxhash64/md5 of the text), never
    on the raw text bytes, so shuffle rows are ~16 B not ~10 KB.
  * N-gram Jaccard similarity join uses the inverted-index trick:
    explode distinct shingles, self-join on the shingle, count
    common shingles per pair.  Shuffle is on the shingle key; a
    hot shingle (appearing in many docs) quadratically blows up the
    pair count, so real corpora drop stop-shingles above a document
    frequency cap first (``max_df``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grpc_map_reduce_spark.functions.text import distinct_shingles_udf, shingles
from grpc_map_reduce_spark.sources.tables import table


# --------------------------------------------------------------------------
# E1: exact dedup.  Representative row = min(doc_id) per identical text.
def dedup_exact(docs: DataFrame, key_col: str = "text") -> DataFrame:
    """Group identical ``key_col`` payloads → keeper id + copy count.

    At scale, substitute ``F.xxhash64(key_col)`` as the grouping key
    (collision-checked) to keep shuffle rows fixed-width; fixtures are
    small enough to group on the raw text.
    """
    return (
        docs.groupBy(key_col)
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(table(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents
GROUP BY text
"""


# --------------------------------------------------------------------------
# E2 (exact-arithmetic near-dup): word-3-gram Jaccard similarity join.
def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.008,
                        max_df: int | None = None) -> DataFrame:
    """Document pairs (doc_a < doc_b) with shingle-Jaccard ≥ threshold.

    ``max_df`` drops shingles present in more than that many docs
    before the self-join (stop-shingle guard for skew at scale); the
    oracle-checked configuration leaves it off.
    """
    # Per-doc shingle set size is computed BEFORE the explode and
    # carried on every exploded row, so the pair sizes (na, nb) ride
    # along through the self-join for free — one shuffle join + one
    # aggregation total, instead of joining a separate sizes table
    # twice afterwards (3 shuffle joins).  The duplicated column costs
    # 8 bytes/row on the shuffle; the avoided joins cost two full
    # shuffles of the pair set.
    # Shingling runs as a vectorized Arrow UDF *after* a repartition:
    # the exchange spreads the work across all cores (the corpus
    # arrives as a handful of large parquet files), and the UDF is a
    # single ArrowEvalPython node evaluated once per row — the Column-
    # expression alternative gets duplicated by Catalyst into inferred
    # filters/generator projections and re-runs the tokenizer per
    # slice (measured ~10× slower at sf0.1; see functions.text).
    spark = docs.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(n_part, "doc_id")
        .select("doc_id", distinct_shingles_udf(n)("text").alias("sh_set"))
        .select(
            "doc_id",
            F.size("sh_set").alias("n_shingles"),
            F.explode("sh_set").alias("shingle"),
        )
    )
    if max_df is not None:
        hot = (
            sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df).select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(table(spark, sf_dir, "documents"))


# DuckDB twin: same shingling (1-based inclusive list slice ws[i:i+2]
# == Spark slice(ws, i, 3)), same join, same rounded Jaccard.
ORACLE_NGRAM_JACCARD = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '') AS ws
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' ')
           )) AS shingle
    FROM toks
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) >= 0.008
"""


QUERIES = [
    ("dedup_exact", q_dedup_exact, ORACLE_DEDUP_EXACT,
     "E1 exact dedup: keeper id + copy count per identical text."),
    ("dedup_ngram_jaccard", q_ngram_jaccard, ORACLE_NGRAM_JACCARD,
     "E2 near-dup: word-3-gram Jaccard similarity self-join."),
]

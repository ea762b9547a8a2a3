"""The composed corpus-prep pipeline: exact dedup → quality filter →
stratified sample, as ONE declarative dataflow.

Individually-tested operators are necessary but not sufficient — a
training-data engine is used as a PIPELINE, and this query proves the
pieces compose without materialization barriers: Catalyst fuses the
dedup window, the map-only quality scoring, and the map-only sample
filter into a single plan with exactly one shuffle (the dedup
window's partition-by-text).  Deterministic end to end (hash-based
sampling, integer basis-point scores), so the whole pipeline is
DuckDB-oracle-checked — the composition itself is under test, not
just the stages.

Stage order matters at scale and mirrors production practice:
  1. exact dedup FIRST — cheapest per-byte, and shrinking the corpus
     makes every later stage cheaper;
  2. quality filter — map-only column math on the survivors;
  3. stratified sample LAST — rates are chosen against the cleaned
     distribution, not the raw crawl's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.sampling import (
    SAMPLE_RATES,
    _rates_case_sql,
    stratified_sample,
)
from grpc_map_reduce_spark.operators.text_analysis import quality_scores
from grpc_map_reduce_spark.sources.tables import table

#: Minimum composite quality score (basis points) — keeps ~66 % of the
#: fixture corpus (probed at sf0.01: median 7040, p25 6124).
QUALITY_MIN_BP = 6500


def corpus_prep(docs: DataFrame) -> DataFrame:
    """documents → training-ready (doc_id, lang, n_words, quality_bp)."""
    w = Window.partitionBy("text").orderBy("doc_id")
    kept = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    scored = quality_scores(kept).filter(F.col("quality_bp") >= QUALITY_MIN_BP)
    sampled = stratified_sample(scored, SAMPLE_RATES, strata_col="lang",
                                id_col="doc_id")
    return sampled.select("doc_id", "lang", "n_words", "quality_bp")


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_prep(table(spark, sf_dir, "documents"))


ORACLE_CORPUS_PREP = rf"""
WITH keeps AS (
    SELECT doc_id, lang, text
    FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
),
f AS (
    SELECT doc_id,
           lang,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           w -> w <> ''))                                AS n_words,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
               w -> list_contains(['the','a','of','and','to','in','is','on','for','with'], w)))
                                                                         AS n_stop,
           len(regexp_extract_all(text, '[^\w\s]'))                      AS n_punct,
           length(text)                                                  AS n_chars
    FROM keeps
),
scored AS (
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(floor((0.4 * least(n_words / 100.0, 1.0)
               + 0.3 * least((n_stop * 1.0 / n_words) * 10, 1.0)
               + 0.3 * (1 - least((n_punct * 1.0 / n_chars) * 5, 1.0))) * 10000)
               AS BIGINT) AS quality_bp
    FROM f
)
SELECT doc_id, lang, n_words, quality_bp
FROM scored
WHERE quality_bp >= {QUALITY_MIN_BP}
  AND (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)
      < {_rates_case_sql()}
"""


QUERIES = [
    ("pipeline_corpus_prep", q_corpus_prep, ORACLE_CORPUS_PREP,
     "Composed corpus-prep pipeline: exact dedup -> quality filter -> "
     "stratified sample, one fused plan."),
]

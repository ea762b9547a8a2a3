"""Deterministic stratified sampling — the corpus-shaping operators a
training-data pipeline runs between dedup and tokenization (extension
E5 posture; no reference equivalent — its pipeline is a single
map→shuffle→reduce pass, master.go:112-234).

Both operators are hash-deterministic (md5-derived, like sketches.py /
dedup.py), NOT pseudo-random: re-runs, engine ports, and corpus
re-shards reproduce the identical sample, and the DuckDB oracle checks
them bit-for-bit.  Spark's built-in ``sampleBy`` draws from a seeded
RNG whose stream is engine- and partitioning-specific — fine for
one-off stats, wrong for a reproducible training corpus.

  * ``stratified_sample`` — per-stratum KEEP RATES (e.g. downweight
    English, keep all low-resource languages).  Map-only: one hash
    comparison per row, zero shuffle at any scale; the rate table
    rides along as a literal CASE expression.
  * ``balanced_downsample`` — per-stratum CAP (at most N docs per
    language), taken as the N lowest hash values per stratum —
    deterministic "random" choice without an RNG.  One shuffle on the
    stratum key; per-stratum ordering is the same window machinery as
    topk_per_group, so a hot stratum is bounded by the window sort,
    not a driver collect.  At 100 TB with mega-strata, pre-filter
    with ``stratified_sample`` at ~cap/stratum_count before the exact
    window pass (two-stage: cheap map-only cut, then exact cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.sketches import _md5_long
from grpc_map_reduce_spark.sources.tables import table

#: Per-language keep rates (percent) — downsample the head language,
#: keep the tail whole: the standard corpus-balancing move.
SAMPLE_RATES = {"en": 40, "zh": 80, "es": 80}
SAMPLE_DEFAULT_RATE = 100

#: Per-language cap for the balanced variant.
BALANCE_CAP = 60


def stratified_sample(df: DataFrame, rates: dict[str, int] | None = None,
                      default_rate: int = SAMPLE_DEFAULT_RATE,
                      strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Rows whose hash bucket falls under their stratum's keep rate.

    ``rates`` maps stratum value → keep percent (0-100); unlisted
    strata keep ``default_rate``.  Bucket = md5(id) mod 100, so
    membership is a pure function of the row id — stable across runs
    and engines.
    """
    rates = SAMPLE_RATES if rates is None else rates
    bucket = _md5_long(F.col(id_col).cast("string")) % 100
    rate = F.lit(default_rate)
    for stratum, pct in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def balanced_downsample(df: DataFrame, cap: int = BALANCE_CAP,
                        strata_col: str = "lang",
                        id_col: str = "doc_id") -> DataFrame:
    """At most ``cap`` rows per stratum: the ``cap`` lowest md5 hashes
    (ties broken by id → fully deterministic).  Adds ``sample_rank``
    (1-based position within the stratum's kept set)."""
    h = _md5_long(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= cap)
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = stratified_sample(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "lang", "source")


def _rates_case_sql() -> str:
    whens = "\n         ".join(
        f"WHEN lang = '{s}' THEN {p}" for s, p in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_DEFAULT_RATE} END"


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)
      < {_rates_case_sql()}
"""


def q_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = balanced_downsample(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "lang", "sample_rank")


ORACLE_BALANCED_DOWNSAMPLE = f"""
SELECT doc_id, lang, sample_rank
FROM (
    SELECT doc_id, lang,
           CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id
           ) AS BIGINT) AS sample_rank
    FROM documents
)
WHERE sample_rank <= {BALANCE_CAP}
"""


QUERIES = [
    ("docs_stratified_sample", q_stratified_sample, ORACLE_STRATIFIED_SAMPLE,
     "Deterministic per-stratum keep-rate sampling (map-only, zero shuffle)."),
    ("docs_balanced_downsample", q_balanced_downsample, ORACLE_BALANCED_DOWNSAMPLE,
     "Deterministic per-stratum cap via lowest-hash window rank."),
]

"""Text-analysis operators over ``documents`` (extension E3 —
SURVEY.md §2.2): per-document statistics, token counting, a
deterministic language-ID heuristic, and content fingerprinting.

All expressions are JVM-side Column math (no Python UDFs) — at 100 TB
these are embarrassingly parallel map-only plans with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grpc_map_reduce_spark.functions.text import words
from grpc_map_reduce_spark.sources.tables import table

#: Tiny English stopword list used by the quality/language heuristics.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


# --------------------------------------------------------------------------
def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document size/shape statistics (quality-scoring features)."""
    ws = words("text")
    word_lens = F.transform(ws, lambda w: F.length(w).cast("double"))
    total_word_chars = F.aggregate(word_lens, F.lit(0.0), lambda acc, x: acc + x)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_uniq_words"),
        F.round(total_word_chars / F.size(ws), 4).alias("avg_word_len"),
        F.array_max(F.transform(ws, lambda w: F.length(w).cast("long"))).alias("max_word_len"),
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_stats(table(spark, sf_dir, "documents"))


ORACLE_DOC_STATS = """
WITH toks AS (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '') AS ws
    FROM documents
)
SELECT
    doc_id,
    CAST(length(text) AS BIGINT)          AS n_chars_calc,
    CAST(len(ws) AS BIGINT)               AS n_words,
    CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq_words,
    round(list_sum(list_transform(ws, w -> CAST(length(w) AS DOUBLE))) / len(ws), 4)
                                          AS avg_word_len,
    CAST(list_max(list_transform(ws, w -> length(w))) AS BIGINT) AS max_word_len
FROM toks
"""


# --------------------------------------------------------------------------
def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single punctuation marks)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .cast("long")
        .alias("bpe_tokens"),
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(table(spark, sf_dir, "documents"))


ORACLE_TOKEN_COUNTS = r"""
SELECT
    doc_id,
    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        AS bpe_tokens
FROM documents
"""


# --------------------------------------------------------------------------
def lang_id_scores(docs: DataFrame) -> DataFrame:
    """Deterministic language-ID heuristic: share of tokens that are
    common English stopwords.  (A real n-gram model would be trained;
    this keeps the operator oracle-checkable.)"""
    ws = words("text")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    score = F.round(n_stop / F.size(ws), 4)
    return docs.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        (score > 0.03).alias("looks_en"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id_scores(table(spark, sf_dir, "documents"))


ORACLE_LANG_ID = """
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> '') AS ws
    FROM documents
)
SELECT
    doc_id, lang,
    round(len(list_filter(ws, w -> list_contains(
        ['the','a','of','and','to','in','is','on','for','with'], w))) * 1.0 / len(ws), 4)
        AS en_score,
    round(len(list_filter(ws, w -> list_contains(
        ['the','a','of','and','to','in','is','on','for','with'], w))) * 1.0 / len(ws), 4)
        > 0.03 AS looks_en
FROM toks
"""


# --------------------------------------------------------------------------
def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of the normalized token stream.

    Collapses whitespace/punctuation variation, so it is the exact-dup
    key for "same words, different formatting" — one digest per doc,
    16 bytes on the shuffle regardless of document size.
    """
    norm = F.concat_ws(" ", words("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(table(spark, sf_dir, "documents"))


ORACLE_FINGERPRINTS = """
SELECT doc_id,
       md5(array_to_string(
           list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> w <> ''),
           ' ')) AS fingerprint
FROM documents
"""


QUERIES = [
    ("doc_stats", q_doc_stats, ORACLE_DOC_STATS,
     "E3 per-document size/shape statistics."),
    ("token_counts", q_token_counts, ORACLE_TOKEN_COUNTS,
     "E3 whitespace + BPE-ish regex token counting."),
    ("lang_id", q_lang_id, ORACLE_LANG_ID,
     "E3 deterministic stopword-ratio language heuristic."),
    ("doc_fingerprints", q_fingerprints, ORACLE_FINGERPRINTS,
     "E3 md5 fingerprint of the normalized token stream."),
]

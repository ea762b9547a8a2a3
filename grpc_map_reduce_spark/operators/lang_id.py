"""Character-n-gram language identification — extension E3 (the
mandate's "language-ID (n-gram heuristic)" item).

Cavnar-Trenkle-style profile classification, reduced to integer
arithmetic so the output is byte-stable across engines: a language's
profile is its top-K most frequent character trigrams (learned from
the labeled corpus itself — train and classify in one dataflow), and
a document's score for a language is the number of its trigram
OCCURRENCES that appear in that language's profile.  Argmax with a
deterministic (score desc, lang desc) tie-break picks the prediction.
No floats anywhere — rank-distance and log-likelihood variants exist,
but integer hit-count scoring is hash-checkable and order-free.

The reference engine has no analysis beyond word counting; this is
pure extension surface over its document corpus, same tokenization
spirit as the wc job (mapper.go:170-190).

Scale design (reworked in round 6 — the 125× probe crashed the
previous shape):
  * The profile table is ``n_langs × K`` rows — broadcast, so the
    corpus-side trigram stream never shuffles for the probe.
  * TWO independent map-only trigram explodes, one per pass, sharing
    NOTHING materialized.  Through round 5 the passes shared one
    ``groupBy(doc_id, lang, tg)`` shuffle via a pinned
    localCheckpoint — but that table is O(corpus) and the pin is what
    the capped-heap scale probe crashed on at 125× data
    (UNABLE_TO_ACQUIRE_MEMORY at 8 GiB: linear-in-corpus storage
    blocks squeezing execution memory; peak heap measured 1.4 / 3.8 /
    7.3 GiB at 1× / 5× / 25×).  Recomputing the explode is map-only
    CPU; the rework also DELETES the corpus-sized (doc_id, tg)
    shuffle entirely:
      - profile pass: trigrams → partial-agg groupBy(lang, tg) —
        shuffle bounded by partitions × trigram vocabulary;
      - classify pass: trigrams → broadcast profile join (inner) →
        groupBy(doc_id, cand_lang) — map-side combine bounds the
        shuffle by docs × langs, never docs × trigrams.
  * The final argmax is ``max(struct(score, lang))`` — an aggregate,
    not a window, so no extra sort; the tie-break (max ⇒ lang DESC
    among equal scores) is mirrored in the oracle's
    ``ORDER BY score DESC, cand_lang DESC``.
  * Docs with fewer than 3 characters produce no trigrams and fall
    out of the scoring stream; the final left join from the pruned
    2-column docs scan restores them with ``pred_lang='und'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grpc_map_reduce_spark.sources.tables import spread, table

#: Profile size: top-K trigrams per language.
LANG_PROFILE_K = 32

#: Identical trigram extraction on both engines: all length-3 char
#: windows of lower(text).
_TG = "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"


def _trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, tg) — one row per trigram occurrence."""
    return (
        spread(docs).filter(F.length("text") >= 3)
        .select("doc_id", "lang", F.lower("text").alias("t"))
        .select("doc_id", "lang", F.explode(F.expr(_TG)).alias("tg"))
    )


def lang_profiles(docs: DataFrame, k: int = LANG_PROFILE_K) -> DataFrame:
    """(lang, tg) — each language's top-``k`` trigrams by corpus
    count, ties broken by trigram so the profile is deterministic.

    One partial-aggregated shuffle bounded by partitions × trigram
    vocabulary (the corpus-sized occurrence stream combines map-side);
    the top-K window runs on the langs × vocabulary reduced table."""
    from pyspark.sql import Window

    counts = _trigrams(docs).groupBy("lang", "tg").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "tg")
    return (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("lang", "tg")
    )


def classify_langs(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang, score, is_correct) for every doc.

    The broadcast profile join runs directly on the trigram
    OCCURRENCE stream (map-only), so counting occurrences after the
    inner join equals the old sum-of-per-doc-counts — and the only
    shuffle is groupBy(doc_id, cand_lang), bounded by docs × langs
    after map-side combine.  Nothing corpus-sized is ever pinned or
    shuffled."""
    probe = F.broadcast(profiles.withColumnRenamed("lang", "cand_lang"))
    scores = (
        _trigrams(docs).select("doc_id", "tg")
        .join(probe, "tg")  # inner: non-profile trigrams score 0 anyway
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    best = (
        scores.groupBy("doc_id")
        .agg(F.max(F.struct("score", "cand_lang")).alias("m"))
        .select(
            "doc_id",
            F.col("m.cand_lang").alias("pred_lang"),
            F.col("m.score").alias("score"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            (F.col("lang") == F.coalesce("pred_lang", F.lit("und")))
            .alias("is_correct"),
        )
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return classify_langs(docs, lang_profiles(docs))


ORACLE_LANG_ID = f"""
WITH tri AS (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, length(text) - 1),
                                 i -> substr(lower(text), i, 3))) AS tg
    FROM documents
    WHERE length(text) >= 3
),
prof AS (
    SELECT lang AS cand_lang, tg
    FROM (
        SELECT lang, tg, count(*) AS n
        FROM tri GROUP BY lang, tg
    )
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, tg)
            <= {LANG_PROFILE_K}
),
doc_tg AS (
    SELECT doc_id, tg, count(*) AS cnt FROM tri GROUP BY doc_id, tg
),
scores AS (
    SELECT doc_id, cand_lang, sum(cnt) AS score
    FROM doc_tg JOIN prof USING (tg)
    GROUP BY doc_id, cand_lang
),
best AS (
    SELECT doc_id, cand_lang AS pred_lang, score
    FROM scores
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, cand_lang DESC) = 1
)
SELECT d.doc_id,
       d.lang,
       coalesce(b.pred_lang, 'und') AS pred_lang,
       CAST(coalesce(b.score, 0) AS BIGINT) AS score,
       d.lang = coalesce(b.pred_lang, 'und') AS is_correct
FROM documents d LEFT JOIN best b USING (doc_id)
"""


QUERIES = [
    ("docs_lang_id", q_lang_id, ORACLE_LANG_ID,
     "Char-trigram language ID: broadcast top-K per-lang profiles, "
     "integer hit-count scoring, deterministic argmax."),
]

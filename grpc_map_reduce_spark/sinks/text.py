"""Reference-parity text sink and end-to-end job runner.

The reference's only sink is line-oriented text: one ``key: value``
line per group, one ``out{port}.txt`` per reducer, collected into
``./output/`` (reducer.go:113-132, master.go:198-229).  Here the same
format is a one-line ``df.write.text`` — each shuffle partition
writes its own ``part-*`` file in parallel (the analog of one file
per reducer), no coordinator collection step.

``run_reference_job`` is the drop-in for the reference CLI
(``main client <input_dir> wc|ii`` — main.go:82-89): text directory
in, formatted text out, same job names, same output content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grpc_map_reduce_spark.sources.text import read_text_corpus


def write_kv_text(df: DataFrame, path: str, key_col: str, value_col: str,
                  num_files: int | None = None) -> None:
    """Write ``{key}: {value}`` lines (reducer.go:125 format).

    ``num_files`` caps output files via coalesce (narrow — no extra
    shuffle), mirroring the reference's one-file-per-reducer layout;
    leave ``None`` to keep one file per shuffle partition.
    """
    out = df.select(
        F.concat_ws(": ", F.col(key_col).cast("string"),
                    F.col(value_col).cast("string")).alias("value")
    )
    if num_files is not None:
        out = out.coalesce(num_files)
    out.write.mode("overwrite").text(path)


def run_reference_job(spark: SparkSession, input_dir: str, fn: str,
                      output_dir: str, num_files: int | None = None) -> None:
    """End-to-end parity with ``main client <input_dir> {wc|ii}``.

    wc: ``word: count`` lines (wcMap/wcReduce, mapper.go:179-189 +
    reducer.go:159-170).  ii: ``word: {n} f1,f2,...`` lines with the
    source list sorted and distinct (invIndexMap/invIndexReduce,
    mapper.go:191-203 + reducer.go:172-186).

    Tokenization runs in reference-parity mode (case-preserving,
    Unicode letter classes — functions.text.REFERENCE_SPLIT_RE), so
    mixed-case and non-ASCII corpora reproduce the reference's output
    exactly, not just the fixtures' ASCII subset.
    """
    from grpc_map_reduce_spark.operators.inverted_index import inverted_index
    from grpc_map_reduce_spark.operators.wordcount import wordcount

    corpus = read_text_corpus(spark, input_dir)
    if fn == "wc":
        write_kv_text(wordcount(corpus, reference_parity=True), output_dir,
                      "word", "cnt", num_files=num_files)
    elif fn == "ii":
        ii = inverted_index(corpus, reference_parity=True).select(
            "word",
            F.concat_ws(" ", F.col("n_docs").cast("string"),
                        F.col("doc_list")).alias("out"),
        )
        write_kv_text(ii, output_dir, "word", "out", num_files=num_files)
    else:
        raise ValueError(f"unknown job {fn!r}; expected 'wc' or 'ii'")

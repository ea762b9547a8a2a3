"""Misra-Gries heavy hitters: the output must be EXACT (candidate
superset property + exact recount), even with a tiny sketch capacity
forcing heavy eviction."""

from __future__ import annotations

import random

import pandas as pd

from grpc_map_reduce_spark.operators.sketches import heavy_hitters


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_exact_under_eviction(spark):
    # 200 distinct rare words + 3 genuinely heavy words, capacity 10:
    # the sketch must evict constantly yet never lose a true heavy hitter.
    rng = random.Random(7)
    tokens = (["alpha"] * 400 + ["beta"] * 300 + ["gamma"] * 200
              + [f"rare{chr(97 + i // 26)}{chr(97 + i % 26)}"
                 for i in range(200)])  # letters only: tokenizer-stable
    rng.shuffle(tokens)
    # spread across several docs/partitions
    texts = [" ".join(tokens[i::8]) for i in range(8)]
    out = heavy_hitters(_docs(spark, texts), inv_phi=10).collect()

    n = len(tokens)
    from collections import Counter
    exact = {w: c for w, c in Counter(tokens).items() if c * 10 > n}
    assert {r.word: r.cnt for r in out} == exact
    assert set(exact) == {"alpha", "beta", "gamma"}


def test_no_heavy_hitters_when_uniform(spark):
    texts = [" ".join(
        chr(97 + i // 676) + chr(97 + i // 26 % 26) + chr(97 + i % 26)
        for i in range(1000)
    )]
    assert heavy_hitters(_docs(spark, texts), inv_phi=500).count() == 0

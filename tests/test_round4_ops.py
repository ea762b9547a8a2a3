"""Property checks for the round-4 additions beyond their oracle
parity: planted-fixture semantics for novelty / snapshot diff /
transition matrix / KMV / dHash, independent of what the driver
fixtures happen to contain."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.data_quality import (
    SNAP_DELETE_PCT,
    SNAP_INSERT_PCT,
    snapshot_diff,
)
from grpc_map_reduce_spark.operators.dedup import ngram_novelty
from grpc_map_reduce_spark.operators.events import transition_matrix
from grpc_map_reduce_spark.operators.multimodal import (
    attach_png_media,
    dhash_images,
    phash_near_dup_pairs,
)
from grpc_map_reduce_spark.operators.sketches import KMV_K, kmv_estimate
from grpc_map_reduce_spark.sources.tables import table


def test_novelty_zero_for_exact_twins(spark):
    body = " ".join(f"tok{i} word{i} gram{i}" for i in range(30))
    other = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, other)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    # twins share every shingle → nothing corpus-unique
    assert rows[1].novelty_bp == 0 and rows[2].novelty_bp == 0
    # the unrelated doc is fully unique
    assert rows[3].novelty_bp == 10000
    assert rows[3].n_unique == rows[3].n_shingles


def test_snapshot_diff_classes_partition_by_bucket(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    out = snapshot_diff(orders).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.change_type, []).append(r)
    assert set(by_type) == {"insert", "update", "delete"}
    for r in by_type["insert"]:
        assert r.old_price_cents == 0 and r.new_price_cents > 0
    for r in by_type["delete"]:
        assert r.new_price_cents == 0 and r.old_price_cents > 0
    for r in by_type["update"]:
        # +5% in integer cents
        assert r.new_price_cents == r.old_price_cents * 105 // 100
    # unchanged rows must NOT appear: every orderkey at most once
    keys = [r.o_orderkey for r in out]
    assert len(keys) == len(set(keys))
    n = orders.count()
    # bucket carving is md5-uniform: each class ≈ its bucket width
    assert abs(len(by_type["delete"]) / n - SNAP_DELETE_PCT / 100) < 0.02
    assert abs(len(by_type["insert"]) / n - (100 - SNAP_INSERT_PCT) / 100) < 0.02


def test_transition_matrix_conserves_events(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    out = transition_matrix(events).collect()
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    # every user's k events contribute k-1 transitions
    assert sum(r.n_transitions for r in out) == n_events - n_users
    assert all(0 <= r.share_bp <= 10000 for r in out)
    # 5 event types → at most 25 cells
    assert len(out) <= 25


def test_kmv_exact_below_k_and_bounded_above(spark):
    # below k distinct values: the estimate IS the exact count
    small = spark.range(0, 100).select((F.col("id") % 37).alias("v"))
    row = kmv_estimate(small, "v").collect()[0]
    assert row.est_distinct == row.exact_distinct == 37

    # well above k: relative error within ~5/sqrt(k) (generous 3-sigma)
    big = spark.range(0, 200_000).select((F.col("id") * 7919).alias("v"))
    row = kmv_estimate(big, "v").collect()[0]
    rel = abs(row.est_distinct - row.exact_distinct) / row.exact_distinct
    assert rel < 5 / (KMV_K ** 0.5), f"KMV error {rel:.3f} out of bounds"


def test_dhash_identical_images_pair_at_hamming_zero(spark):
    base = "x" * 300  # same pixels → same 56-bit hash
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different text " * 20)],
        "doc_id long, text string",
    )
    media = attach_png_media(docs)
    sigs = {r.doc_id: r.dhash for r in dhash_images(media).collect()}
    assert sigs[1] == sigs[2]
    assert 0 <= sigs[1] < (1 << 56)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(media).collect()
    }
    assert pairs.get((1, 2)) == 0


# --------------------------------------------------------------------------
# Market-basket association rules (operators/basket.py)

def test_market_basket_planted_rules(spark):
    """Hand-checkable baskets: parts 1,2 co-occur in 2 of 4 orders;
    metrics must match the integer cross-multiplied definitions, the
    item gate must drop parts below min support, and pairs below the
    pair gate must be absent."""
    from grpc_map_reduce_spark.operators.basket import market_basket

    rows = [
        # (orderkey, partkey): part1 in o1,o2,o3; part2 in o1,o2,o4;
        # part3 only in o1 (gated out at min_item=2);
        # duplicate line exercises the DISTINCT basket collapse.
        (1, 1), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1),
        (4, 2),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r.part_a, r.part_b): r
        for r in market_basket(li, min_item=2, min_pair=2).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert (r.pair_n, r.n_a, r.n_b) == (2, 3, 3)
    # conf = 2*10000 // 3; lift = 2*4*10000 // (3*3)
    assert r.conf_a2b_bp == 6666
    assert r.conf_b2a_bp == 6666
    assert r.lift_bp == 8888


def test_market_basket_one_shuffle_feeds_both_join_sides(spark, sf_dir):
    """The gated basket stream must be shared — the a x b self-join
    reads the single checkpointed exchange twice, never re-scans."""
    from grpc_map_reduce_spark.operators.basket import market_basket
    from grpc_map_reduce_spark.sources.tables import table

    df = market_basket(table(spark, sf_dir, "lineitem"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 2
    assert "rangepartitioning" not in plan  # no global sort


# --------------------------------------------------------------------------
# Exact ROC-AUC (operators/data_quality.py::quality_auc)

def test_quality_auc_matches_pure_python_rank_walk(spark, sf_dir):
    """The histogram Mann-Whitney must equal a direct pure-Python
    AUC (average-rank formulation) on the real fixture scores —
    an independent reconstruction, not the same fold."""
    from grpc_map_reduce_spark.operators.data_quality import quality_auc
    from grpc_map_reduce_spark.operators.text_analysis import quality_scores
    from grpc_map_reduce_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    rows = quality_scores(docs, keep=("source",)).select(
        "source", "quality_bp", "lang"
    ).collect()

    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.quality_bp, r.lang == "en"))

    expected = {}
    for src, pairs in by_src.items():
        n_pos = sum(1 for _, p in pairs if p)
        n_neg = len(pairs) - n_pos
        if not n_pos or not n_neg:
            continue
        # U via average ranks: rank all scores ascending, ties share
        # the mean rank; U = R_pos - n_pos(n_pos+1)/2.
        ranked = sorted(pairs)
        r2_pos = 0  # doubled ranks keep tie halves integral
        i = 0
        while i < len(ranked):
            j = i
            while j < len(ranked) and ranked[j][0] == ranked[i][0]:
                j += 1
            dbl_avg_rank = (i + 1) + j  # 2 * (i+1 + j) / 2
            r2_pos += dbl_avg_rank * sum(1 for k in range(i, j) if ranked[k][1])
            i = j
        u2 = r2_pos - n_pos * (n_pos + 1)
        expected[src] = (n_pos, n_neg, (u2 * 10000) // (2 * n_pos * n_neg))

    got = {
        r.source: (r.n_pos, r.n_neg, r.auc_bp)
        for r in quality_auc(docs).collect()
    }
    assert got == expected and expected  # non-vacuous


def test_freq_spectrum_planted_counts(spark):
    """'a a b' + 'b c' -> counts a=2,b=2,c=1 -> spectrum
    freq=1:(1 type,1 token), freq=2:(2 types,4 tokens); token mass
    must be conserved."""
    from grpc_map_reduce_spark.operators.vocab import freq_spectrum

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r.freq: (r.n_types, r.n_tokens) for r in freq_spectrum(docs).collect()}
    assert got == {1: (1, 1), 2: (2, 4)}
    assert sum(t for _, t in got.values()) == 5

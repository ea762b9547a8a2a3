"""Property-based checks (hypothesis) for the hand-built temporal
operators — the ones whose semantics are easiest to get subtly wrong
at partition boundaries, ties, and empty-group edges.  Each property
compares the Spark operator against an independent pure-Python
reconstruction on randomized inputs, complementing the fixed-fixture
DuckDB oracles.

Examples are kept small (the cost is Spark job latency, not data
size) and deadlines disabled accordingly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# A compact universe: few users and a narrow ts range force collisions,
# ties, and adjacent-session edges — the interesting cases.
EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # user_id
        st.integers(min_value=0, max_value=50_000),  # ts seconds
        st.sampled_from(["click", "purchase"]),
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _events_df(spark, rows):
    # distinct event_ids; ts in whole seconds as timestamps
    data = [
        (i, u, float(ts), kind)
        for i, (u, ts, kind) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts_s double, event_type string"
    )
    from pyspark.sql import functions as F

    return df.select(
        "event_id", "user_id",
        F.timestamp_seconds("ts_s").alias("ts"),
        "event_type",
        F.lit(1.0).alias("value"),
    )


@given(rows=EVENTS)
@_SETTINGS
def test_asof_join_property(spark, rows):
    """Every purchase must match the user's click with the greatest
    ts ≤ purchase ts (ties on ts broken by max event_id upstream),
    and NULL iff no such click exists."""
    from grpc_map_reduce_spark.operators.events import asof_join
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _events_df(spark, rows)
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    wdedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks1 = (
        clicks.withColumn("_rn", F.row_number().over(wdedup))
        .filter(F.col("_rn") == 1).drop("_rn")
    )

    got = {
        r.event_id: r.matched_ts
        for r in asof_join(purchases, clicks1).collect()
    }

    click_rows = clicks1.collect()
    for p in purchases.collect():
        eligible = [c.ts for c in click_rows
                    if c.user_id == p.user_id and c.ts <= p.ts]
        want = max(eligible) if eligible else None
        assert got[p.event_id] == want, (p.event_id, got[p.event_id], want)


@given(rows=EVENTS)
@_SETTINGS
def test_sessionize_property(spark, rows):
    """Gaps-and-islands sessionization: walking each user's events in
    (ts, event_id) order, a session breaks exactly when the gap
    exceeds 30 minutes; session row counts must match the walk."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = _events_df(spark, rows)
    # inline the same dataflow as q_sessionize but over this DF
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_new = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = with_new.withColumn("seq", F.sum("_new").over(wrun))
    got = {
        (r.user_id, r.seq): r.n
        for r in sess.groupBy("user_id", "seq").agg(F.count("*").alias("n")).collect()
    }

    # pure-python walk
    by_user: dict[int, list] = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for ts, _ in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                seq += 1
            want[(u, seq)] = want.get((u, seq), 0) + 1
            prev = ts
    assert got == want


@given(rows=EVENTS)
@_SETTINGS
def test_range_join_property(spark, rows):
    """Each purchase's n_recent must equal the count of same-user
    clicks in [ts − 15 min, ts], inclusive both ends."""
    from grpc_map_reduce_spark.operators.events import range_join
    from pyspark.sql import functions as F

    ev = _events_df(spark, rows)
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    got = {r.event_id: r.n_recent for r in range_join(purchases, clicks).collect()}

    click_rows = clicks.collect()
    for p in purchases.collect():
        want = sum(
            1 for c in click_rows
            if c.user_id == p.user_id
            and 0 <= (p.ts - c.ts).total_seconds() <= 900
        )
        assert got[p.event_id] == want, (p.event_id, got[p.event_id], want)


@given(rows=EVENTS)
@_SETTINGS
def test_scd2_property(spark, rows):
    """SCD2 intervals must exactly reproduce a pure-Python run-length
    walk of each user's (ts, event_id)-ordered observation stream:
    runs of equal event_type collapse to one interval, valid_to chains
    to the next run's valid_from, and exactly the last interval per
    user is current."""
    from grpc_map_reduce_spark.operators.events import scd2_intervals

    ev = _events_df(spark, rows)
    got = sorted(
        (r.user_id, r.version, r.status, r.valid_from, r.valid_to,
         r.is_current, r.n_obs)
        for r in scd2_intervals(ev).collect()
    )

    by_user: dict[int, list] = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    want = []
    for u, obs in by_user.items():
        obs.sort()
        runs = []  # (status, valid_from, n_obs)
        for ts, _eid, kind in obs:
            if runs and runs[-1][0] == kind:
                runs[-1][2] += 1
            else:
                runs.append([kind, ts, 1])
        for v, (kind, start, n) in enumerate(runs, start=1):
            nxt = runs[v][1] if v < len(runs) else None
            want.append((u, v, kind, start, nxt, nxt is None, n))
    assert got == sorted(want)


WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
    min_size=1,
    max_size=300,
)


@given(tokens=WORDS, inv_phi=st.sampled_from([2, 3, 5, 10]))
@_SETTINGS
def test_heavy_hitters_exact_property(spark, tokens, inv_phi):
    """The MG candidate-superset + exact-recount pipeline must return
    EXACTLY {w : count(w)*inv_phi > n} regardless of token order,
    partitioning, or sketch evictions."""
    from collections import Counter

    import pandas as pd

    from grpc_map_reduce_spark.operators.sketches import heavy_hitters

    texts = [" ".join(tokens[i::4]) for i in range(4) if tokens[i::4]]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r.word: r.cnt for r in heavy_hitters(docs, inv_phi).collect()}
    n = len(tokens)
    want = {w: c for w, c in Counter(tokens).items() if c * inv_phi > n}
    assert got == want


@given(rows=EVENTS)
@_SETTINGS
def test_gap_fill_property(spark, rows):
    """For every user: the grid covers exactly the hours from first to
    last event with no holes; zero-filled hours carry the most recent
    non-silent hour's total; per-hour sums match a direct recount."""
    from collections import defaultdict

    from grpc_map_reduce_spark.operators.timeseries import gap_fill_hourly

    out = gap_fill_hourly(_events_df(spark, rows)).collect()

    per_user = defaultdict(dict)
    for r in out:
        per_user[r.user_id][r.hour] = r

    by_hour = defaultdict(lambda: [0, 0])  # (user, hour_epoch) -> [n, cents]
    for u, ts, _ in rows:
        h = ts // 3600
        by_hour[(u, h)][0] += 1
        by_hour[(u, h)][1] += 100  # value is always 1.0 -> 100 cents
    users = {u for u, _, _ in rows}
    for u in users:
        hours = sorted(h for (uu, h) in by_hour if uu == u)
        grid = sorted(per_user[u])
        assert len(grid) == hours[-1] - hours[0] + 1  # contiguous
        carry = 0
        for i, hr in enumerate(grid):
            h_epoch = hours[0] + i
            n, cents = by_hour.get((u, h_epoch), (0, 0))
            r = per_user[u][hr]
            assert r.n_events == n
            assert r.hour_value_cents == cents
            if n:
                carry = cents
            assert r.carried_value_cents == carry

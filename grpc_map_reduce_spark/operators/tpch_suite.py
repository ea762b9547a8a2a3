"""Extended TPC-H-style relational suite over the fixture star schema.

The reference engine has no joins, subqueries, or conditional
aggregation at all (SURVEY.md §2.1 — its surface ends at group-by +
fold, reducer.go:159-186), so this module is pure extension surface:
the classic decision-support shapes (scalar subqueries, correlated
per-group thresholds, HAVING, conditional aggregates, argmax rows)
each expressed as a declarative DataFrame plan.

Queries are adapted to the fixture schema (FIXTURES.md) — the
synthetic tables lack some TPC-H columns (no partsupp, no
l_commitdate / l_shipmode, p_type is a flat category) — predicates
are re-targeted to existing columns with selectivities probed at
sf0.01.

Scale notes (100 TB posture), per query:
  * Every date/category filter is on a scan column → parquet
    predicate pushdown prunes row groups before the join.
  * Scalar subqueries are reformulated to avoid double fact scans:
    q15's global max and q17's per-key threshold are WINDOW functions
    over already-reduced (or key-partitioned) rows, because a
    subquery-join form makes Spark re-scan lineitem (no
    common-subplan reuse).  q22's avg is a genuine 1-row broadcast
    (its subquery is over the small customer table, not the fact).
  * HAVING (q18) is a post-aggregation filter — runs on the already
    reduced groups, never on raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grpc_map_reduce_spark.functions.money import cents
from grpc_map_reduce_spark.sources.tables import table


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# --------------------------------------------------------------------------
# Q6-style forecast revenue: filter-only single-table aggregate.  The
# whole WHERE clause reaches the parquet scan (PushedFilters); at
# 100 TB this reads only matching row groups and reduces map-side to
# one double per partition.
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*)                                    AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q9-style product-type profit by nation and year.  part filter prunes
# the probe side early; supplier/nation broadcast; the only shuffles
# are lineitem⨝orders on orderkey and the final small group-by.
def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, year(o_orderdate)
"""


# --------------------------------------------------------------------------
# Q10-style returned-item report: which customers returned the most
# revenue in a quarter.  Top-20 is TakeOrderedAndProject (per-partition
# heap + driver merge of 20×P rows) — no global sort.
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q14-style promo share: conditional aggregation (CASE inside SUM) —
# one scan, two accumulators, no second pass.
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(revenue), 4).alias("promo_pct"),
            F.round(F.sum(revenue), 2).alias("total_revenue"),
        )
    )


ORACLE_Q14 = """
SELECT
    round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0.0 END)
                / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
    round(sum(l_extendedprice * (1 - l_discount)), 2)         AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Q15-style top supplier: argmax over an aggregate.  Expressing the
# max as a scalar-subquery join would make Spark scan lineitem TWICE
# (no common-subplan reuse); instead the global max is a window over
# the already-aggregated per-supplier rows — ONE fact scan, one
# shuffle, and the single-partition window only sees |suppliers|
# rows, not raw lineitem.  Revenue is rounded before the max
# comparison so FP ties resolve identically in both engines.
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(F.sum(revenue), 2).alias("total_revenue")
    )
    w_all = Window.partitionBy()
    return (
        per_supp.withColumn("max_revenue", F.max("total_revenue").over(w_all))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --------------------------------------------------------------------------
# Q17-style small-quantity revenue: correlated per-part threshold
# (l_quantity < 0.2 × that part's average).  The textbook
# decorrelation (self-aggregate + join-back) scans lineitem twice;
# here the threshold is a window AVG partitioned by l_partkey over
# the brand-filtered rows — ONE scan, ONE shuffle on the part key.
# (The brand filter keeps whole parts, and l_partkey determines
# p_brand, so the windowed avg equals the full-table per-part avg.)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    w_part = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("qty_limit", 0.2 * F.avg("l_quantity").over(w_part))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_Q17 = """
WITH agg AS (
    SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_limit
    FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*)                             AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN agg  ON l_partkey = t_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < qty_limit
"""


# --------------------------------------------------------------------------
# Q18-style large-volume customers: HAVING on an aggregate, then join
# the qualifying keys back to orders/customer.  The qualifying-order
# set is tiny after the HAVING filter → broadcasts into the join.
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("t_orderkey"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.t_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


ORACLE_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
    SELECT l_orderkey AS t_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 300
) ON o_orderkey = t_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Q22-style idle rich customers: scalar AVG subquery (broadcast 1-row
# aggregate, crossJoin — never a driver collect) + NOT EXISTS anti
# join, then a per-nation rollup of the survivors.  The anti side is
# finalized ('F') orders — every fixture customer has SOME order, so
# plain "no orders" would be vacuously empty (probed at sf0.01).
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       count(*)                    AS numcust,
       round(sum(c_acctbal), 2)    AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# Q4-style order-priority check: orders in a quarter with ≥1 returned
# line, counted per priority.  The EXISTS becomes a LEFT SEMI join —
# lineitem contributes at most one match per order, so shuffle volume
# on the probe side is the filtered order keys, and the 'R' filter is
# pushed to the lineitem scan.  (Fixture has no l_commitdate /
# l_receiptdate; l_returnflag = 'R' is the "problem line" predicate.)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    returned = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q12-style line status × priority-class report: per l_linestatus, how
# many 1997 lines belong to high-priority vs other orders.  The CASE
# aggregation runs inside the partial agg; orders joins in on the
# shuffle key.  (Fixture has no l_shipmode; l_linestatus is the
# grouping column.)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q19-style disjunctive revenue: OR of brand/size/quantity conjunct
# groups.  The classic pushdown test — Catalyst must push the common
# l_quantity bounds and the IsNotNulls to both scans and broadcast the
# filtered part side; the OR evaluates post-join without exploding
# into a union of three joins.
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q21-style problem suppliers: suppliers with ≥1 returned ('R') line
# but zero accepted ('A') lines — EXISTS ∧ NOT EXISTS composed as
# LEFT SEMI then LEFT ANTI against the twice-filtered fact.  Both
# lineitem scans carry a pushed returnflag filter; supplier is the
# (small) probe side of both.
def q21_problem_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    accepted = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return (
        supp.join(returned, supp.s_suppkey == returned.l_suppkey, "left_semi")
        .join(accepted, supp.s_suppkey == accepted.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name")
    )


ORACLE_Q21 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_returnflag = 'A')
"""


# --------------------------------------------------------------------------
# Q7-style volume shipping: bilateral trade revenue between two nations
# by ship year.  The two nation dims are filtered to the pair BEFORE
# touching the fact: supplier and customer each broadcast-join their
# (2-row) nation slice, so lineitem rows from every other nation pair
# are dropped at the first (broadcast) join — the only big shuffle is
# lineitem⨝orders on orderkey.  The OR-of-directions predicate runs on
# two already-attached dim columns, not as a join condition.
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    na, nb = "NATION_9", "NATION_10"
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    pair = F.col("n_name").isin(na, nb)
    n1 = table(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == na) & (F.col("cust_nation") == nb))
            | ((F.col("supp_nation") == nb) & (F.col("cust_nation") == na))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(volume), 2).alias("revenue"))
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_9'  AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --------------------------------------------------------------------------
# Q8-style national market share: one nation's share of PROMO-part
# revenue sold into one region, by order year.  The share is a
# conditional aggregate over ONE reduced row set — numerator and
# denominator come out of the same groupBy (never two fact scans).
# Region→nation→customer restricts the probe side through two
# broadcast hops before the fact joins; part's type filter is pushed
# to its scan and broadcast too.  mkt_share is derived from the two
# ALREADY-ROUNDED sums so both engines divide identical inputs.
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_nk"))
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_nk")
    ).select("c_custkey")
    n_supp = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = supp.join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_nk"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", volume)
                      .otherwise(F.lit(0.0))), 2
            ).alias("nation_volume"),
            F.round(F.sum(volume), 2).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year", "nation_volume", "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    )


ORACLE_Q8 = """
WITH agg AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_9'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END), 2) AS nation_volume,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND o_custkey IN (
          SELECT c_custkey FROM customer
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region    ON n1.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA')
    GROUP BY year(o_orderdate)
)
SELECT o_year, nation_volume, total_volume,
       round(nation_volume / total_volume, 6) AS mkt_share
FROM agg
"""


# --------------------------------------------------------------------------
# Q13-style customer distribution: histogram of per-customer order
# counts, INCLUDING zero-order customers (the left outer join is the
# point of the query — an inner join silently drops the zero bucket).
# Two aggregations: the first shuffles on c_custkey (the join key, so
# AQE can fold join+agg into one exchange); the second reduces the
# per-customer counts to a ~dozen-row histogram — map-side partials
# make its shuffle negligible.  The priority filter lives in the JOIN
# condition, not a WHERE (a WHERE would turn the outer join inner).
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (~F.col("o_orderpriority").like("4%")),
            "left",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# The four remaining TPC-H shapes (q2/q11/q16/q20) reference partsupp,
# which the fixture schema lacks; each is adapted with lineitem as the
# part↔supplier relation, preserving the query's characteristic plan
# shape.  All four emit exact-integer metrics (functions.money
# rationale): per-line unit price = floor(cents / integral quantity) —
# IEEE division of identical exact inputs, then floor — is
# bit-reproducible across engines, unlike rounded double averages.

# Q2 shape: argmin-per-group across a multi-dim join — for each SMALL
# part, the EUROPE supplier offering the lowest observed unit price.
# One fact scan; suppliers restricted via two broadcast hops BEFORE
# the fact join; the argmin is a row_number window over the (part,
# supplier) aggregate, never a correlated re-scan.
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    unit_cents = F.floor(cents("l_extendedprice") / F.col("l_quantity")).cast("long")
    per_ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name")
        .agg(F.min(unit_cents).alias("min_unit_cents"))
    )
    w = Window.partitionBy("p_partkey").orderBy("min_unit_cents", "s_suppkey")
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "min_unit_cents")
    )


ORACLE_Q2 = """
WITH per_ps AS (
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           min(CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
                          / l_quantity) AS BIGINT)) AS min_unit_cents
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_type = 'SMALL' AND p_size <= 10 AND r_name = 'EUROPE'
    GROUP BY 1, 2, 3, 4
)
SELECT p_partkey, p_brand, s_suppkey, s_name, min_unit_cents
FROM (
    SELECT *, row_number() OVER (PARTITION BY p_partkey
                                 ORDER BY min_unit_cents, s_suppkey) AS rn
    FROM per_ps
) WHERE rn = 1
"""


# Q11 shape: groups whose value exceeds a fraction of the GLOBAL total
# (HAVING against a scalar subquery).  The global total is a 1-row
# aggregate of the same reduced rows, attached by broadcast cross join
# — one fact scan, no unpartitioned window over the (large-at-scale)
# per-part aggregate.
Q11_FRACTION = 0.001  # ~160 of ~1900 parts at sf0.01


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > Q11_FRACTION * F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


ORACLE_Q11 = f"""
WITH per_part AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_9')
    GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_cents
FROM per_part
CROSS JOIN (SELECT sum(value_cents) AS total_cents FROM per_part) t
WHERE value_cents > {Q11_FRACTION} * total_cents
"""


# Q16 shape: distinct-count aggregation with a NOT-IN supplier
# exclusion — how many distinct suppliers ship each (brand, type,
# size) bucket, excluding suppliers with above-average accepted-return
# ('A') volume (scale-free: the threshold is 1.05 × the mean, so the
# excluded fraction is stable at every SF).  NOT IN composes as a
# broadcast anti join against the (tiny) excluded-supplier list; the
# distinct count shuffles (group keys + suppkey) once.
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size") <= 25)
    )
    per_supp = (
        li.filter(F.col("l_returnflag") == "A")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_a"))
    )
    mean_a = per_supp.agg(F.avg("n_a").alias("avg_a"))
    complained = (
        per_supp.join(F.broadcast(mean_a))
        .filter(F.col("n_a") > 1.05 * F.col("avg_a"))
        .select("l_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(complained), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
WITH per_supp AS (
    SELECT l_suppkey, count(*) AS n_a
    FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_suppkey
)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size <= 25
  AND l_suppkey NOT IN (
      SELECT l_suppkey FROM per_supp
      CROSS JOIN (SELECT avg(n_a) AS avg_a FROM per_supp)
      WHERE n_a > 1.05 * avg_a)
GROUP BY p_brand, p_type, p_size
"""


# Q20 shape: per-group-share threshold feeding a semi join — suppliers
# who shipped more than half of some part's 1997 volume (the adapted
# "excess availability" predicate).  Quantities are integral doubles
# (sums exact in fp at any order); the share test compares two exact
# sums.  The per-part total is a window over the (part, supplier)
# aggregate — same shuffle key as the aggregate itself, so AQE runs
# both in one exchange.
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    per_ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated_parts"))
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey)
        .select("s_suppkey", "s_name", "n_dominated_parts")
    )


ORACLE_Q20 = """
WITH per_ps AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
),
dominant AS (
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_dominated_parts
    FROM (
        SELECT *, sum(qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM per_ps
    ) WHERE qty > 0.5 * part_qty
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_dominated_parts
FROM supplier JOIN dominant ON s_suppkey = l_suppkey
"""


QUERIES = [
    ("q4_priority_check", q4_priority_check, ORACLE_Q4,
     "EXISTS as left-semi join; order counts per priority."),
    ("q6_forecast_revenue", q6_forecast_revenue, ORACLE_Q6,
     "Filter-only aggregate; full predicate pushdown to the scan."),
    ("q2_min_cost_supplier", q2_min_cost_supplier, ORACLE_Q2,
     "Argmin-per-group: cheapest EUROPE supplier per SMALL part (q2 shape)."),
    ("q11_important_stock", q11_important_stock, ORACLE_Q11,
     "Share-of-global HAVING via broadcast scalar total (q11 shape)."),
    ("q16_supplier_counts", q16_supplier_counts, ORACLE_Q16,
     "Distinct-count buckets with NOT-IN supplier exclusion (q16 shape)."),
    ("q20_dominant_suppliers", q20_dominant_suppliers, ORACLE_Q20,
     "Per-part share threshold feeding a supplier join (q20 shape)."),
    ("q7_volume_shipping", q7_volume_shipping, ORACLE_Q7,
     "Bilateral nation-pair revenue by year; pair filter via broadcast dims."),
    ("q8_market_share", q8_market_share, ORACLE_Q8,
     "National market share: conditional agg, region semi-join, one fact scan."),
    ("q13_customer_distribution", q13_customer_distribution, ORACLE_Q13,
     "Order-count histogram with zero bucket (filtered left outer join)."),
    ("q9_nation_year_profit", q9_nation_year_profit, ORACLE_Q9,
     "5-table join, profit by nation × year; dims broadcast."),
    ("q10_returned_customers", q10_returned_customers, ORACLE_Q10,
     "Returned-revenue top-20 customers (TakeOrderedAndProject)."),
    ("q12_priority_lines", q12_priority_lines, ORACLE_Q12,
     "CASE aggregation over a fact-dim join (priority-class line counts)."),
    ("q14_promo_revenue", q14_promo_revenue, ORACLE_Q14,
     "Conditional aggregation (promo revenue share)."),
    ("q15_top_supplier", q15_top_supplier, ORACLE_Q15,
     "Argmax supplier via window max over the aggregate (one fact scan)."),
    ("q17_small_quantity_revenue", q17_small_quantity_revenue, ORACLE_Q17,
     "Correlated per-part threshold as a window avg (one scan, one shuffle)."),
    ("q18_large_volume_customers", q18_large_volume_customers, ORACLE_Q18,
     "HAVING on aggregate + join-back of qualifying keys."),
    ("q19_disjunctive_revenue", q19_disjunctive_revenue, ORACLE_Q19,
     "Disjunctive (OR-of-ANDs) predicate over a broadcast join."),
    ("q21_problem_suppliers", q21_problem_suppliers, ORACLE_Q21,
     "EXISTS AND NOT EXISTS composed as left-semi + left-anti joins."),
    ("q22_idle_customers", q22_idle_customers, ORACLE_Q22,
     "Scalar AVG subquery + NOT EXISTS anti join + rollup."),
]

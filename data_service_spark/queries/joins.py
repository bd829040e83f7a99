"""§2.C — joins.

Scale notes baked into each operator:
- dimension tables (region/nation/supplier) are broadcast — no shuffle of the
  fact side; Spark's autoBroadcastJoinThreshold usually picks this up, and
  ``c_join_broadcast`` forces it explicitly;
- fact-fact joins (lineitem ⋈ orders) are shuffle hash/sort-merge on the join
  key — AQE handles skew splitting at runtime;
- the theta/band join is quadratic by nature and is deliberately run on the
  smallest table (supplier); at 100 TB you'd pre-bucket by a coarse band key
  (the banded self-join pattern) — documented in the docstring;
- the as-of join has no native Spark operator; the idiom here (union both
  sides on the key, carry the last order time forward with a running-max
  window) is linear in rows with one shuffle, and is cross-validated against
  DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import fresh_tables, load
from data_service_spark.registry import register


@register(
    "c_join_inner",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def c_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@register(
    "c_join_multiway",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
)
def c_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-way join; the flagship query (SURVEY.md §7.2).

    Plan shape at scale: lineitem⋈orders shuffle-joins on orderkey; nation
    and region are forced broadcast (25/5 rows at any SF); customer GROWS
    with the data, so its join carries no hint — AQE broadcasts the
    runtime-small side and shuffle-joins once customer outgrows the bound.
    Aggregation is partial map-side then final.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "c_join_broadcast",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def c_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "c_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    """,
)
def c_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The >450000 condition makes unmatched customers common -> real nulls.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "c_join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM orders RIGHT JOIN customer
      ON c_custkey = o_custkey AND o_totalprice > 450000
    """,
)
def c_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return o.join(
        c, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "right"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "c_join_full",
    oracle="""
    WITH lo AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100),
         hi AS (SELECT c_custkey AS k2, c_acctbal FROM customer WHERE c_custkey >= 50)
    SELECT lo.c_custkey, lo.c_name, hi.k2, hi.c_acctbal
    FROM lo FULL OUTER JOIN hi ON lo.c_custkey = hi.k2
    """,
)
def c_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately partial key ranges so both sides contribute null halves.
    c = load(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_custkey") < 100).select("c_custkey", "c_name")
    hi = c.filter(F.col("c_custkey") >= 50).select(
        F.col("c_custkey").alias("k2"), "c_acctbal"
    )
    return lo.join(hi, lo.c_custkey == hi.k2, "full").select(
        "c_custkey", "c_name", "k2", "c_acctbal"
    )


@register(
    "c_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def c_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "c_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def c_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "c_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def c_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "c_join_theta_band",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
           round(abs(a.s_acctbal - b.s_acctbal), 2) AS bal_diff
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey AND abs(a.s_acctbal - b.s_acctbal) < 100
    """,
)
def c_join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join (non-equi). Runs as BroadcastNestedLoopJoin here; the
    100 TB formulation buckets s_acctbal into width-100 bands and equi-joins
    on adjacent band ids before applying the exact predicate."""
    s = load(spark, sf_dir, "supplier")
    a = s.select(F.col("s_suppkey").alias("s1"), F.col("s_acctbal").alias("bal1"))
    b = s.select(F.col("s_suppkey").alias("s2"), F.col("s_acctbal").alias("bal2"))
    return (
        a.join(b, (F.col("s1") < F.col("s2")) & (F.abs(F.col("bal1") - F.col("bal2")) < 100))
        .select("s1", "s2", F.round(F.abs(F.col("bal1") - F.col("bal2")), 2).alias("bal_diff"))
    )


@register(
    "c_join_interval",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def c_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: equi-key plus a time-range predicate. The equi
    key keeps it a hash join (range predicate applied post-match) — the shape
    that survives scale-up, vs. a pure range cross-join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "c_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
    FROM events e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def c_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event paired with the most recent order of that
    customer at-or-before the event time.

    Spark has no native as-of DataFrame join. The scalable idiom is
    union-then-window: tag both sides, union on (key, time), and carry the
    last order time forward with ``max().over(rows unbounded preceding)``
    — ONE shuffle on the key, O(n+m) rows throughout. (The naive
    alternative — equi-join on key + ``ts >= t`` then max per event —
    materializes every event × all-prior-orders pair first: quadratic per
    hot key, a guaranteed skew blowup at 100 TB.) Orders sort before
    equal-timestamp events via a side rank so "at-or-before" is inclusive.
    DuckDB's native ASOF JOIN cross-validates the semantics. Output only
    the matched *timestamp* (not a row id) so duplicate-date ties cannot
    make the result ambiguous.
    """
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("side"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = e.unionByName(o).withColumn(
        "last_order_date",
        F.max(F.when(F.col("side") == 0, F.col("t"))).over(w),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "last_order_date",
    )


@register(
    "c_join_salted",
    oracle="""
    SELECT e.user_id, count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value, max(c.c_name) AS c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id
    """,
)
def c_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: SALT the (potentially hot) fact keys.

    The fact side gets a random-free deterministic salt (event_id % S) and
    the dimension side is exploded S ways, so one hot user_id spreads over
    S shuffle partitions instead of melting a single reducer. Results are
    IDENTICAL to the plain join — the oracle computes the unsalted twin.
    AQE's skew-join split handles moderate skew automatically; explicit
    salting is the belt-and-suspenders form for pathological keys (one key
    = whole partition) and for non-AQE engines. S=8 here; at 100 TB pick
    S ≈ hot-key rows / target-partition-rows.
    """
    S = 8
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    salted_e = e.withColumn("salt", (F.col("event_id") % S).cast("int"))
    exploded_c = c.select(
        "c_custkey", "c_name", F.explode(F.array(*[F.lit(i) for i in range(S)])).alias("salt")
    )
    joined = salted_e.join(
        exploded_c,
        (salted_e.user_id == exploded_c.c_custkey)
        & (salted_e.salt == exploded_c.salt),
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max("c_name").alias("c_name"),
    )


@register(
    "c_join_bucketed",
    effects="catalog-write: dss_orders_bkt_*, dss_customer_bkt_*",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 300000
    """,
)
def c_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides stored bucketed by the join key
    → the join runs WITHOUT a shuffle exchange on either side (asserted in
    tests/test_plans.py::test_bucketed_join_has_no_exchange).

    This is the storage-level answer to repeated fact⋈dim joins at 100 TB:
    pay the shuffle once at write time, never at read time. Bucket counts
    must match (or divide) across tables; 8 here. Concurrency-safe via
    uuid-suffixed table names (``io.fresh_tables``) — the result must
    stay a live scan of the bucketed tables (the no-exchange plan test),
    so cleanup is the helper's deferred GC, not an eager drop.
    """
    t_ord, t_cust = fresh_tables(
        spark, "c_join_bucketed", "dss_orders_bkt", "dss_customer_bkt"
    )
    for tbl, src, key in ((t_ord, "orders", "o_custkey"), (t_cust, "customer", "c_custkey")):
        load(spark, sf_dir, src).write.bucketBy(8, key).sortBy(
            key
        ).saveAsTable(tbl)
    o = spark.table(t_ord).filter(F.col("o_totalprice") > 300000)
    c = spark.table(t_cust)
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


@register(
    "c_join_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def c_join_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join, filtered both sides of the
    date, grouped revenue, top-10. The classic benchmark shape — selective
    filters on both fact scans, one agg shuffle, TakeOrdered for the
    limit. The filtered customer side is still SF-proportional (~1/5 of
    customers), so it carries no broadcast hint — AQE broadcasts while it
    fits and shuffle-joins at large SF. l_orderkey added to the sort for
    a unique tiebreak (SURVEY §7.4.4)."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "c_join_tpch_q14",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def c_join_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): fact ⋈ dimension with a
    conditional-aggregate ratio. The date filter pushes to the lineitem
    scan; part is SF-proportional, so no broadcast hint — AQE broadcasts
    it while small and shuffle-joins on partkey at large SF; one
    aggregate pass."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / F.sum(net),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "c_join_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def c_join_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): 4-way join filtered to returned
    lines and one order quarter, revenue per customer, top-20. Unique
    c_custkey tiebreak keeps the limit deterministic (SURVEY §7.4.4)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "c_join_dpp",
    oracle="""
    SELECT l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    JOIN (VALUES ('R', 'returned')) AS dim(flag, label)
      ON l_returnflag = dim.flag
    GROUP BY l_linestatus
    """,
)
def c_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is STORED partitioned by
    the join key (l_returnflag), the dim side carries a selective filter,
    and Catalyst injects a runtime `dynamicpruning` subquery into the
    fact scan's partition filters — only matching partitions are read
    (asserted in tests/test_plans.py::test_dpp_prunes_partitions). At
    100 TB, DPP on a date/region-partitioned fact is routinely a 10-100×
    I/O cut with zero query changes; this is the storage-layout twin of
    broadcast-join pruning.
    """
    from data_service_spark.queries.scans import _tmpdir

    # keyed by sf so each scale factor gets its own partitioned copy
    part_dir = _tmpdir(f"lineitem_by_flag_{os.path.basename(sf_dir.rstrip('/'))}")
    marker = os.path.join(part_dir, "_SUCCESS")
    fact_cols = ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
    if not os.path.exists(marker):  # fixture: partitioned copy, built once
        load(spark, sf_dir, "lineitem").select(*fact_cols).write.partitionBy(
            "l_returnflag"
        ).mode("overwrite").parquet(part_dir)
    fact = spark.read.parquet(part_dir)
    # The dim carries a SELECTIVE FILTER (Catalyst's PartitionPruning rule
    # requires one on the build side before it injects the pruning subquery).
    dim = spark.createDataFrame(
        [("R", "returned"), ("N", "kept"), ("A", "kept")],
        "flag string, label string",
    ).filter(F.col("label") == "returned")
    return (
        fact.join(F.broadcast(dim), fact.l_returnflag == dim.flag)
        .groupBy("l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "c_join_band_bucketed",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
           round(abs(a.s_acctbal - b.s_acctbal), 2) AS bal_diff
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey AND abs(a.s_acctbal - b.s_acctbal) < 100
    """,
)
def c_join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE formulation of c_join_theta_band, same result set: bucket
    s_acctbal into width-100 bands and equi-join each row against its own
    and adjacent buckets (any pair with |Δbal| < 100 differs by ≤ 1 bucket
    id and meets exactly once — the left side holds one bucket, the right
    fans to three), then apply the exact predicate. Turns the
    BroadcastNestedLoopJoin of the theta form into a shuffle equi-join
    whose cost tracks band occupancy — the only formulation that survives
    when neither side broadcasts. Identical oracle as the theta key, so
    the driver proves result parity between the two plans.
    """
    s = load(spark, sf_dir, "supplier")
    a = s.select(
        F.col("s_suppkey").alias("s1"),
        F.col("s_acctbal").alias("bal1"),
        F.floor(F.col("s_acctbal") / 100).alias("bkt"),
    )
    b = s.select(
        F.col("s_suppkey").alias("s2"),
        F.col("s_acctbal").alias("bal2"),
        F.explode(
            F.array(
                F.floor(F.col("s_acctbal") / 100) - 1,
                F.floor(F.col("s_acctbal") / 100),
                F.floor(F.col("s_acctbal") / 100) + 1,
            )
        ).alias("bkt"),
    )
    return (
        a.join(b, ["bkt"])
        .filter(
            (F.col("s1") < F.col("s2"))
            & (F.abs(F.col("bal1") - F.col("bal2")) < 100)
        )
        .select(
            "s1", "s2", F.round(F.abs(F.col("bal1") - F.col("bal2")), 2).alias("bal_diff")
        )
    )


@register(
    "c_join_lateral",
    oracle="""
    SELECT c_custkey, c_name, t.top_price, t.top_key
    FROM customer,
    LATERAL (
      SELECT round(o_totalprice, 2) AS top_price, o_orderkey AS top_key
      FROM orders WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) t
    """,
)
def c_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-row-subquery surface the SQL
    service exposes; Catalyst decorrelates it into an window/join, so
    what executes is one shuffle, not a per-customer loop (the rewrite that
    makes LATERAL usable at 100 TB). Expressed through spark.sql because
    LATERAL is a parser-level feature; this is the top-1-per-key idiom
    (ORDER BY + LIMIT 1 inside the lateral) with a unique tiebreak."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("dss_lat_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("dss_lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, t.top_price, t.top_key
        FROM dss_lat_customer,
        LATERAL (
          SELECT round(o_totalprice, 2) AS top_price, o_orderkey AS top_key
          FROM dss_lat_orders WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        """
    )


@register(
    "c_merge_scd1",
    oracle="""
    WITH ch0 AS (
      SELECT o_custkey AS key,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY o_custkey
    ), changes AS (
      SELECT key, rev_cents,
             CASE WHEN n_orders <= 2 THEN 'D' ELSE 'U' END AS op
      FROM ch0
      UNION ALL
      SELECT key + 1000000, rev_cents, 'U' FROM ch0 WHERE key % 7 = 0
    )
    SELECT
      coalesce(b.c_custkey, c.key) AS custkey,
      CASE WHEN c.key IS NULL THEN 'kept'
           WHEN b.c_custkey IS NULL THEN 'inserted'
           ELSE 'updated' END AS status,
      CASE WHEN c.key IS NULL
             THEN CAST(round(b.c_acctbal * 100) AS BIGINT)
           WHEN b.c_custkey IS NULL THEN c.rev_cents // 1000
           ELSE CAST(round(b.c_acctbal * 100) AS BIGINT)
                + c.rev_cents // 1000 END AS balance_cents
    FROM customer b FULL OUTER JOIN changes c ON b.c_custkey = c.key
    -- coalesce: a base-only row has op NULL; NOT(NULL AND ..) is NULL and
    -- would silently drop the unmatched customer (bit at sf0.1)
    WHERE NOT coalesce(c.op = 'D' AND b.c_custkey IS NOT NULL, FALSE)
    """,
)
def c_merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD type-1 upsert) as pure join algebra — the
    CDC-apply step of a warehouse sync: a change set (derived here from
    per-customer order rollups, plus synthetic brand-new keys) merges into
    the customer dimension with WHEN MATCHED UPDATE / WHEN MATCHED AND
    op='D' DELETE / WHEN NOT MATCHED INSERT, expressed as one full outer
    join + conditional projection. Spark's native MERGE INTO needs a v2
    ACID table; this formulation produces the identical result relation on
    plain parquet and is what a foreachBatch streaming upsert runs per
    micro-batch (i_upsert_sink holds the streaming twin).

    Money flows as integer cents (exact sums, no float-tie divergence —
    SURVEY.md §7.4). Scale: change sets are orders of magnitude smaller
    than the dimension; AQE broadcasts them. At equal scale the join
    shuffle-partitions on the merge key — the same plan Delta/Iceberg
    MERGE compiles to before file rewriting.
    """
    o = load(spark, sf_dir, "orders")
    ch0 = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    changes = ch0.select(
        "key",
        "rev_cents",
        F.when(F.col("n_orders") <= 2, "D").otherwise("U").alias("op"),
    ).unionAll(
        ch0.filter(F.col("key") % 7 == 0).select(
            (F.col("key") + 1000000).alias("key"),
            "rev_cents",
            F.lit("U").alias("op"),
        )
    )
    b = load(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    merged = b.join(changes, b.c_custkey == changes.key, "full_outer")
    return merged.filter(
        ~((F.col("op") == "D") & F.col("c_custkey").isNotNull())
        | F.col("op").isNull()
        | F.col("c_custkey").isNull()
    ).select(
        F.coalesce("c_custkey", "key").alias("custkey"),
        F.when(F.col("key").isNull(), "kept")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("status"),
        F.when(F.col("key").isNull(), bal)
        .when(
            F.col("c_custkey").isNull(),
            F.expr("rev_cents DIV 1000"),
        )
        .otherwise(bal + F.expr("rev_cents DIV 1000"))
        .alias("balance_cents"),
    )


@register(
    "c_join_null_safe",
    oracle="""
    WITH l AS (
      SELECT CASE WHEN o_custkey % 10 = 0 THEN NULL
                  ELSE o_custkey % 100 END AS bkt,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), r AS (
      SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
                  ELSE c_custkey % 100 END AS bkt,
             CAST(count(*) AS BIGINT) AS n_custs
      FROM customer GROUP BY 1
    )
    SELECT l.bkt, l.n_orders, r.n_custs
    FROM l JOIN r ON l.bkt IS NOT DISTINCT FROM r.bkt
    """,
)
def c_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of silently dropping — the semantics a
    sentinel-free dimension merge needs when 'unknown' is itself a valid
    bucket. Spark plans ``<=>`` as an ordinary hash-join key (coalesced
    comparison), so it shuffles and broadcasts exactly like ``=`` — no
    nested-loop penalty for the null handling.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    bkt = lambda col: F.when(  # noqa: E731
        F.col(col) % 10 == 0, F.lit(None).cast("long")
    ).otherwise(F.col(col) % 100)
    left = o.groupBy(bkt("o_custkey").alias("bkt")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    right = c.groupBy(bkt("c_custkey").alias("bkt")).agg(
        F.count(F.lit(1)).alias("n_custs")
    )
    return left.join(
        right, left["bkt"].eqNullSafe(right["bkt"]), "inner"
    ).select(left["bkt"], "n_orders", "n_custs")


def _bloom_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw plan for c_join_bloom — split out so tests can assert the
    optimized plan contains the runtime filter while the confs are set."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "c_join_bloom",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderstatus
    """,
)
def c_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: the selective dimension
    side (orders with o_totalprice > 400000, ~7% of rows) builds a
    ``bloom_filter_agg`` at runtime and the fact scan applies
    ``might_contain`` BEFORE the shuffle — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling only
    the rows that can possibly match (Spark injects it automatically when
    the application side exceeds 10 GB; here the threshold is lowered to
    exercise the same plan at test scale — plan-asserted in
    tests/test_plans.py).

    Spark's InjectRuntimeFilter only fires for joins that will actually
    shuffle the application side — it skips when the creation side is
    broadcastable (a broadcast join never re-shuffles the fact side, so a
    bloom would only save scan I/O it models as cheap). At test scale the
    filtered orders side fits the broadcast threshold, so the key disables
    auto-broadcast for THIS materialization to exercise the
    big-joins-big-shape the rule exists for at 100 TB.

    The confs are scoped: the join materializes eagerly (localCheckpoint)
    under the lowered thresholds, then the session values are restored, so
    no other key's plan sees the non-default planning knobs.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = _bloom_filtered_join(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    return out


@register(
    "c_join_asof_forward",
    oracle="""
    WITH m AS (
      SELECT o.o_orderkey, o.o_orderstatus, o.o_orderdate, e.ts AS next_ts
      FROM orders o
      ASOF LEFT JOIN events e
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(next_ts) AS n_matched,
           round(avg(date_diff('second', o_orderdate, next_ts) / 86400.0), 4)
             AS avg_lag_days
    FROM m GROUP BY o_orderstatus
    """,
)
def c_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of c_join_asof: each order matched
    to the customer's EARLIEST event at-or-after the order date
    (time-to-first-activity), rolled up to average lag per status. The
    Spark idiom flips max→min over the future side; DuckDB's native ASOF
    infers direction from the inequality and cross-validates it.

    Same scale shape as the backward twin: one equi-join keyed by the
    customer, the per-order argmin as a plain min aggregate — no window,
    no nested loop."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_custkey"
    )
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("e_user"), "ts"
    )
    m = (
        o.join(
            e,
            (o.o_custkey == e.e_user) & (o.o_orderdate <= e.ts),
            "left",
        )
        .groupBy("o_orderkey", "o_orderstatus", "o_orderdate")
        .agg(F.min("ts").alias("next_ts"))
    )
    lag_days = (
        F.timestamp_diff("SECOND", F.col("o_orderdate"), F.col("next_ts"))
        / 86400.0
    )
    return m.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("next_ts").alias("n_matched"),
        F.round(F.avg(lag_days), 4).alias("avg_lag_days"),
    )


@register(
    "c_join_overlap",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_type,
             CAST(min(ts) AS DATE) AS s_date, CAST(max(ts) AS DATE) AS e_date
      FROM events GROUP BY 1, 2
    )
    SELECT a.user_id, a.event_type AS t1, b.event_type AS t2,
           CAST(date_diff('day', greatest(a.s_date, b.s_date),
                          least(a.e_date, b.e_date)) + 1 AS BIGINT)
             AS overlap_days
    FROM spans a JOIN spans b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
     AND a.s_date <= b.e_date AND b.s_date <= a.e_date
    """,
)
def c_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (Allen's `overlaps` over two interval sets):
    per-(user, event-type) activity spans [first day, last day] self-joined
    on the user to find which behaviours COEXISTED in time, with the exact
    overlap length in days — the shape c_join_interval (point-in-interval)
    cannot express.

    The equi key (user_id) keeps it a hash join; the two range predicates
    filter post-match, so at scale the span table (a grouped aggregate,
    dimension-sized per user×type) shuffles once on the key and the overlap
    test never degenerates to a cross-product. Day-granularity arithmetic
    is exact integer math in both engines — no float rounding surface.
    """
    e = load(spark, sf_dir, "events")
    spans = e.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("s_date"),
        F.max(F.col("ts").cast("date")).alias("e_date"),
    )
    a = spans.alias("a")
    b = spans.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type"))
        & (F.col("a.s_date") <= F.col("b.e_date"))
        & (F.col("b.s_date") <= F.col("a.e_date"))
    )
    return a.join(b, cond).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("t1"),
        F.col("b.event_type").alias("t2"),
        (
            F.datediff(
                F.least("a.e_date", "b.e_date"),
                F.greatest("a.s_date", "b.s_date"),
            )
            + 1
        ).cast("long").alias("overlap_days"),
    )


@register(
    "c_merge_cdc",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    ), latest AS (
      SELECT user_id, op, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, round(value, 4) AS value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def c_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with DELETES: collapse a change log (upserts + deletes —
    here derived from events, 'error' rows acting as tombstones) to the
    final table state by last-writer-wins per key; keys whose latest
    record is a tombstone vanish. The Debezium/Delta-CDF compaction shape
    that c_merge_scd1 (upsert-only) cannot express.

    One keyed window (single shuffle on user_id) ordered by (ts,
    event_id) — commit-time with a unique tiebreak, the idempotency
    contract a real CDC consumer needs; at scale this runs per
    micro-batch over only the batch's keys, merging into a bucketed
    target.
    """
    e = load(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.round("value", 4).alias("value"))
    )


@register(
    "c_join_asof_nearest",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             abs(date_diff('second', o.o_orderdate, e.ts)) AS gap_s
      FROM events e JOIN orders o ON e.user_id = o.o_custkey
      WHERE e.event_id < 2000
    )
    SELECT event_id, user_id, o_orderkey, CAST(gap_s AS BIGINT) AS gap_s
    FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                       ORDER BY gap_s, o_orderkey) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def c_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join: each event pairs with the order (same
    user) whose timestamp is closest in EITHER direction — the variant
    backward (c_join_asof) and forward (c_join_asof_forward) cannot
    express, needed when the reference series may lag or lead (sensor
    alignment, clock-skewed feeds).

    Equi-key hash join on user + per-event argmin over that user's orders:
    the candidate fan-out is bounded by per-key order count, then one
    keyed window reduces to the closest row. Gap measured in whole seconds
    (integer date_diff semantics match across engines on second-aligned
    order dates); o_orderkey tiebreaks equal gaps.
    """
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    o = load(spark, sf_dir, "orders")
    cand = e.join(o, e.user_id == o.o_custkey).select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.abs(
            F.expr("timestampdiff(SECOND, o_orderdate, ts)")
        ).alias("gap_s"),
    )
    w = Window.partitionBy("event_id").orderBy("gap_s", "o_orderkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "o_orderkey",
                F.col("gap_s").cast("long").alias("gap_s"))
    )


@register(
    "c_join_pit",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events
    ), spine AS (
      SELECT u.user_id, d.d AS as_of
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-02',
                                                TIMESTAMP '2024-01-30',
                                                INTERVAL 1 DAY)) AS d) d
    )
    SELECT s.user_id, s.as_of, h.event_type AS state_at
    FROM spine s JOIN hist h
      ON s.user_id = h.user_id
     AND h.valid_from <= s.as_of
     AND (h.valid_to IS NULL OR s.as_of < h.valid_to)
    """,
)
def c_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join: a daily as-of spine probed against the SCD2
    effective-dated history (the e_win_scd2 build) — "what was each
    user's state at midnight on day D". The feature-store correctness
    primitive: training features must come from the version valid AT the
    label timestamp, never a later one (label leakage otherwise).

    Equi-key hash join on user_id with the validity range applied
    post-match: per probe exactly one history row qualifies (SCD2
    intervals partition time), so output = spine size. At scale both
    sides bucket on user_id and the spine is generated, not stored.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    spine = (
        e.select("user_id")
        .distinct()
        .crossJoin(
            spark.sql(
                "SELECT explode(sequence(TIMESTAMP '2024-01-02',"
                " TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS as_of"
            )
        )
    )
    cond = (
        (spine.user_id == hist.user_id)
        & (hist.valid_from <= spine.as_of)
        & (hist.valid_to.isNull() | (spine.as_of < hist.valid_to))
    )
    return spine.join(hist, cond).select(
        spine.user_id.alias("user_id"),
        "as_of",
        F.col("event_type").alias("state_at"),
    )


@register(
    "c_join_cardinality_est",
    oracle="""
    WITH s AS (
      SELECT (SELECT count(*) FROM orders) AS n_o,
             (SELECT count(*) FROM customer) AS n_c,
             (SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_o,
             (SELECT count(DISTINCT c_custkey) FROM customer) AS ndv_c,
             (SELECT count(*) FROM orders JOIN customer
               ON o_custkey = c_custkey) AS actual
    )
    SELECT n_o, n_c,
           CAST(floor(n_o * n_c / greatest(ndv_o, ndv_c)) AS BIGINT)
             AS estimated,
           actual,
           round(CAST(floor(n_o * n_c / greatest(ndv_o, ndv_c)) AS BIGINT)
                 * 1.0 / actual, 4) AS est_over_actual
    FROM s
    """,
)
def c_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-style join cardinality estimation, checked against
    reality: the textbook equi-join estimate |A⋈B| = |A|·|B| /
    max(ndv_A, ndv_B) (uniformity + containment assumptions — what
    Catalyst's CBO computes from a_cbo_stats' ANALYZE numbers) next to
    the true join count and the over/under ratio. The literacy probe that
    explains WHY a plan picked broadcast vs shuffle, and when to expect
    the estimate to mislead (skew breaks uniformity — c_join_salted's
    territory).

    Five scalar aggregates + one count over the real join; everything is
    exact integer arithmetic but the final ratio.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = (
        o.agg(
            F.count(F.lit(1)).alias("n_o"),
            F.countDistinct("o_custkey").alias("ndv_o"),
        )
        .crossJoin(
            c.agg(
                F.count(F.lit(1)).alias("n_c"),
                F.countDistinct("c_custkey").alias("ndv_c"),
            )
        )
        .crossJoin(
            o.join(c, o.o_custkey == c.c_custkey)
            .agg(F.count(F.lit(1)).alias("actual"))
        )
    )
    # explicit floor before the integer cast: DuckDB CAST(double AS BIGINT)
    # rounds-to-nearest while Spark .cast("long") truncates — divergence of 1
    # whenever the quotient is non-integral (ADVICE r2).
    est = F.floor(F.col("n_o") * F.col("n_c") / F.greatest("ndv_o", "ndv_c"))
    return s.select(
        "n_o",
        "n_c",
        est.alias("estimated"),
        "actual",
        F.round(est * 1.0 / F.col("actual"), 4).alias("est_over_actual"),
    )


@register(
    "c_join_spatial_grid",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    pts AS (
      SELECT user_id,
             40.0 + (('0x' || substr(md5('lat:' || user_id::VARCHAR), 1, 8))
                     ::BIGINT % 400) / 100.0 AS lat,
             -74.0 + (('0x' || substr(md5('lon:' || user_id::VARCHAR), 1, 8))
                      ::BIGINT % 400) / 100.0 AS lon
      FROM u
    ), pairs AS (
      SELECT a.user_id AS user_id_1, b.user_id AS user_id_2,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))) AS dist_km
      FROM pts a JOIN pts b ON a.user_id < b.user_id
    )
    SELECT user_id_1, user_id_2, round(dist_km, 3) AS dist_km
    FROM pairs WHERE dist_km <= 50.0
    """,
)
def c_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join AS AN EQUI-JOIN: user points (deterministic
    hash-derived coordinates in a ~400 km box) paired within 50 km via
    grid bucketing — each point keys to a (0.5° lat × 1.0° lon) cell, one
    side explodes to its 3×3 neighborhood, the join is a plain hash join
    on the cell id, and the exact haversine runs only on co-cell
    candidates. Cell sizes are chosen so NO qualifying pair can span more
    than one cell step (0.5° lat ≈ 55 km ≥ 50; 1.0° lon at this latitude
    ≈ 85 km ≥ 50) — the completeness argument every grid join needs. The
    oracle states the naive all-pairs form; candidate pruning must not
    change the answer.

    This is the PostGIS/geohash pattern on plain Spark: at 100 TB the
    all-pairs form is impossible while the grid join's cost tracks cell
    occupancy — identical shape to the LSH band joins on the text side.
    """
    e = load(spark, sf_dir, "events")
    u = e.select("user_id").distinct()
    bkt = (
        "CAST(conv(substr(md5(concat('{s}:', CAST(user_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 400"
    )
    pts = u.select(
        "user_id",
        (40.0 + F.expr(bkt.format(s="lat")) / 100.0).alias("lat"),
        (-74.0 + F.expr(bkt.format(s="lon")) / 100.0).alias("lon"),
    )
    cell_lat = F.floor(F.col("lat") / 0.5)
    cell_lon = F.floor(F.col("lon") / 1.0)
    a = pts.select(
        F.col("user_id").alias("user_id_1"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        cell_lat.alias("clat"),
        cell_lon.alias("clon"),
    )
    b = pts.select(
        F.col("user_id").alias("user_id_2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.explode(
            F.array(cell_lat - 1, cell_lat, cell_lat + 1)
        ).alias("clat"),
        F.col("lon").alias("_lon"),
    ).select(
        "user_id_2",
        "lat2",
        "lon2",
        "clat",
        F.explode(
            F.array(
                F.floor(F.col("_lon") / 1.0) - 1,
                F.floor(F.col("_lon") / 1.0),
                F.floor(F.col("_lon") / 1.0) + 1,
            )
        ).alias("clon"),
    )
    dist = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat2") - F.col("lat1")) / 2), 2)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(
                    F.sin(F.radians(F.col("lon2") - F.col("lon1")) / 2), 2
                )
            )
        )
    )
    return (
        a.join(b, ["clat", "clon"])
        .filter(F.col("user_id_1") < F.col("user_id_2"))
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= 50.0)
        .select("user_id_1", "user_id_2", F.round("dist_km", 3).alias("dist_km"))
    )


@register(
    "c_join_existence_flag",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer c
    """,
)
def c_join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a COLUMN (not a filter): every customer with a boolean
    flag for "has an urgent order" — the enrichment shape BI models use
    constantly, distinct from c_join_semi (which keeps/drops rows).
    Realized as a left join against the DISTINCT key set of the filtered
    side + null-check: the distinct projection keeps the join build side
    key-sized, and no customer row ever duplicates (the bug a naive left
    join to raw orders would introduce). The distinct urgent-key set is
    still a fraction of CUSTOMERS — data-dependent-size — so it carries
    no broadcast hint: AQE broadcasts it while small and shuffle-joins
    once it outgrows the bound.
    """
    c = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("uk"))
        .distinct()
    )
    return c.join(
        urgent, c.c_custkey == F.col("uk"), "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.col("uk").isNotNull().alias("has_urgent"),
    )


@register(
    "c_join_er_blocking",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
             CAST(floor(c_acctbal / 50) AS BIGINT) AS band
      FROM customer
    ), b1 AS (
      SELECT a.c_custkey AS k1, b.c_custkey AS k2
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.band = b.band
       AND a.c_custkey < b.c_custkey
    ), b2 AS (
      SELECT a.c_custkey AS k1, b.c_custkey AS k2
      FROM c a JOIN c b
        ON a.c_mktsegment = b.c_mktsegment AND a.band = b.band
       AND a.c_custkey < b.c_custkey
    ), cand AS (
      SELECT k1, k2,
             max(src = 1) AS found_b1, max(src = 2) AS found_b2
      FROM (SELECT k1, k2, 1 AS src FROM b1
            UNION ALL SELECT k1, k2, 2 AS src FROM b2)
      GROUP BY k1, k2
    )
    SELECT cand.k1 AS custkey_1, cand.k2 AS custkey_2,
           found_b1, found_b2,
           round(abs(x.c_acctbal - y.c_acctbal), 2) AS bal_diff
    FROM cand JOIN c x ON cand.k1 = x.c_custkey
              JOIN c y ON cand.k2 = y.c_custkey
    WHERE abs(x.c_acctbal - y.c_acctbal) < 25
    """,
)
def c_join_er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation with MULTIPLE BLOCKING KEYS:
    two independent blockers ((nation, balance-band) and (segment,
    balance-band)) each produce equi-join candidate pairs; the union is
    deduped with per-blocker provenance flags, and only then does the
    expensive exact comparator (|balance diff| < 25) run. This is the
    standard ER recall pattern — one blocker misses pairs that disagree on
    its key, so production matchers union several cheap blockers and
    measure each one's contribution (the found_b1/found_b2 flags ARE that
    measurement).

    Every blocker is an equi-join whose cost tracks block occupancy
    (never customers²); the dedup is a pair-key groupBy; the comparator
    touches only surviving candidates. Same scale algebra as the LSH band
    miners, on relational keys.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / 50).cast("long").alias("band"),
    )

    def pairs(key_col, src):
        a = c.select(
            F.col(key_col).alias("bk"),
            F.col("band").alias("bb"),
            F.col("c_custkey").alias("k1"),
        )
        b = c.select(
            F.col(key_col).alias("bk"),
            F.col("band").alias("bb"),
            F.col("c_custkey").alias("k2"),
        )
        return (
            a.join(b, ["bk", "bb"])
            .filter(F.col("k1") < F.col("k2"))
            .select("k1", "k2", F.lit(src).alias("src"))
        )

    cand = (
        pairs("c_nationkey", 1)
        .unionByName(pairs("c_mktsegment", 2))
        .groupBy("k1", "k2")
        .agg(
            F.max(F.col("src") == 1).alias("found_b1"),
            F.max(F.col("src") == 2).alias("found_b2"),
        )
    )
    x = c.select(F.col("c_custkey").alias("k1"), F.col("c_acctbal").alias("bal1"))
    y = c.select(F.col("c_custkey").alias("k2"), F.col("c_acctbal").alias("bal2"))
    return (
        cand.join(x, "k1")
        .join(y, "k2")
        .filter(F.abs(F.col("bal1") - F.col("bal2")) < 25)
        .select(
            F.col("k1").alias("custkey_1"),
            F.col("k2").alias("custkey_2"),
            "found_b1",
            "found_b2",
            F.round(F.abs(F.col("bal1") - F.col("bal2")), 2).alias("bal_diff"),
        )
    )


@register(
    "c_join_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN o.o_orderdate IS NOT NULL
                 AND date_diff('microsecond', o.o_orderdate, e.ts)
                     <= 604800000000
                THEN o.o_orderdate END AS recent_order_date
    FROM events e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def c_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas ``merge_asof``'s
    ``tolerance=`` semantics): each event gets the customer's most recent
    order — but only if it is at most 7 days old, else NULL. The
    distinction matters for feature joins: an unbounded as-of silently
    feeds arbitrarily stale state into a model ("last order" from two
    years ago), while the tolerance turns staleness into an explicit
    missing value. Same union-then-window idiom as ``c_join_asof`` (one
    shuffle on the key, O(n+m)); the tolerance is a post-predicate on the
    carried timestamp, diffed in exact integer MICROSECONDS (SURVEY §7.4's
    NTZ-safe convention — no boundary-crossing ambiguity).

    Scale note: tolerance also BOUNDS streaming state — the stream twin
    can expire carried orders older than 7 days, which the unbounded
    as-of cannot.
    """
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("side"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = e.unionByName(o).withColumn(
        "last_order_date",
        F.max(F.when(F.col("side") == 0, F.col("t"))).over(w),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.when(
            F.expr("timestampdiff(MICROSECOND, last_order_date, t)")
            <= 604800000000,
            F.col("last_order_date"),
        ).alias("recent_order_date"),
    )

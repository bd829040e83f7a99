"""§2.F — sorts, limits, top-k.

The driver's value-hash is order-insensitive, so sort order is made
*checkable* by materializing it as a rank column. Scale notes: `f_topk` runs
as TakeOrderedAndProject (per-partition heap + driver merge — no global
sort); `f_sort_verify`'s single global window is the one deliberately
non-scalable shape here, kept because it verifies total order — the
scalable alternative for ranking at 100 TB is rangeBetween bucketing or
zipWithIndex-style two-pass ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import load
from data_service_spark.registry import register


@register(
    "f_sort_verify",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
    """,
)
def f_sort_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk")
    )


@register(
    "f_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


@register(
    "f_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def f_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partitioned window — shuffles once on the group key; scales, unlike a
    # global sort. At extreme group cardinality AQE coalesces the partitions.
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "f_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def f_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


@register(
    "f_keyset_page",
    oracle="""
    SELECT o_totalprice, o_orderkey, o_orderstatus
    FROM orders
    WHERE o_totalprice > 150000.0
       OR (o_totalprice = 150000.0 AND o_orderkey > 5000)
    ORDER BY o_totalprice, o_orderkey
    LIMIT 20
    """,
)
def f_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the scalable alternative to
    OFFSET/LIMIT (f_offset): resume AFTER cursor (150000.0, 5000) on the
    total order (o_totalprice, o_orderkey) via the expanded row-comparison
    predicate, then take one page. OFFSET must compute and discard every
    earlier row (O(offset) per page — quadratic over a full scan-through);
    the seek predicate pushes into the parquet scan and each page costs
    one TakeOrdered over the survivors. This is the contract a service
    layer should expose for paging large results.

    The composite cursor (price, unique key) makes the order total, so
    pages never skip or repeat rows under concurrent identical prices."""
    o = load(spark, sf_dir, "orders")
    after = (F.col("o_totalprice") > 150000.0) | (
        (F.col("o_totalprice") == 150000.0) & (F.col("o_orderkey") > 5000)
    )
    return (
        o.filter(after)
        .orderBy("o_totalprice", "o_orderkey")
        .limit(20)
        .select("o_totalprice", "o_orderkey", "o_orderstatus")
    )


def _body_top_p_mass() -> str:
    return """
    WITH rev AS (
      SELECT n.n_name, s.s_suppkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), cums AS (
      SELECT n_name, s_suppkey, cents,
             sum(cents) OVER (PARTITION BY n_name
                              ORDER BY cents DESC, s_suppkey) AS cum,
             sum(cents) OVER (PARTITION BY n_name) AS tot
      FROM rev
    ), ranked AS (
      SELECT n_name, s_suppkey, cents, cum, tot,
             lag(cum) OVER (PARTITION BY n_name
                            ORDER BY cents DESC, s_suppkey) AS prev_cum
      FROM cums
    )
    SELECT n_name, s_suppkey, CAST(cents AS BIGINT) AS cents,
           CAST(floor(cum * 10000.0 / tot) AS BIGINT) AS cum_share_bp
    FROM ranked
    WHERE coalesce(prev_cum, 0) * 10 < tot * 9
    """


@register("f_top_p_mass", oracle=_body_top_p_mass())
def f_top_p_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) selection per group: the SMALLEST revenue-ordered
    prefix of suppliers covering ≥90% of each nation's revenue — nucleus
    sampling's selection rule applied to entity triage (keep a supplier
    iff the mass BEFORE it is still under the threshold, so the element
    that crosses 90% is included and nothing after it — exactly top-p's
    boundary convention, unlike ``e_win_pareto``'s fixed top-80 flag).
    The cut is the integer cross-product prev_cum·10 < tot·9 —
    division-free; ordering is total (cents DESC, suppkey).

    Scale shape: one grouped reduce, per-nation ordered windows over the
    supplier spine."""
    for t in ["lineitem", "supplier", "nation"]:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_body_top_p_mass())

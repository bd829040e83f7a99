"""§2.B — projections, filters, predicates.

All identity-mappings to Catalyst expressions; every predicate here is
pushdown-eligible (verified in plan-shape tests), so at 100 TB these run at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load
from data_service_spark.registry import register


@register(
    "b_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           l_quantity + l_tax AS qty_tax
    FROM lineitem
    """,
)
def b_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row arithmetic is deterministic across engines — safe unrounded.
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        (F.col("l_quantity") + F.col("l_tax")).alias("qty_tax"),
    )


@register(
    "b_filter_simple",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45",
)
def b_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "b_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND NOT (o_orderpriority = '5-LOW' AND o_totalprice < 150000)
    """,
)
def b_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(100000, 200000)
        & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") < 150000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "b_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE '%bolt%' AND p_brand LIKE 'Brand#1%'
    """,
)
def b_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") & F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "b_filter_null_semantics",
    oracle="""
    SELECT count(*) AS n_rows,
           count(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 END) AS n_null,
           count(CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 1 END) AS n_not_null,
           count(CASE WHEN l_discount IS NOT DISTINCT FROM nullif(l_discount, 0.0)
                 THEN 1 END) AS n_nullsafe_eq
    FROM lineitem
    """,
)
def b_filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The corpus has zero nulls (FIXTURES.md) — manufacture them with nullif
    # and exercise IS NULL / IS NOT NULL / null-safe equality (<=>).
    li = load(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(d.isNull(), 1)).alias("n_null"),
        F.count(F.when(d.isNotNull(), 1)).alias("n_not_null"),
        F.count(F.when(F.col("l_discount").eqNullSafe(d), 1)).alias("n_nullsafe_eq"),
    )


@register(
    "b_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def b_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "b_filter_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def b_filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate — Catalyst plans the
    subquery once (a broadcast scalar), not per row; exact float equality
    on the 1.5*avg threshold is safe because both engines compute the same
    double sum/count over identical input."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("dss_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM dss_orders_ssq
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM dss_orders_ssq)
        """
    )


@register(
    "b_filter_corr_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
    """,
)
def b_filter_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5× above their own customer's
    average. Catalyst decorrelates this into an aggregate + join
    (RewriteCorrelatedScalarSubquery) — no per-row re-execution, which is
    what makes the construct usable at 100 TB."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("dss_orders_corr")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM dss_orders_corr o
        WHERE o.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                      FROM dss_orders_corr o2
                                      WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "b_filter_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_orderpriority = '1-URGENT'
    """,
)
def b_filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery predicate — the third correlated-filter shape beside the
    scalar (b_filter_scalar_subquery) and EXISTS (c_join_semi) forms.
    Catalyst rewrites IN (SELECT ...) into a left-semi join, so the 100 TB
    plan is one hash join against the (small, broadcastable) subquery
    result, never a per-row probe."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("dss_in_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("dss_in_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM dss_in_orders
        WHERE o_custkey IN (SELECT c_custkey FROM dss_in_customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderpriority = '1-URGENT'
        """
    )


_LATERAL_ALIAS_SQL = """
    SELECT o_orderkey,
           o_totalprice * (1 - 0.04) AS discounted,
           discounted * 0.07 AS tax,
           round(discounted + tax, 2) AS total_due
    FROM orders
"""


@register("b_lateral_alias", oracle=_LATERAL_ALIAS_SQL)
def b_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: a projection expression referencing an
    alias defined earlier in the SAME select list — the way derived-metric
    chains are actually written (no nested subquery per step). Both
    engines support it, so the identical text runs on each; Catalyst
    inlines the chain into one codegen projection (zero extra operators).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_ALIAS_SQL)

"""§2.G — set operations.

Spark ``union`` is UNION ALL; ``.distinct()`` on top gives SQL UNION.
``intersect``/``except`` have DISTINCT semantics in both engines.
All of these shuffle on the full row — at scale prefer pre-projecting to the
minimal column set first (done here: single key column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load
from data_service_spark.registry import register

_URGENT = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_HIGH_VALUE = "SELECT o_custkey FROM orders WHERE o_totalprice > 300000"


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return urgent, high


@register("g_union_all", oracle=f"{_URGENT} UNION ALL {_HIGH_VALUE}")
def g_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, high = _sides(spark, sf_dir)
    return urgent.unionAll(high)


@register("g_union_distinct", oracle=f"{_URGENT} UNION {_HIGH_VALUE}")
def g_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, high = _sides(spark, sf_dir)
    return urgent.union(high).distinct()


@register("g_intersect", oracle=f"{_URGENT} INTERSECT {_HIGH_VALUE}")
def g_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, high = _sides(spark, sf_dir)
    return urgent.intersect(high)


@register("g_except", oracle=f"{_URGENT} EXCEPT {_HIGH_VALUE}")
def g_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, high = _sides(spark, sf_dir)
    return urgent.subtract(high)  # EXCEPT (distinct semantics)


@register(
    "g_union_byname",
    oracle="""
    SELECT r_regionkey AS k, r_name AS name, NULL AS acctbal FROM region
    UNION ALL
    SELECT n_nationkey AS k, n_name AS name, NULL AS acctbal FROM nation
    UNION ALL
    SELECT s_suppkey AS k, s_name AS name, s_acctbal AS acctbal FROM supplier
    """,
)
def g_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True) aligns
    columns by NAME and null-fills the gaps — the append shape when sources
    gain columns over time (vs positional UNION, which silently mismatches)."""
    r = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k"), F.col("r_name").alias("name")
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return r.unionByName(n).unionByName(s, allowMissingColumns=True).select(
        "k", "name", F.col("acctbal").cast("double").alias("acctbal")
    )


@register(
    "g_symmetric_diff",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    SELECT o_custkey, 'only_urgent' AS side FROM (
      SELECT DISTINCT o_custkey FROM a EXCEPT SELECT DISTINCT o_custkey FROM b)
    UNION ALL
    SELECT o_custkey, 'only_high_value' AS side FROM (
      SELECT DISTINCT o_custkey FROM b EXCEPT SELECT DISTINCT o_custkey FROM a)
    """,
)
def g_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance — (A∖B) ∪ (B∖A), each row
    labeled with the side it came from: the audit query for 'which keys
    exist in exactly one of two snapshots' (ingest-diff, replica drift).
    Two EXCEPTs share the same two scans; Catalyst plans each as a hash
    anti-join, one shuffle apiece."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    only_a = a.distinct().exceptAll(b.distinct()).select(
        "o_custkey", F.lit("only_urgent").alias("side")
    )
    only_b = b.distinct().exceptAll(a.distinct()).select(
        "o_custkey", F.lit("only_high_value").alias("side")
    )
    return only_a.unionAll(only_b)


@register("g_except_all", oracle=f"{_URGENT} EXCEPT ALL {_HIGH_VALUE}")
def g_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: multiset difference preserving
    multiplicity (a key appearing 3× urgent and 1× high-value survives
    twice). The dedup-free variant matters for ledgers/event logs where
    duplicates are data. Plans as one count-per-row aggregation on each
    side + a joined multiplicity subtraction — same single shuffle as the
    DISTINCT variant, no extra pass."""
    urgent, high = _sides(spark, sf_dir)
    return urgent.exceptAll(high)


@register("g_intersect_all", oracle=f"{_URGENT} INTERSECT ALL {_HIGH_VALUE}")
def g_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL: min-of-multiplicities per key, the
    multiset twin of g_intersect."""
    urgent, high = _sides(spark, sf_dir)
    return urgent.intersectAll(high)

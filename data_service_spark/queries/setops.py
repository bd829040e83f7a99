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

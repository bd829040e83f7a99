"""Query/oracle registry — the driver-facing contract.

Every operator from SURVEY.md §2 registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string computing the same result over the same parquet tables.

Conventions (SURVEY.md §7.4):
- alias every computed/aggregate column identically on both sides;
- round floating aggregates: 2dp for money, 4dp for ratios/scores;
- top-k and max_by/min_by always carry a unique tiebreak key;
- no ``collect()`` in operator paths — everything stays a DataFrame plan.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# Keys whose BUILDER mutates shared catalog/warehouse state (DROP/CREATE
# TABLE, saveAsTable, INSERT) while constructing the DataFrame. The service
# refuses these on plan-only endpoints (/explain {"query": k}) because
# "explain" must never mutate; everything else may still run Spark jobs
# during build (localCheckpoint, stream twins) but leaves no shared state.
EFFECTFUL: dict[str, str] = {}


def register(
    key: str, oracle: str | None = None, effects: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``; ``oracle`` is the DuckDB twin SQL.

    Keys with ``oracle=None`` get the driver's weaker rows-only check
    (SURVEY.md §2: ``d_agg_approx``, ``k_sim_ann``). ``effects`` marks
    builders that mutate shared catalog/warehouse state (see EFFECTFUL).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle.strip()
        if effects is not None:
            EFFECTFUL[key] = effects
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import data_service_spark.queries  # noqa: F401

"""§2.D — aggregations.

Everything here is Spark's hash aggregate: partial (map-side combine) then
final after a shuffle on the group keys — the shape that scales linearly.
Rounding convention (SURVEY.md §7.4): floating sums/avgs 2dp (money) or 4dp
(ratios) on BOTH engine and oracle sides, because double accumulation order
differs across engines in the last ulps.

DuckDB dialect notes encoded below: SUM(integer) returns HUGEINT there →
oracle casts to BIGINT; arg_max ties are nondeterministic → oracle uses an
explicit row_number formulation for the min_by/max_by twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load
from data_service_spark.registry import register


@register(
    "d_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def d_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "d_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical partial+final hash aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "d_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
)
def d_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .filter(F.col("n_orders") > 12)
    )


@register(
    "d_agg_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


@register(
    "d_agg_multi_distinct",
    oracle="""
    SELECT l_linestatus,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def d_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two distinct aggregates + one plain in one pass → Spark's Expand-based
    # multi-distinct plan (one shuffle, n× row expansion on the map side).
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "d_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def d_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")


@register(
    "d_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def d_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_price")


@register(
    "d_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def d_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exercises the spark.sql() entry path (full parse → analyze pipeline),
    # the same route the REST layer uses.
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("dss_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM dss_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "d_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
    )


@register(
    "d_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS med_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark percentile() is exact continuous-interpolation = quantile_cont.
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
    )


@register(
    "d_agg_conditional",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2)
               AS qty_returned,
           round(avg(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS avg_taxed_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def d_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(
                F.when(F.col("l_returnflag") == "A", F.col("l_quantity")).otherwise(0)
            ),
            2,
        ).alias("qty_returned"),
        F.round(
            F.avg(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("avg_taxed_price"),
    )


@register(
    "d_agg_minmax_by",
    oracle="""
    SELECT o_custkey, best_order, worst_order FROM (
      SELECT o_custkey,
             first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS best_order,
             first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC)  AS worst_order
      FROM orders GROUP BY o_custkey)
    """,
)
def d_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ties on o_totalprice are broken by the unique o_orderkey — max_by over
    # a struct orders lexicographically, which the oracle mirrors with an
    # ordered-first aggregate (DuckDB arg_max ties are nondeterministic).
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "best_order"
        ),
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "worst_order"
        ),
    )


@register("d_agg_approx")  # rows-only: HLL sketches differ across engines
def d_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


@register(
    "d_agg_collect",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def d_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_list is order-nondeterministic under shuffle → sort_array makes
    # the string form portable and hash-stable.
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@register(
    "d_agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def d_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by status × priority, priorities as columns.
    The value list is EXPLICIT — with it, Spark skips the extra distinct-
    values job and the pivot compiles to one pass of conditional aggregates
    (exactly the oracle's FILTER form); never leave it implicit at scale."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "p_urgent",
        "2-HIGH": "p_high",
        "3-MEDIUM": "p_medium",
        "4-NOT SPECIFIED": "p_notspec",
        "5-LOW": "p_low",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # Pivot leaves null where a (status, priority) pair never occurs; the
    # FILTER twin counts 0 — align.
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


@register(
    "d_agg_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def d_agg_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure scan-filter-aggregate
    shape. All four predicates push to the parquet scan; the aggregate is a
    single partial+final pass — at 100 TB this query is I/O-bound and the
    plan must show PushedFilters carrying every conjunct."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "d_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 1) AS all_bulk,
           bool_or(l_discount = 0.0) AS any_no_discount,
           count(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) + filtered count per group."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 1).alias("all_bulk"),
        F.bool_or(F.col("l_discount") == 0.0).alias("any_no_discount"),
        F.count(F.when(F.col("l_tax") > 0.05, 1)).alias("n_high_tax"),
    )


@register(
    "d_agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def d_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via arithmetic binning — one hash aggregate,
    the distributed histogram shape (width_bucket without the dialect
    dependency)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "d_agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS value FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def d_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt), the inverse of d_agg_pivot: three measure
    columns become (metric, value) rows. Spark's ``unpivot`` expands
    row-wise in the scan stage (an Expand node — no shuffle, no UDF); the
    oracle states the same semantics as a UNION ALL of projections."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@register(
    "d_agg_mode_det",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
)
def d_agg_mode_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent o_orderpriority per status with a
    lexicographic tie-break. Built explicitly as count + rank rather than
    the engines' ``mode()`` aggregates, whose tie behavior is
    implementation-defined and would diverge between engines — the explicit
    form is also the one that scales (two hash aggs, no ordered state)."""
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "orders").groupBy(
        "o_orderstatus", "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register("d_agg_approx_quantile")  # rows-only: sketch internals differ across engines
def d_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL-style `approx_percentile` sketch —
    the constant-memory quantile path for 100 TB columns where exact
    `percentile` would need a full sort. Mergeable across partitions
    (partial sketches combine associatively), which is what makes it one
    shuffle of sketch bytes instead of data. Rows-only check: sketch
    estimates are engine-specific by design; the exact twin
    (d_agg_percentile) anchors correctness."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10_000
        ).alias("price_q"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag",
        F.round(F.element_at("price_q", 1), 2).alias("p50"),
        F.round(F.element_at("price_q", 2), 2).alias("p90"),
        F.round(F.element_at("price_q", 3), 2).alias("p99"),
        "n",
    )


@register("d_agg_hll_sketch")  # rows-only: HLL sketch bytes are engine-specific
def d_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 4
    `hll_sketch_agg`/`hll_union_agg`): per-group distinct-part sketches,
    then a re-aggregated global estimate from the SKETCHES — the two-level
    rollup a 100 TB store uses to answer distinct counts at any grouping
    without rescanning (sketch bytes, not data, move in the second pass).
    Rows-only: estimates are sketch-impl-specific; d_agg_distinct anchors
    the exact values."""
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    global_est = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(F.lit("ALL").alias("l_returnflag"), "est")
    per_est = per_flag.select(
        "l_returnflag", F.hll_sketch_estimate("sk").alias("est")
    )
    return per_est.unionAll(global_est)


@register("d_agg_freq_items")  # rows-only: single-pass sketch, engine-specific
def d_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via `freqItems` (Karp-Shenker-Papadimitriou single-pass
    frequent-items sketch): candidate sets for columns with support >= 10% —
    the skew-detection probe that feeds salting/AQE decisions before an
    expensive join (find the hot keys WITHOUT a full groupBy). One pass,
    constant memory per column, mergeable across partitions. Rows-only:
    KSP candidate sets are order/impl-sensitive; the exact twin for declared
    frequencies is d_agg_groupby-style counting.

    Output columns are flattened to csv strings: the correctness harness
    canonicalizes rows via a pandas sort, which cannot order array-typed
    cells (CORRECTNESS_r09: unhashable list). Sorted-then-joined strings
    carry the same information deterministically."""
    o = load(spark, sf_dir, "orders")
    fi = o.freqItems(["o_orderstatus", "o_orderpriority"], support=0.1)
    return fi.select(
        F.array_join(F.sort_array(F.col("o_orderstatus_freqItems")), ",").alias(
            "hot_statuses"
        ),
        F.array_join(
            F.sort_array(F.col("o_orderpriority_freqItems")), ","
        ).alias("hot_priorities"),
    )


@register(
    "d_agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def d_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouping()`` flags on a rollup: the marker that tells a report
    consumer whether a NULL in a dimension column means 'subtotal row' or
    'genuinely null data' — required the moment rollup output feeds
    anything programmatic. Same one-pass partial-agg plan as the plain
    rollup; the flags are free bits from the grouping-set id.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n"
        )
    )


@register(
    "d_agg_bitmap",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def d_agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_count`` / ``bitmap_or_agg``).

    The scale story vs COUNT(DISTINCT): per-(group, 32k-bucket) bitmaps are
    built map-side, merge associatively (OR), and never hold raw keys —
    a re-aggregatable exact-distinct materialization (store the bitmaps,
    answer distinct over any group rollup later without re-scanning the
    fact table). The ALL row demonstrates exactly that: it is computed by
    OR-merging the per-type bucket bitmaps, not by re-reading events.
    """
    e = load(spark, sf_dir, "events")
    buckets = e.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    per_bucket = buckets.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users")
    )
    merged = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"))
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return per_type.unionAll(merged)


@register(
    "d_transpose",
    oracle="""
    SELECT 'n_orders' AS key,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
    FROM orders
    UNION ALL
    SELECT 'sum_price',
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2),
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2),
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2)
    FROM orders
    """,
)
def d_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4): rows↔columns flip with the first
    column as the new header — the report-shaping step after an aggregate
    (metrics as rows, groups as columns). Distinct header values must be
    collected to NAME the output columns, so this is a small-result
    operator by design: transpose the AGGREGATE, never the fact table.
    """
    o = load(spark, sf_dir, "orders")
    agg = (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )
    return agg.transpose()


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(l_discount), 4) AS avg_disc
    FROM lineitem GROUP BY ALL
"""


@register("d_agg_group_by_all", oracle=_GROUP_BY_ALL_SQL)
def d_agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL``: the analyzer derives the grouping set from the
    non-aggregate select items — the notebook/BI shorthand both engines
    now share, so the IDENTICAL text runs on Spark and the oracle (the
    strongest form of cross-engine parity). Plans exactly like the
    explicit GROUP BY (one partial+final hash aggregate).
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "d_agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, '' ORDER BY o_orderstatus) AS statuses,
           CAST(length(string_agg(o_orderstatus, '' ORDER BY o_orderstatus))
                AS BIGINT) AS n_chars
    FROM orders GROUP BY o_orderpriority
    """,
)
def d_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LISTAGG … WITHIN GROUP (ORDER BY …)`` (Spark 4.1): ordered string
    aggregation — the reporting shape for 'all values of X per group' with
    a DETERMINISTIC order (an unordered listagg is a flaky-test factory).
    Maps to DuckDB's ``string_agg(… ORDER BY …)``. Note the scale
    contract: output size is O(group cardinality) — run it on bounded
    groups (here 5 priorities × 1 char), never on unbounded keys.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(o_orderstatus, '')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               length(listagg(o_orderstatus, '')
                 WITHIN GROUP (ORDER BY o_orderstatus)) AS n_chars
        FROM orders GROUP BY o_orderpriority
        """
    )


@register(
    "d_agg_regression",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS cov,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression/correlation aggregates (``corr`` / ``covar_samp`` /
    ``regr_slope`` / ``regr_intercept`` / ``regr_count``): the in-engine
    least-squares fit — drift monitors and feature screens compute these
    per segment WITHOUT exporting data. Single-pass streaming moments
    (sum, sum², cross-sum) with map-side partials — the same one-shuffle
    shape as any hash aggregate, however many moments are stacked.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("price_qty_corr"),
        F.round(F.covar_samp(y, x), 4).alias("cov"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "d_agg_crosstab",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS "1-URGENT",
           CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH')
                AS BIGINT) AS "2-HIGH",
           CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')
                AS BIGINT) AS "3-MEDIUM",
           CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                AS BIGINT) AS "4-NOT SPECIFIED",
           CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW')
                AS BIGINT) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def d_agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via ``df.stat.crosstab`` — the category×category
    count matrix (status × priority) the profiling layer renders. One
    pivot-shaped aggregate; column set is the value domain, so like any
    pivot it belongs on BOUNDED cardinality columns. Columns re-selected
    in sorted order because crosstab's column order is value-discovery
    order (nondeterministic under parallel scan).
    """
    o = load(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    value_cols = sorted(c for c in ct.columns if c != "o_orderstatus_o_orderpriority")
    return ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("o_orderstatus"),
        *[F.col(f"`{c}`").cast("long").alias(c) for c in value_cols],
    )


@register(
    "d_agg_approx_top_k",
    oracle="""
    SELECT o_custkey, n
    FROM (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (ORDER BY count(*) DESC, o_custkey) AS rn
      FROM orders GROUP BY o_custkey
    ) WHERE rn <= 10
    """,
)
def d_agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter top-k via Spark 4.1's ``approx_top_k`` sketch — the
    one-pass, mergeable, bounded-memory way to find hot keys at 100 TB
    (a full groupBy of a high-cardinality key shuffles everything; the
    sketch ships one fixed-size summary per partition).

    Run here in the sketch's EXACT regime: maxItemsTracked (100k) exceeds
    the key cardinality, so every count is exact and the result — re-sorted
    with a deterministic (count desc, key) tiebreak — hash-matches the
    exact GROUP BY oracle. At true 100 TB cardinalities the same plan
    degrades gracefully to approximate counts; the oracle pin is the
    exact-regime contract."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("dss_topk_orders")
    sk = spark.sql(
        """
        SELECT explode(approx_top_k(o_custkey, 10000, 100000)) AS e
        FROM dss_topk_orders
        """
    ).select(F.col("e.item").alias("o_custkey"), F.col("e.count").alias("n"))
    # Unpartitioned window is fine here: its input is the SKETCH output
    # (<= maxItemsTracked rows), not the data — bounded regardless of N.
    w = Window.orderBy(F.col("n").desc(), F.col("o_custkey"))
    return (
        sk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("o_custkey", "n")
    )


# Count-min sketch plumbing: d=3 hash rows x w=64 buckets. The salted-md5
# bucket is the same portable hash idiom as training.py's samplers, with
# modulus 64 instead of 100; identical text spliced into both dialects.
# One md5 per key, sliced into three independent 32-bit lanes (hex offsets
# 1/9/17) — the standard CMS row-hash construction; vs. three salted
# digests it cuts the dominant md5 work 3x with the same one-sided-error
# guarantee. The Spark side STAGES the digest through its own projection
# (Spark does not CSE the repeated md5 across the three lane expressions
# of one explode — measured 1.8 vs 1.2 s for the pair fan-out at sf0.1,
# and CollapseProject keeps the stage because the alias is multi-used
# and non-cheap); DuckDB inlines it per lane in the oracle.
_CM_DUCK = "('0x' || substr(md5({key}::VARCHAR), {off}, 8))::BIGINT % 64"


@register(
    "d_agg_countmin",
    oracle=f"""
    WITH counters AS (
      SELECT 0 AS r, {_CM_DUCK.format(off=1, key="l_suppkey")} AS b,
             count(*) AS n
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 1, {_CM_DUCK.format(off=9, key="l_suppkey")}, count(*)
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 2, {_CM_DUCK.format(off=17, key="l_suppkey")}, count(*)
      FROM lineitem GROUP BY 2
    ), probes AS (
      SELECT DISTINCT l_suppkey AS k FROM lineitem WHERE l_suppkey <= 10
    ), pb AS (
      SELECT k, 0 AS r, {_CM_DUCK.format(off=1, key="k")} AS b FROM probes
      UNION ALL
      SELECT k, 1, {_CM_DUCK.format(off=9, key="k")} FROM probes
      UNION ALL
      SELECT k, 2, {_CM_DUCK.format(off=17, key="k")} FROM probes
    ), est AS (
      SELECT k, min(n) AS cm_est FROM pb JOIN counters USING (r, b)
      GROUP BY k
    ), truth AS (
      SELECT l_suppkey AS k, count(*) AS true_n FROM lineitem
      WHERE l_suppkey <= 10 GROUP BY 1
    )
    SELECT k AS suppkey, true_n, cm_est,
           cm_est >= true_n AS never_undercounts
    FROM truth JOIN est USING (k)
    """,
)
def d_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as pure relational
    algebra: d=3 salted hash rows x w=64 counters built in ONE scan (the
    per-row explode emits 3 (row, bucket) pairs, then a single hash
    aggregate over 192 cells), then point-estimate 10 probe keys as
    min over rows of their counter — checked against true counts,
    including the sketch's signature one-sided error (never_undercounts).
    Completes the sketch family next to HLL (d_agg_hll_sketch) and KLL
    (d_agg_approx_quantile) with the sketch that answers point frequency.

    Scale: the sketch table is 192 rows whatever the corpus size — the
    partial aggregation happens map-side, the final state broadcasts, and
    merging shards is cell-wise addition (the property that makes CMS the
    streaming/distributed frequency sketch of choice).

    r13: the corpus pass is ONE narrow count(*) groupBy on the raw key;
    md5 + the 3-lane explode run on the per-key count table (|keys| rows,
    not |corpus|) and the bucket counters are cell-wise sums of per-key
    counts — identical algebra (count per bucket = sum of counts of keys
    hashing there), interleaved A/B 1.73 -> 0.74 s min at sf0.1 (new
    wins all 5 reps). The probe/truth
    branches read the same checkpointed per-key table, so the plan's
    three corpus scans collapse to one."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey")
    per_key = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )

    def lanes(src: DataFrame, *keep: str) -> DataFrame:
        exploded = src.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                F.conv(
                                    F.substring("h", 1 + 8 * r, 8), 16, 10
                                ).cast("long")
                                % 64
                            ).alias("b"),
                        )
                        for r in range(3)
                    ]
                )
            ).alias("p"),
        )
        return exploded.select(*keep, "p.r", "p.b")

    digest = per_key.select(
        F.md5(F.col("l_suppkey").cast("string")).alias("h"), "n"
    )
    pairs = lanes(digest, "n")
    counters = pairs.groupBy("r", "b").agg(F.sum("n").alias("n"))
    probes = (
        per_key.filter(F.col("l_suppkey") <= 10)
        .select(F.col("l_suppkey").alias("k"))
    )
    pb = lanes(
        probes.select("k", F.md5(F.col("k").cast("string")).alias("h")), "k"
    )
    est = (
        pb.join(F.broadcast(counters), ["r", "b"])
        .groupBy("k")
        .agg(F.min("n").alias("cm_est"))
    )
    truth = per_key.filter(F.col("l_suppkey") <= 10).select(
        F.col("l_suppkey").alias("k"), F.col("n").alias("true_n")
    )
    return truth.join(est, "k").select(
        F.col("k").alias("suppkey"),
        "true_n",
        "cm_est",
        (F.col("cm_est") >= F.col("true_n")).alias("never_undercounts"),
    )


@register(
    "d_agg_theta_sets",
    oracle="""
    SELECT concat('distinct_', o_orderstatus) AS set_op,
           count(DISTINCT o_custkey) AS n
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'union_all', count(DISTINCT o_custkey) FROM orders
    UNION ALL
    SELECT 'intersect_OF', count(*) FROM (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      HAVING bool_or(o_orderstatus = 'O') AND bool_or(o_orderstatus = 'F')
    )
    UNION ALL
    SELECT 'diff_O_minus_F', count(*) FROM (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      HAVING bool_or(o_orderstatus = 'O') AND NOT bool_or(o_orderstatus = 'F')
    )
    """,
)
def d_agg_theta_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA (Datasketches, Spark 4.1): per-status
    customer sketches stored once, then distinct / union / intersection /
    difference all answered FROM THE SKETCHES — the capability HLL lacks
    (HLL unions but cannot intersect), and the reason theta is the
    warehouse sketch for audience-overlap questions. lgNomEntries=16
    (65536 nominal entries) keeps this corpus in the sketch's exact
    regime, so the DuckDB oracle pins exact set-algebra counts — the same
    exact-regime contract as d_agg_approx_top_k; at 100 TB the estimates
    degrade gracefully and the sketches still merge cell-free across
    shards.

    One scan builds all per-group sketches (map-side partial merge); every
    set question after that touches only the 3-row sketch table.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("dss_theta_orders")
    # Materialize the per-group sketches ONCE (a plain CTE re-executes per
    # reference — 5 scans of the fact table; the cache pins it to one scan
    # and the four set questions read the 3-row in-memory sketch table).
    sketches = spark.sql(
        """
        SELECT o_orderstatus, theta_sketch_agg(o_custkey, 16) AS sk
        FROM dss_theta_orders GROUP BY o_orderstatus
        """
    ).coalesce(1).cache()
    # coalesce(1): the sketch table is 3 rows; intersection partials over
    # empty partitions are illegal ("infinite set") in the Datasketches
    # intersection, and a single partition also skips 200-partition
    # shuffles for every set question.
    sketches.createOrReplaceTempView("dss_theta_sketches")
    return spark.sql(
        """
        SELECT concat('distinct_', o_orderstatus) AS set_op,
               theta_sketch_estimate(sk) AS n
        FROM dss_theta_sketches
        UNION ALL
        SELECT 'union_all', theta_sketch_estimate(theta_union_agg(sk, 16))
        FROM dss_theta_sketches
        UNION ALL
        SELECT 'intersect_OF',
               theta_sketch_estimate(theta_intersection_agg(sk))
        FROM dss_theta_sketches WHERE o_orderstatus IN ('O', 'F')
        UNION ALL
        SELECT 'diff_O_minus_F', theta_sketch_estimate(theta_difference(
          (SELECT sk FROM dss_theta_sketches WHERE o_orderstatus = 'O'),
          (SELECT sk FROM dss_theta_sketches WHERE o_orderstatus = 'F')))
        """
    )


@register(
    "d_agg_funnel_window",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'signup' AND e.ts > t1.t1
        AND e.ts < t1.t1 + INTERVAL 1 DAY
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        AND e.ts < t1.t1 + INTERVAL 1 DAY
      GROUP BY e.user_id
    ), levels AS (
      SELECT u.user_id,
             CASE WHEN t3.user_id IS NOT NULL THEN 3
                  WHEN t2.user_id IS NOT NULL THEN 2
                  WHEN t1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS level
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN t1 USING (user_id)
      LEFT JOIN t2 USING (user_id)
      LEFT JOIN t3 USING (user_id)
    )
    SELECT level, count(*) AS n_users FROM levels GROUP BY level
    """,
)
def d_agg_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (the ClickHouse `windowFunnel` shape): how far each
    user progresses through view → signup → purchase where every later
    stage must land within ONE DAY of the first view and stages must be
    strictly ordered in time; output is the user count per reached level —
    the conversion-funnel report. Each stage is a keyed min-aggregate
    joined to the previous stage's earliest-completion time (the greedy
    earliest-first chaining is windowFunnel's documented semantics).

    Three hash aggregates + equi-joins, all keyed by user_id — one
    partitioning reused throughout; no windows, no UDFs, no per-user
    state. The 1-day window bound is what keeps streaming/backfill state
    finite at 100 TB/day."""
    e = load(spark, sf_dir, "events")
    # r13: t1 feeds t2, t3 AND levels, and t2 feeds t3 and levels;
    # unpinned, Spark re-derived each stage's filtered scan + aggregate
    # per reference (8 parquet scans of events in the census). The stage
    # tables are user-keyed (bounded by converting users) — pin each
    # once; the chain then costs one scan per stage, the documented
    # "three hash aggregates + equi-joins" shape.
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint()
    )
    t2 = (
        e.join(t1, "user_id")
        .filter(
            (F.col("event_type") == "signup")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") < F.col("t1") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint()
    )
    t3 = (
        e.join(t1, "user_id")
        .join(t2, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") < F.col("t1") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = e.select("user_id").distinct()
    levels = (
        users.join(t1.select("user_id", F.lit(1).alias("l1")), "user_id", "left")
        .join(t2.select("user_id", F.lit(1).alias("l2")), "user_id", "left")
        .join(t3.select("user_id", F.lit(1).alias("l3")), "user_id", "left")
        .select(
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .alias("level")
        )
    )
    return levels.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "k_attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts,
             min(CAST(props->>'k' AS BIGINT) % 3) AS ch
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, ts
    ), m AS (
      SELECT p.event_id, p.value, p.ts AS p_ts, c.ts AS c_ts, c.ch
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT CASE
             WHEN c_ts IS NULL OR c_ts < p_ts - INTERVAL 7 DAY
               THEN 'unattributed'
             WHEN ch = 0 THEN 'organic'
             WHEN ch = 1 THEN 'paid'
             ELSE 'email' END AS channel,
           count(*) AS n_purchases,
           round(sum(value), 2) AS revenue
    FROM m GROUP BY 1
    """,
)
def k_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the user's
    most recent click/view touchpoint at-or-before it (as-of semantics),
    lapsing to 'unattributed' past a 7-day lookback; channels derive
    deterministically from the event's JSON props. Revenue-by-channel is
    the report; the DuckDB native ASOF JOIN cross-validates the Spark
    idiom (equi-key join + max-struct argmax), the same pairing proven in
    c_join_asof. Touchpoints are pre-deduped per (user, ts) with a min
    tiebreak so the as-of pick is unique on both engines.

    Scale shape: one equi-join keyed by user_id, the per-purchase argmax
    as a max(struct) aggregate (no window needed), then a tiny channel
    rollup. The 7-day lookback is evaluated AFTER the as-of pick, so the
    join state per user is one row."""
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), "value"
    )
    c = (
        e.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            (F.get_json_object("props", "$.k").cast("bigint") % 3).alias("ch"),
        )
        .groupBy("user_id", "c_ts")
        .agg(F.min("ch").alias("ch"))
    )
    m = (
        p.join(c, (p.user_id == c.user_id) & (c.c_ts <= p.p_ts), "left")
        .groupBy("event_id", "p_ts", "value")
        .agg(F.max(F.struct("c_ts", "ch")).alias("t"))
        .select(
            "event_id",
            "p_ts",
            "value",
            F.col("t.c_ts").alias("c_ts"),
            F.col("t.ch").alias("ch"),
        )
    )
    channel = (
        F.when(
            F.col("c_ts").isNull()
            | (F.col("c_ts") < F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
            "unattributed",
        )
        .when(F.col("ch") == 0, "organic")
        .when(F.col("ch") == 1, "paid")
        .otherwise("email")
    )
    return m.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )


@register(
    "d_agg_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n, sum(l_quantity) AS s1,
             sum(l_quantity * l_quantity) AS s2,
             sum(l_quantity * l_quantity * l_quantity) AS s3,
             sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           round(s1 / n, 4) AS mean,
           round((s2 - s1 * s1 / n) / n, 4) AS m2,
           round(((s3 - 3 * s1 * s2 / n + 2 * s1 * s1 * s1 / (n * n)) / n)
                 / pow((s2 - s1 * s1 / n) / n, 1.5), 4) + 0.0 AS skewness,
           round(((s4 - 4 * s1 * s3 / n + 6 * s1 * s1 * s2 / (n * n)
                   - 3 * s1 * s1 * s1 * s1 / (n * n * n)) / n)
                 / pow((s2 - s1 * s1 / n) / n, 2) - 3.0, 4) + 0.0 AS kurtosis
    FROM s
    """,
)
def d_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher central moments — population skewness and excess kurtosis per
    return flag — computed from RAW POWER SUMS (Σx, Σx², Σx³, Σx⁴) rather
    than each engine's built-in skewness/kurtosis, whose definitional
    variants (sample vs population, bias corrections) disagree across
    engines. l_quantity is integer-valued, so every power sum is an exact
    integer below 2^53: the moment arithmetic is bit-identical in both
    engines before the final rounding. The governor is the DOUBLE
    mantissa, not int64 (sums are double-typed): q ≤ 50 → q⁴ ≤ 6.25e6,
    so Σq⁴ stays exact past 1e9 rows per group; beyond that, re-center
    on a per-group pivot before summing.

    One map-side-combined groupBy — the moment sums are associative
    partials, the textbook single-pass distributed-statistics shape (at
    100 TB: one shuffle of 4 doubles per group).
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ["n", "s1", "s2", "s3", "s4"])
    m2 = (s2 - s1 * s1 / n) / n
    m3 = (s3 - 3 * s1 * s2 / n + 2 * s1 * s1 * s1 / (n * n)) / n
    m4 = (
        s4
        - 4 * s1 * s3 / n
        + 6 * s1 * s1 * s2 / (n * n)
        - 3 * s1 * s1 * s1 * s1 / (n * n * n)
    ) / n
    return s.select(
        "l_returnflag",
        "n",
        F.round(s1 / n, 4).alias("mean"),
        F.round(m2, 4).alias("m2"),
        # + 0.0 normalizes -0.0 (a kurtosis rounding to zero from below
        # printed -0.0 in one engine at sf0.001 — the cusum idiom)
        (F.round(m3 / F.pow(m2, 1.5), 4) + F.lit(0.0)).alias("skewness"),
        (F.round(m4 / F.pow(m2, 2) - 3.0, 4) + F.lit(0.0)).alias("kurtosis"),
    )


@register(
    "d_agg_corr_matrix",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n,
             sum(l_quantity) AS sq, sum(l_extendedprice) AS sp,
             sum(l_discount) AS sd,
             sum(l_quantity * l_quantity) AS sqq,
             sum(l_extendedprice * l_extendedprice) AS spp,
             sum(l_discount * l_discount) AS sdd,
             sum(l_quantity * l_extendedprice) AS sqp,
             sum(l_quantity * l_discount) AS sqd,
             sum(l_extendedprice * l_discount) AS spd
      FROM lineitem
    )
    SELECT 'quantity~price' AS pair,
           round((n * sqp - sq * sp)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 4)
             AS corr
    FROM s
    UNION ALL
    SELECT 'quantity~discount',
           round((n * sqd - sq * sd)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)), 4)
    FROM s
    UNION ALL
    SELECT 'price~discount',
           round((n * spd - sp * sd)
                 / (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)), 4)
    FROM s
    """,
)
def d_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric columns
    — the column-profiling step of an EDA/feature-audit pass, computed as
    ONE single-pass aggregate of co-moment power sums (Σx, Σx², Σxy per
    pair) rather than three built-in corr() passes: all pairs share one
    scan and one 1-row shuffle, the distributed-statistics shape that costs
    the same at 100 TB as a count(*).

    The explicit Σ-formula (not each engine's corr()) keeps the arithmetic
    tree identical across engines before the 4dp rounding. Power sums
    accumulate in DOUBLE (the inputs are double columns), so no int64
    wrap governor applies; the 4dp round absorbs partial-order ulp drift.
    """
    li = load(spark, sf_dir, "lineitem")
    q, p, dc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"), F.sum(p).alias("sp"), F.sum(dc).alias("sd"),
        F.sum(q * q).alias("sqq"), F.sum(p * p).alias("spp"),
        F.sum(dc * dc).alias("sdd"),
        F.sum(q * p).alias("sqp"), F.sum(q * dc).alias("sqd"),
        F.sum(p * dc).alias("spd"),
    )
    n = F.col("n")

    def corr(sxy, sx, sy, sxx, syy):
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / (
                F.sqrt(n * F.col(sxx) - F.col(sx) * F.col(sx))
                * F.sqrt(n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            4,
        )

    rows = [
        s.select(F.lit("quantity~price").alias("pair"),
                 corr("sqp", "sq", "sp", "sqq", "spp").alias("corr")),
        s.select(F.lit("quantity~discount").alias("pair"),
                 corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr")),
        s.select(F.lit("price~discount").alias("pair"),
                 corr("spd", "sp", "sd", "spp", "sdd").alias("corr")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "d_agg_histogram_equiheight",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY bucket
    """,
)
def d_agg_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-HEIGHT histogram build (10 buckets of equal row count via
    ntile) — the optimizer-statistics structure that, unlike the
    equi-width d_agg_histogram, stays informative under skew: bucket
    BOUNDARIES move, counts don't, so selectivity estimates are accurate
    in the heavy tail where equi-width lumps everything into one bin.

    ntile's exact integer bucketing (with o_orderkey tiebreak) sidesteps
    cross-engine percentile interpolation entirely. Local-mode caveat:
    the global ntile is a single-task sort here; the production build
    computes boundaries from a quantile sketch (d_agg_approx_quantile's
    KLL path) and bucket counts from one scan against those boundaries.
    """
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "d_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber) AS cumw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
      FROM lineitem
    ), pick AS (
      SELECT l_returnflag, v, cumw, totw,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cumw, v) AS rn
      FROM w WHERE cumw >= totw / 2.0
    )
    SELECT l_returnflag, round(v, 2) AS weighted_median,
           CAST(totw AS BIGINT) AS total_weight
    FROM pick WHERE rn = 1
    """,
)
def d_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median: the price at which half the QUANTITY mass (not
    half the rows) lies below — per return flag. The mixing/allocation
    statistic plain percentile() cannot express (every row counts
    equally there), and the robust center used when rows represent
    unequal masses (tokens, bytes, quantities).

    One keyed window cumulative sum over (value, unique-key) order, then
    the first row crossing half the total mass. l_quantity is
    integer-valued so cumulative weights are exact; the crossing row is
    pinned by the unique (orderkey, linenumber) tiebreak.
    """
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(wc).alias("cumw"),
        F.sum("l_quantity").over(wt).alias("totw"),
    )
    # r13: cumw is a STRICTLY increasing cumulative sum within each flag
    # (l_quantity >= 1), so the rn=1 row under ORDER BY (cumw, v) is just
    # the argmin — one min_by aggregate instead of a second full
    # sort+window over the crossing half (interleaved A/B 1.40 -> ~1.1 s
    # at sf0.1; the min_by is deterministic because cumw is unique per
    # flag).
    crossing = w.filter(F.col("cumw") >= F.col("totw") / 2.0)
    return crossing.groupBy("l_returnflag").agg(
        F.round(
            F.min_by(F.col("v"), F.struct("cumw", "v")), 2
        ).alias("weighted_median"),
        # totw is constant within a flag partition; max == the value
        F.max("totw").cast("long").alias("total_weight"),
    )


@register(
    "d_agg_skew_detect",
    oracle="""
    WITH k AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ), s AS (
      SELECT count(*) AS n_keys, sum(n) AS n_rows, max(n) AS max_n
      FROM k
    ), top AS (
      SELECT o_custkey, n,
             row_number() OVER (ORDER BY n DESC, o_custkey) AS r
      FROM k
    )
    SELECT t.o_custkey, CAST(t.n AS BIGINT) AS n_rows_key,
           CAST(floor(t.n * 1000000.0 / s.n_rows) AS BIGINT) AS share_ppm,
           CAST(floor(t.n * s.n_keys * 1000000.0 / s.n_rows) AS BIGINT)
             AS skew_x1e6
    FROM top t CROSS JOIN s WHERE t.r <= 10
    """,
)
def d_agg_skew_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler: the top-10 heaviest join/agg keys of
    ``orders.o_custkey`` with their row share and skew factor (key rows ÷
    mean rows per key, ×1e6 exact integer) — the diagnostic that decides
    between a plain shuffle join, AQE skew splitting, and explicit salting
    (c_join_salted). Run it BEFORE the 100 TB join, on the key column
    alone: one vocabulary-sized count table, a 1-row reduce, and a
    TakeOrdered top-10 — never the joined data.
    """
    o = load(spark, sf_dir, "orders")
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
    )
    top = k.orderBy(F.col("n").desc(), "o_custkey").limit(10)
    return top.crossJoin(F.broadcast(s)).select(
        "o_custkey",
        F.col("n").cast("long").alias("n_rows_key"),
        F.floor(F.col("n") * 1000000.0 / F.col("n_rows"))
        .cast("long")
        .alias("share_ppm"),
        F.floor(F.col("n") * F.col("n_keys") * 1000000.0 / F.col("n_rows"))
        .cast("long")
        .alias("skew_x1e6"),
    )


@register(
    "d_agg_wilson_ci",
    oracle="""
    WITH conv AS (
      SELECT count(DISTINCT user_id) AS n,
             count(DISTINCT user_id)
               FILTER (WHERE event_type = 'purchase') AS k
      FROM events
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(k AS BIGINT) AS n_converted,
           round(k * 1.0 / n, 6) AS p_hat,
           round((k * 1.0 / n + 1.96 * 1.96 / (2 * n)
                  - 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS ci_lo,
           round((k * 1.0 / n + 1.96 * 1.96 / (2 * n)
                  + 1.96 * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS ci_hi
    FROM conv
    """,
)
def d_agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the user conversion rate — the
    proportion CI that stays inside [0,1] and behaves at small n (unlike
    the Wald interval every naive dashboard ships). The number an A/B
    readout (k_ab_ztest) should be accompanied by.

    One distinct-user conditional aggregate (two-level partial expansion)
    then closed-form scalar algebra on a single row; both engines
    evaluate the identical formula text, rounded at 6dp.
    """
    e = load(spark, sf_dir, "events")
    conv = e.agg(
        F.countDistinct("user_id").alias("n"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("k"),
    )
    p = F.col("k") * 1.0 / F.col("n")
    z2 = 1.96 * 1.96
    center = p + z2 / (2 * F.col("n"))
    half = 1.96 * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return conv.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_converted"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    )


@register(
    "d_agg_kmv_sketch",
    oracle="""
    WITH h AS (
      SELECT DISTINCT
             ('0x' || substr(md5('kmv:' || l_partkey::VARCHAR), 1, 8))
               ::BIGINT AS hv
      FROM lineitem
    ), kth AS (
      SELECT hv FROM h ORDER BY hv LIMIT 256
    ), s AS (
      SELECT (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_nd,
             (SELECT max(hv) FROM kth) AS h_k,
             (SELECT count(*) FROM kth) AS k
    )
    SELECT CAST(exact_nd AS BIGINT) AS exact_distinct,
           CAST(floor((k - 1) * 4294967296.0 / h_k) AS BIGINT)
             AS kmv_estimate,
           CAST(floor(abs((k - 1) * 4294967296.0 / h_k - exact_nd)
                      * 10000.0 / exact_nd) AS BIGINT) AS rel_err_bp
    FROM s
    """,
)
def d_agg_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
    k=256) over ``l_partkey`` — unlike HLL (engine-private registers,
    rows-only checkable), KMV over a DETERMINISTIC md5 hash is exactly
    reproducible in any engine, so this approximate sketch carries a FULL
    value oracle: estimate = (k−1)/h_(k) with hashes scaled to (0, 2³²).
    Reported next to the exact distinct count and the relative error in
    basis points — the sketch-accuracy audit in one row.

    Scale shape: hash projection → k-smallest via orderBy+limit
    (TakeOrderedAndProject: per-partition heaps of k, never a global
    sort); at 100 TB the same k values merge from every partition in one
    driver-side heap of size k·partitions.
    """
    li = load(spark, sf_dir, "lineitem")
    h = li.select(
        F.expr(
            "CAST(conv(substr(md5(concat('kmv:', CAST(l_partkey AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("hv")
    ).distinct()
    kth = h.orderBy("hv").limit(256)
    s = kth.agg(
        F.max("hv").alias("h_k"), F.count(F.lit(1)).alias("k")
    ).crossJoin(
        F.broadcast(li.agg(F.countDistinct("l_partkey").alias("exact_nd")))
    )
    est = (F.col("k") - 1) * 4294967296.0 / F.col("h_k")
    return s.select(
        F.col("exact_nd").cast("long").alias("exact_distinct"),
        F.floor(est).cast("long").alias("kmv_estimate"),
        F.floor(F.abs(est - F.col("exact_nd")) * 10000.0 / F.col("exact_nd"))
        .cast("long")
        .alias("rel_err_bp"),
    )


@register(
    "d_agg_kmv_union",
    oracle="""
    WITH h AS (
      SELECT lang = 'en' AS is_en,
             ('0x' || substr(md5('kmvu:' || md5(text)), 1, 8))::BIGINT AS hv
      FROM documents
    ), sa AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM h WHERE is_en)
      ORDER BY hv LIMIT 128
    ), sb AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM h WHERE NOT is_en)
      ORDER BY hv LIMIT 128
    ), merged AS (
      SELECT hv FROM (SELECT DISTINCT hv
                      FROM (SELECT hv FROM sa UNION ALL SELECT hv FROM sb))
      ORDER BY hv LIMIT 128
    ), direct AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM h) ORDER BY hv LIMIT 128
    ), s AS (
      SELECT (SELECT count(DISTINCT hv) FROM h) AS exact_union,
             (SELECT max(hv) FROM merged) AS h_m,
             (SELECT count(*) FROM merged) AS k_m,
             (SELECT count(*) FROM (SELECT hv FROM merged
                                    INTERSECT SELECT hv FROM direct))
               AS n_agree
    )
    SELECT CAST(exact_union AS BIGINT) AS exact_union,
           CAST(floor((k_m - 1) * 4294967296.0 / h_m) AS BIGINT)
             AS kmv_union_estimate,
           n_agree = k_m AS merge_equals_direct
    FROM s
    """,
)
def d_agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGEABILITY — the property that makes sketches work on
    a cluster: per-partition (here: per-language-slice) sketches of the
    k smallest hashes merge by "union then re-take k-min", and the merged
    sketch is IDENTICAL to the sketch built over the union directly
    (asserted as a boolean column, not just claimed). The union distinct
    count is then estimated from the merged sketch next to the exact
    number. This is the algebra a 1000-executor distinct-count runs: tiny
    per-partition states, associative merge, one final estimate.

    Everything is TakeOrdered k-min over deterministic md5 hashes — fully
    value-checkable cross-engine, unlike engine-private HLL registers.
    """
    d = load(spark, sf_dir, "documents")
    h = d.select(
        (F.col("lang") == "en").alias("is_en"),
        F.expr(
            "CAST(conv(substr(md5(concat('kmvu:', md5(text))), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    sa = h.filter("is_en").select("hv").distinct().orderBy("hv").limit(128)
    sb = (
        h.filter(~F.col("is_en")).select("hv").distinct().orderBy("hv").limit(128)
    )
    merged = (
        sa.unionAll(sb).distinct().orderBy("hv").limit(128).localCheckpoint()
    )
    direct = h.select("hv").distinct().orderBy("hv").limit(128)
    agree = merged.intersect(direct).agg(
        F.count(F.lit(1)).alias("n_agree")
    )
    stats = merged.agg(
        F.max("hv").alias("h_m"), F.count(F.lit(1)).alias("k_m")
    )
    exact = h.agg(F.countDistinct("hv").alias("exact_union"))
    return (
        exact.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(agree))
        .select(
            F.col("exact_union").cast("long").alias("exact_union"),
            F.floor((F.col("k_m") - 1) * 4294967296.0 / F.col("h_m"))
            .cast("long")
            .alias("kmv_union_estimate"),
            (F.col("n_agree") == F.col("k_m")).alias("merge_equals_direct"),
        )
    )


@register(
    "d_agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(o_totalprice, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_disc(o_totalprice, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_disc(o_totalprice, 0.75) AS DOUBLE) AS p75,
           CAST(quantile_disc(o_totalprice, 0.99) AS DOUBLE) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def d_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (SQL:2023 ``percentile_disc WITHIN GROUP``):
    the quantile that returns an ACTUAL data value instead of an
    interpolated midpoint — the right choice for skewed money columns
    (an interpolated p99 can be a price no order ever had) and the only
    quantile that is bit-exact cross-engine with zero rounding ceremony
    (both engines pick the same stored double). Complements
    d_agg_percentile (continuous) and d_agg_approx_quantile (sketch).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p75,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)
                 AS p99
        FROM orders GROUP BY o_orderpriority
        """
    )


@register(
    "k_neyman_allocation",
    oracle="""
    WITH per AS (
      SELECT source, count(*) AS n_h,
             sum(n_chars) AS sx, sum(n_chars * n_chars) AS sxx
      FROM documents GROUP BY source
    ), s AS (
      SELECT source, n_h,
             sqrt((sxx - sx * 1.0 * sx / n_h) / (n_h - 1)) AS s_h
      FROM per WHERE n_h > 1
    ), tot AS (SELECT sum(n_h * s_h) AS denom FROM s)
    SELECT source, CAST(n_h AS BIGINT) AS n_h, round(s_h, 4) AS s_h,
           CAST(floor(100.0 * n_h * s_h / denom) AS BIGINT) AS alloc
    FROM s CROSS JOIN tot
    """,
)
def k_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation for stratified sampling: distribute a 100-doc
    sample budget across sources proportionally to N_h·S_h (stratum size
    × stratum std-dev of doc length) — the survey-sampling optimum that
    beats proportional allocation whenever strata differ in variance
    (noisy crawl dumps get more probes than uniform corpora). This is
    the design step BEFORE k_sample_stratified draws the rows.

    Per-stratum (n, Σx, Σx²) partials are the only corpus-sized work
    (exact integers — n_chars is int — so both engines derive the same
    stddev double from the same sums); everything after is an 8-row
    table and one broadcast total. int64 overflow bound on the squared
    term: n_chars ≤ ~1e4 here → x² ≤ 1e8, so Σx² wraps only past ~9e10
    docs per stratum (DuckDB widens to HUGEINT, Spark wraps silently);
    for longer documents, quantize length to KB before squaring.
    """
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    s = per.filter(F.col("n_h") > 1).select(
        "source",
        "n_h",
        F.sqrt(
            (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n_h"))
            / (F.col("n_h") - 1)
        ).alias("s_h"),
    )
    tot = s.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("denom"))
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_h").cast("long").alias("n_h"),
        F.round("s_h", 4).alias("s_h"),
        F.floor(100.0 * F.col("n_h") * F.col("s_h") / F.col("denom"))
        .cast("long")
        .alias("alloc"),
    )


@register(
    "k_design_effect",
    oracle="""
    WITH per AS (
      SELECT source, count(*) AS m, sum(n_chars) AS sx,
             sum(n_chars * 1.0 * n_chars) AS sxx
      FROM documents GROUP BY source
    ), g AS (
      SELECT count(*) AS k, sum(m) AS n, sum(sx) AS tx, sum(sxx) AS txx,
             sum(sx * sx * 1.0 / m) AS ssb_part
      FROM per
    ), anova AS (
      SELECT k, n,
             (ssb_part - tx * tx / n) / (k - 1) AS msb,
             (txx - ssb_part) / (n - k) AS msw,
             n * 1.0 / k AS m_bar
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_sources, CAST(n AS BIGINT) AS n_docs,
           round((msb - msw) / (msb + (m_bar - 1) * msw), 6) AS icc,
           round(1 + (m_bar - 1)
                 * ((msb - msw) / (msb + (m_bar - 1) * msw)), 4) AS deff
    FROM anova
    """,
)
def k_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of sampling BY SOURCE (cluster sampling): the ANOVA
    intraclass correlation of doc length within sources and Kish's
    DEFF = 1 + (m̄−1)·ρ — how much larger a source-clustered sample must
    be to match simple random sampling's precision. ρ near 0 means
    sources are internally diverse (cluster sampling is cheap); high ρ
    means docs within a source are clones and per-source quotas buy
    little information — the quantitative backing for k_neyman_allocation
    and the jackknife's source-level grouping.

    One per-source (n, Σx, Σx²) aggregate — exact integer sums — then
    closed-form one-way ANOVA on a one-row frame; identical float trees
    both engines.
    """
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * 1.0 * F.col("n_chars")).alias("sxx"),
    )
    g = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("m").alias("n"),
        F.sum("sx").alias("tx"),
        F.sum("sxx").alias("txx"),
        F.sum(F.col("sx") * F.col("sx") * 1.0 / F.col("m")).alias(
            "ssb_part"
        ),
    )
    msb = (F.col("ssb_part") - F.col("tx") * F.col("tx") / F.col("n")) / (
        F.col("k") - 1
    )
    msw = (F.col("txx") - F.col("ssb_part")) / (F.col("n") - F.col("k"))
    m_bar = F.col("n") * 1.0 / F.col("k")
    icc = (msb - msw) / (msb + (m_bar - 1) * msw)
    return g.select(
        F.col("k").cast("long").alias("n_sources"),
        F.col("n").cast("long").alias("n_docs"),
        F.round(icc, 6).alias("icc"),
        F.round(1 + (m_bar - 1) * icc, 4).alias("deff"),
    )


# ------------------------------------------- exact counting median ----


def _body_median_counting() -> str:
    return """
    WITH q AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ), freq AS (
      SELECT grp, v, count(*) AS c FROM q GROUP BY grp, v
    ), spine AS (
      SELECT grp, v, sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY grp) AS n
      FROM freq
    )
    SELECT grp, CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum * 2 >= n THEN v END) AS BIGINT)
             AS median_lo_cents,
           CAST(min(CASE WHEN cum * 2 >= n + 1 THEN v END) AS BIGINT)
             AS median_hi_cents,
           CAST(min(CASE WHEN cum * 2 >= n THEN v END)
                + min(CASE WHEN cum * 2 >= n + 1 THEN v END) AS BIGINT)
             AS median_x2_cents
    FROM spine GROUP BY grp
    """


@register("d_agg_median_counting", oracle=_body_median_counting())
def d_agg_median_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median without a global sort: prices quantize to
    integer cents, collapse to a (group, value, count) frequency spine
    map-side, and the median is the smallest value whose cumulative count
    crosses half — lower/upper order statistics selected by conditional
    min, even-N midpoint returned as the exact integer lo+hi (no .5
    float). This is the scale path for exact medians on low-cardinality
    domains (prices, lengths, latencies): the shuffle carries distinct
    values per group, not rows — ``d_agg_percentile``'s interpolated
    built-in is the general-domain alternative, ``d_agg_approx_quantile``
    the sketch.

    Position identities: lower median position ⌈N/2⌉ ⇔ 2·cum ≥ N; upper
    position ⌊N/2⌋+1 ⇔ 2·cum ≥ N+2 — pure integer comparisons.

    Scale shape: one partial+final count aggregate (shuffle ∝ distinct
    values), per-group spine windows partitioned on the group key. The
    group-key window caps parallelism at the group count; an r10
    interleaved A/B measured the chunked prefix-sum alternative (the
    ``e_win_range_frame_linear`` decomposition) as a LOSS at this spine
    size (~300k rows / 3 groups sort in-memory faster than the extra
    exchange + offset join) — reach for that recipe only when per-group
    distinct values hit the tens of millions (SCALING.md round-10)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_body_median_counting())


# -------------------------------------------------- Pythagorean means ----


def _body_pythagorean() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(value AS DOUBLE)), 4) AS arith_mean,
           round(exp(avg(ln(CAST(value AS DOUBLE)))), 4) AS geo_mean,
           round(count(*) / sum(1.0e0 / CAST(value AS DOUBLE)), 4)
             AS harm_mean
    FROM events WHERE value > 0
    GROUP BY event_type
    """


@register("d_agg_geomean", oracle=_body_pythagorean())
def d_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean-means panel per event type: arithmetic, geometric
    (exp of the log-mean — the only mean that composes across
    multiplicative factors like rates and ratios) and harmonic (the
    right average of speeds/per-unit costs). Neither engine ships a
    geometric-mean aggregate over DOUBLE, so the log-domain identity IS
    the implementation — and the AM >= GM >= HM ordering is pinned by
    test as a cross-check. value > 0 fences the log/reciprocal domain
    (this corpus is strictly positive).

    exp/ln/avg are the libm exposure class under 4dp rounding; the sums
    accumulate in DOUBLE. One map-side-combined grouped pass.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_pythagorean())

"""§2.E — window functions.

Every window here partitions by a real key (customer / user / status) so the
plan is one shuffle on the partition key then a per-partition sort — linear
at scale. Ordering always carries a unique tiebreak (SURVEY.md §7.4.4).
Time deltas are computed in integer microseconds (unix_micros vs DuckDB
epoch_us) to avoid float/second-truncation mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import load
from data_service_spark.registry import register


@register(
    "e_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def e_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@register(
    "e_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike (the corpus
    # has shipped ts as both), with no session-timezone dependence.
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.timestamp_diff(
            "MICROSECOND", F.lag("ts").over(w), F.col("ts")
        ).alias("delta_us"),
    )


@register(
    "e_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def e_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "e_win_sliding_rows",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    """,
)
def e_win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


@register(
    "e_win_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING), 2) AS band_sum
    FROM orders
    """,
)
def e_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native RANGE frame (±5000 on the ORDER BY value). Two deliberate
    scale notes: (1) parallelism is bound by the 3 o_orderstatus values —
    semantic, the frame is defined within that partition; (2) Spark's
    sliding value-frames re-aggregate the frame per row (no retract on agg
    buffers), so cost is O(rows × avg-frame-rows) per partition. Where
    that product explodes at 100 TB, the registered scale twin is
    e_win_range_frame_linear: integer-cent mass → distributed prefix sum
    over value-chunks → difference of two probe lookups, exact by
    construction. The native frame here stays as the double-semantics
    anchor.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 5000)
    )
    return o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.round(F.sum("o_totalprice").over(w), 2).alias("band_sum"),
    )


@register(
    "e_win_range_frame_linear",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           round(sum(pc) OVER (
             PARTITION BY o_orderstatus ORDER BY pc
             RANGE BETWEEN 500000 PRECEDING AND 500000 FOLLOWING)
             / 100.0, 2) AS band_sum
    FROM c
    """,
)
def e_win_range_frame_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ±$5000 band sum of e_win_range_frame, SCALE SHAPE: exact
    integer cents end-to-end, linear work, and parallelism that scales
    with the VALUE RANGE instead of the 3-value o_orderstatus partition
    key.

    Pipeline: (1) round prices to integer cents; (2) per-(status, cents)
    mass table (map-side-combined groupBy); (3) union in two zero-mass
    probe rows per order at pc−500001 and pc+500000; (4) running sum of
    mass per (status, value-chunk) where chunk = floor(cents / $20k) —
    each chunk is an independent task, so parallelism is #status ×
    #chunks, not 3; (5) chunk offsets come from one tiny window over the
    per-chunk totals (rows = chunk count, not data size), broadcast back;
    (6) band = prefix(pc+500000) − prefix(pc−500001), all BIGINT — no
    float drift, no boundary ambiguity, identical to a RANGE frame on the
    cent values (the oracle's formulation). This is the distributed
    prefix-sum decomposition: local scans + an O(#chunks) carry pass —
    the textbook way to break a low-cardinality window key at 100 TB.
    """
    chunk_w = 2_000_000  # cents per value-chunk ($20k)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    mass = (
        o.groupBy("o_orderstatus", "pc")
        .agg(F.sum("pc").alias("mass"))
        .select(
            "o_orderstatus",
            F.col("pc").alias("val"),
            "mass",
            F.lit(0).alias("is_probe"),
            F.lit(None).cast("long").alias("o_orderkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(None).cast("string").alias("kind"),
        )
    )
    probe_cols = ["o_orderstatus", "val", "mass", "is_probe", "o_orderkey",
                  "o_totalprice", "kind"]
    lo = o.select(
        "o_orderstatus",
        (F.col("pc") - 500001).alias("val"),
        F.lit(0).cast("long").alias("mass"),
        F.lit(1).alias("is_probe"),
        "o_orderkey",
        "o_totalprice",
        F.lit("lo").alias("kind"),
    )
    hi = o.select(
        "o_orderstatus",
        (F.col("pc") + 500000).alias("val"),
        F.lit(0).cast("long").alias("mass"),
        F.lit(1).alias("is_probe"),
        "o_orderkey",
        "o_totalprice",
        F.lit("hi").alias("kind"),
    )
    # r13: u feeds BOTH the local-prefix window and the chunk-totals
    # aggregate; unpinned, Spark re-derived the 3-scan union per branch
    # (6 parquet scans in the before-plan). One pin halves the scans.
    u = (
        mass.select(probe_cols)
        .unionByName(lo.select(probe_cols))
        .unionByName(hi.select(probe_cols))
        .withColumn(
            "chunk", F.floor(F.col("val") / F.lit(chunk_w)).cast("long")
        )
        .localCheckpoint()
    )
    # mass points sort before probes at the same value (is_probe tiebreak)
    # so a probe's running sum is the inclusive prefix ≤ its value.
    w_local = (
        Window.partitionBy("o_orderstatus", "chunk")
        .orderBy("val", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("loc", F.sum("mass").over(w_local))
    totals = u.groupBy("o_orderstatus", "chunk").agg(
        F.sum("mass").alias("cm")
    )
    w_carry = (
        Window.partitionBy("o_orderstatus")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "o_orderstatus",
        "chunk",
        F.coalesce(F.sum("cm").over(w_carry), F.lit(0)).alias("off"),
    )
    probes = (
        local.filter(F.col("is_probe") == 1)
        .join(F.broadcast(offs), ["o_orderstatus", "chunk"])
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "kind",
            (F.col("loc") + F.col("off")).alias("prefix"),
        )
    )
    return probes.groupBy("o_orderkey").agg(
        F.max("o_orderstatus").alias("o_orderstatus"),
        F.max("o_totalprice").alias("o_totalprice"),
        F.round(
            (
                F.max(F.when(F.col("kind") == "hi", F.col("prefix")))
                - F.max(F.when(F.col("kind") == "lo", F.col("prefix")))
            )
            / 100.0,
            2,
        ).alias("band_sum"),
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "band_sum")


@register(
    "e_win_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def e_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "e_win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@register(
    "e_win_ignore_nulls",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END
               AS closed_price
      FROM orders
    )
    SELECT o_orderkey, closed_price,
           last_value(closed_price IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_closed
    FROM base
    """,
)
def e_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: carry the last non-null value forward
    (the gap-fill idiom for sparse sensor/event data). Nulls manufactured
    from open orders — the corpus itself has none (SURVEY §1.3)."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderstatus") == "O", None)
        .otherwise(F.col("o_totalprice"))
        .alias("closed_price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "o_orderkey",
        "closed_price",
        F.last("closed_price", ignorenulls=True).over(w).alias("last_closed"),
    )


@register(
    "e_win_scd2",
    oracle="""
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def e_win_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each per-user state change
    becomes an effective-dated row ([valid_from, valid_to), open-ended for
    the current row). One window pass — the standard way to turn an event
    log into a dimension history at any scale; event_id breaks ts ties."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "e_win_streak",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice, 1) OVER w AS p1,
             lag(o_totalprice, 2) OVER w AS p2
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM seq
    WHERE p2 IS NOT NULL AND o_totalprice > p1 AND p1 > p2
    """,
)
def e_win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE shape): orders that
    complete a 3-long strictly-increasing price run per customer — fraud/
    momentum patterns expressed as lag chains over an ordered per-key
    window. One shuffle on the key, linear window walk; arbitrary-length
    patterns generalize to the gaps-and-islands idiom (i_session) without
    new machinery."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("p1"),
        F.lag("o_totalprice", 2).over(w).alias("p2"),
    )
    return seq.filter(
        F.col("p2").isNotNull()
        & (F.col("o_totalprice") > F.col("p1"))
        & (F.col("p1") > F.col("p2"))
    ).select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@register(
    "e_win_pareto",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             sum(o_totalprice) OVER (PARTITION BY c_mktsegment) AS seg_total,
             sum(o_totalprice) OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS run
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment, o_orderkey,
           round(run / seg_total, 6) AS cum_share,
           run / seg_total <= 0.8 AS in_top80
    FROM r
    """,
)
def e_win_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/concentration analysis: per market segment, each order's
    cumulative share of segment revenue (largest first) and an 80%-band
    flag — the 'which slice of the data carries the value' question that
    decides curation and caching priorities. Two window passes over one
    shuffle on the segment key; the unbounded-sum and the ordered
    running-sum share the partition."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # no forced broadcast: customer is SF-proportional; AQE broadcasts
    # the pruned 2-column side while small, shuffle-joins at large SF
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w_all = Window.partitionBy("c_mktsegment")
    w_run = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = j.select(
        "c_mktsegment",
        "o_orderkey",
        F.sum("o_totalprice").over(w_all).alias("seg_total"),
        F.sum("o_totalprice").over(w_run).alias("run"),
    )
    share = F.col("run") / F.col("seg_total")
    return r.select(
        "c_mktsegment",
        "o_orderkey",
        F.round(share, 6).alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


@register(
    "e_win_ewma",
    oracle="""
    SELECT event_id, user_id,
           round((value
                  + coalesce(lag(value, 1) OVER w, 0) * 0.5
                  + coalesce(lag(value, 2) OVER w, 0) * 0.25
                  + coalesce(lag(value, 3) OVER w, 0) * 0.125
                  + coalesce(lag(value, 4) OVER w, 0) * 0.0625)
                 / (1
                    + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN lag(value, 3) OVER w IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN lag(value, 4) OVER w IS NULL THEN 0 ELSE 0.0625 END),
                 4) + 0.0 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (alpha = 0.5,
    5-tap truncated kernel, normalized over the taps actually present) —
    the time-series smoothing step of anomaly/trend detection on event
    streams. Weights are exact powers of two, so every product is an
    exact float scaling and both engines agree to well under the 4dp
    rounding.

    A lag-chain instead of a recursive fold: each output depends on a
    FIXED window of history, so the whole column evaluates inside one
    partitioned window — one shuffle on user_id, codegen'd, no iterative
    state. (The infinite-memory EWMA recurrence needs ordered stateful
    folding — that variant lives in streaming as applyInPandasWithState;
    the truncated kernel is the batch-scale formulation: the alpha^5 tail
    it drops is <3% of the mass.)
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value")
    den = F.lit(1.0)
    for k, coef in enumerate([0.5, 0.25, 0.125, 0.0625], start=1):
        lagged = F.lag("value", k).over(w)
        num = num + F.coalesce(lagged, F.lit(0.0)) * F.lit(coef)
        den = den + F.when(lagged.isNull(), 0.0).otherwise(coef)
    return e.select(
        "event_id",
        "user_id",
        (F.round(num / den, 4) + F.lit(0.0)).alias("ewma"),
    )


@register(
    "e_win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           nth_value(o_totalprice, 3) OVER w AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` over the full partition frame: positional picks from
    an ordered per-key history (second order ever, third price ever) —
    NULL where the partition is shorter, identical semantics both
    engines. Partitioned by a real key, so the sort shards per customer.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )


@register(
    "e_win_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, round(sum(value), 2) AS sv
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
    ), spine AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 hour)) AS h
      FROM b
    ), j AS (
      SELECT s.event_type, s.h, hv.sv
      FROM spine s LEFT JOIN hourly hv
        ON s.h = hv.h AND s.event_type = hv.event_type
    ), n AS (
      SELECT event_type, h, sv,
             last_value(sv IGNORE NULLS) OVER pw AS pv,
             last_value(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS)
               OVER pw AS ph,
             first_value(sv IGNORE NULLS) OVER fw AS nv,
             first_value(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS)
               OVER fw AS nh
      FROM j
      WINDOW pw AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS hour_start, sv IS NULL AS interpolated,
           -- floor-based 4dp round (r13 census fix): the lerp of
           -- 2dp-rounded endpoints at rational hour fractions lands
           -- EXACTLY on 4dp halves (e.g. frac 3/8), where round()
           -- half-handling differs per engine even on identical
           -- doubles; floor(x*1e4 + 0.5) is the same IEEE op sequence
           -- in both engines so it cannot split. CAST AS DOUBLE keeps
           -- the fraction out of DuckDB's decimal-literal arithmetic.
           floor(CASE WHEN sv IS NOT NULL THEN sv
                      ELSE pv + (nv - pv)
                           * (CAST(date_diff('hour', ph, h) AS DOUBLE)
                              / date_diff('hour', ph, nh)) END
                 * 10000.0 + 0.5) / 10000.0 AS filled
    FROM n
    """,
)
def e_win_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over the hourly spine — the `interpolate`
    twin of i_gap_fill's locf: a missing hour gets the straight line
    between its nearest observed neighbors, weighted by hour distance
    (the hypertable `time_bucket_gapfill(..., interpolate(...))`
    operator). Spine bounds are each key's observed min/max, so every gap
    has both neighbors by construction.

    Two keyed window passes (one backward, one forward carry of value AND
    timestamp, IGNORE NULLS) over the dense spine — parallel across
    event_type keys; the lerp itself is pure codegen arithmetic. Hour
    distances are exact integers on both engines, so the double lerp is
    bit-identical before the 4dp round.
    """
    from data_service_spark.io import load

    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("sv"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"),
        )
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    pw = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fw = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("sv").isNotNull(), F.col("h"))
    n = j.select(
        "event_type",
        "h",
        "sv",
        F.last("sv", ignorenulls=True).over(pw).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(pw).alias("ph"),
        F.first("sv", ignorenulls=True).over(fw).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(fw).alias("nh"),
    )
    frac = (
        F.timestamp_diff("HOUR", F.col("ph"), F.col("h")).cast("double")
        / F.timestamp_diff("HOUR", F.col("ph"), F.col("nh"))
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    # floor-based 4dp round — see the oracle comment (r13 census fix)
    filled = F.when(F.col("sv").isNotNull(), F.col("sv")).otherwise(lerp)
    return n.select(
        "event_type",
        F.col("h").alias("hour_start"),
        F.col("sv").isNull().alias("interpolated"),
        (F.floor(filled * 10000.0 + 0.5) / 10000.0).alias("filled"),
    )


@register(
    "e_win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER w, 4) AS roll_med,
           round(quantile_cont(value, 0.75) OVER w
                 - quantile_cont(value, 0.25) OVER w, 4) AS roll_iqr
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def e_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median + IQR per user over the trailing 5 events — the
    robust-statistics twin of e_win_running's mean family (a single wild
    value shifts a rolling mean but not the rolling median; IQR is the
    robust spread an outlier screen thresholds against). Spark's exact
    `percentile` aggregate accepts a ROWS frame; DuckDB's `quantile_cont`
    is the same linearly-interpolated definition, so the 4dp-rounded
    values hash-match.

    One keyed window sort (user_id), frame bounded at 5 rows — state per
    partition is O(frame), embarrassingly parallel across users at any
    scale. Ordering carries the unique event_id tiebreak so frames are
    identical across engines.
    """
    from data_service_spark.io import load

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    p75 = F.expr("percentile(value, 0.75)").over(w)
    p25 = F.expr("percentile(value, 0.25)").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.round(med, 4).alias("roll_med"),
        F.round(p75 - p25, 4).alias("roll_iqr"),
    )


@register(
    "k_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ), tot AS (
      SELECT prev_type, sum(n) AS n_from FROM t GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           round(t.n * 1.0 / tot.n_from, 4) AS p_next
    FROM t JOIN tot USING (prev_type)
    """,
)
def k_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (previous event type → next event type) pair, the count and the
    conditional probability P(next|prev) — the model behind next-action
    prediction, bot detection (improbable chains), and session-path
    sankey reports. Ordering carries the unique event_id tiebreak so the
    lag is identical across engines.

    One keyed window (lag over user_id — parallel across users), one hash
    aggregate on the E×E transition table (bounded by event-type
    cardinality squared, not data), one broadcast-size normalizer join."""
    from data_service_spark.io import load

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return t.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.col("n_from"), 4).alias("p_next"),
    )


@register(
    "e_win_reset_sum",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type, value,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS island
      FROM events
    )
    SELECT user_id, event_id, CAST(island AS BIGINT) AS island,
           round(sum(value) OVER (PARTITION BY user_id, island
                                  ORDER BY ts, event_id), 4) AS run_sum
    FROM flagged
    """,
)
def e_win_reset_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum that RESETS after each 'purchase' — accumulated
    basket value since the user's last conversion. The reset is encoded
    as a gaps-and-islands id (cumulative count of PRIOR purchases via a
    1-PRECEDING frame, so a purchase closes its own island), then a plain
    running sum within (user, island): two keyed window passes over the
    same (user, ts) sort order, which Spark executes with ONE sort — no
    self-join, no recursion.

    Both windows partition by user: embarrassingly parallel across users
    at any scale, O(1) state per row. Event-id tiebreaks pin frame order
    across engines; the running sum folds in that same order, so the
    float accumulation sequence is identical.
    """
    e = load(spark, sf_dir, "events")
    wi = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wi),
            F.lit(0),
        ).cast("long").alias("island"),
    )
    wr = (
        Window.partitionBy("user_id", "island")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "event_id",
        "island",
        F.round(F.sum("value").over(wr), 4).alias("run_sum"),
    )


@register(
    "e_win_zscore_rolling",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER w)
                 / nullif(stddev_samp(value) OVER w, 0), 4) + 0.0 AS roll_z
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def e_win_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling standardization per user (trailing-5 z-score): the
    self-normalizing anomaly signal for non-stationary per-key series,
    where a global z (k_anomaly_zscore) misreads every user whose own
    baseline drifts. First row of each user yields NULL (undefined
    sample stddev), matching both engines' semantics.

    One keyed window sort with an O(1) frame — parallel across users at
    any scale; event_id tiebreaks pin the frame so the float sequence is
    identical across engines before the 4dp round.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0)
    )
    return e.select(
        "event_id", "user_id", (F.round(z, 4) + F.lit(0.0)).alias("roll_z")
    )


@register(
    "e_win_vwap",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderdate,
           CAST(floor(sum(cents * w8) OVER w * 1.0
                      / sum(w8) OVER w) AS BIGINT) AS wavg_cents
    FROM (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                 1 + o_orderkey % 3 AS w8 FROM orders)
    WINDOW w AS (PARTITION BY o_orderstatus,
                              date_trunc('month', o_orderdate)
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def e_win_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored weighted running average (the VWAP shape): per order
    status, the weight-adjusted mean price accumulated SINCE THE MONTH
    STARTED — two running sums that reset at each anchor boundary because
    the anchor is part of the window partition key, not a filter. The
    standard market/ops metric for "average so far this period".

    Weights here are a deterministic per-row stand-in (1 + key mod 3);
    in production they're quantities. Prices enter as EXACT integer cents
    so both running sums are integers and the reported value is the
    FLOOR-quantized cent amount: engines round the same double
    differently exactly at half-cent quotients (observed 144260.175 →
    .17 vs .18), while floor of a bit-identical quotient cannot diverge.
    """
    o = (
        load(spark, sf_dir, "orders")
        .withColumn("w8", 1 + F.col("o_orderkey") % 3)
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("long")
        )
    )
    w = (
        Window.partitionBy(
            "o_orderstatus", F.date_trunc("month", F.col("o_orderdate"))
        )
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.floor(
            F.sum(F.col("cents") * F.col("w8")).over(w)
            * 1.0
            / F.sum("w8").over(w)
        ).cast("long").alias("wavg_cents"),
    )


@register(
    "e_win_drawdown",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             max(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS peak_cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey, cents, peak_cents,
           round(1.0 - cents * 1.0 / peak_cents, 4) AS drawdown
    FROM seq
    """,
)
def e_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running drawdown per customer: each order's price relative to that
    customer's running-maximum order price (1 − x/peak) — the
    finance-style "distance from high-water mark" window, and in ops the
    per-key degradation signal ("this feed's batch sizes are 60% off
    their peak"). A running max is the one O(1)-state window even easier
    than a sum — no retraction, monotone merge.

    Prices enter as exact integer cents (the e_win_vwap lesson: float
    window accumulation orders differ across engines); the single ratio
    divides bit-identical integers before the 4dp round.
    """
    o = load(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        F.max("cents").over(w).alias("peak_cents"),
        F.round(
            1.0 - F.col("cents") * 1.0 / F.max("cents").over(w), 4
        ).alias("drawdown"),
    )


@register(
    "e_win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(is_first) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def e_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user: how many distinct event types each
    user has seen up to and including each event — the feature-breadth /
    product-adoption curve. ``count(DISTINCT) OVER`` is unsupported in
    every engine for ROWS frames; the standard rewrite is the
    FIRST-OCCURRENCE trick: flag each (user, type)'s first event with one
    keyed rank window, then a running sum of flags — two windows over the
    SAME (user)-keyed exchange (Catalyst reuses the partitioning; the
    second window only re-sorts within partitions), exact integers
    throughout.
    """
    e = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1)
        .otherwise(0)
        .alias("is_first"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("is_first").over(w_run).cast("long").alias(
            "distinct_types_so_far"
        ),
    )


@register(
    "k_markov_stationary",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ), p AS (
      SELECT prev_type, next_type,
             n * 1.0 / sum(n) OVER (PARTITION BY prev_type) AS pr
      FROM t
    ), states AS (SELECT DISTINCT prev_type AS st FROM t),
    v0 AS (
      SELECT st, 1.0 / (SELECT count(*) FROM states) AS v FROM states
    ), v1 AS (
      SELECT p.next_type AS st, sum(v0.v * p.pr) AS v
      FROM p JOIN v0 ON p.prev_type = v0.st GROUP BY 1
    ), v2 AS (
      SELECT p.next_type AS st, sum(v1.v * p.pr) AS v
      FROM p JOIN v1 ON p.prev_type = v1.st GROUP BY 1
    ), v3 AS (
      SELECT p.next_type AS st, sum(v2.v * p.pr) AS v
      FROM p JOIN v2 ON p.prev_type = v2.st GROUP BY 1
    )
    SELECT st AS event_type, round(v, 6) AS stationary_p
    FROM v3
    """,
)
def k_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the behavior Markov chain (three
    unrolled power iterations from uniform — the k_graph_pagerank recipe
    applied to k_event_transitions' matrix): the long-run share of each
    event type if users keep behaving like this, i.e. the equilibrium the
    funnel drifts toward. Divergence between this and today's observed
    event mix is a leading indicator of mix shift.

    The chain matrix is E×E (event-type cardinality — single digits), so
    every iteration is a broadcast join over a handful of rows; the only
    data-sized work is the lag window + transition count that
    k_event_transitions already defines. Fixed iteration count keeps both
    engines bit-comparable (no fixpoint nondeterminism).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    p = t.select(
        "prev_type",
        "next_type",
        (F.col("n") * 1.0 / F.sum("n").over(wp)).alias("pr"),
    ).localCheckpoint()
    states = p.select(F.col("prev_type").alias("st")).distinct()
    n_states = states.count()
    v = states.select("st", F.lit(1.0 / n_states).alias("v"))
    for _ in range(3):
        v = (
            p.join(F.broadcast(v), p.prev_type == v.st)
            .groupBy(F.col("next_type").alias("st"))
            .agg(F.sum(F.col("v") * F.col("pr")).alias("v"))
        )
    return v.select(
        F.col("st").alias("event_type"),
        F.round("v", 6).alias("stationary_p"),
    )


@register(
    "e_win_hampel_repair",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, value,
             quantile_cont(value, 0.5) OVER w AS med,
             quantile_cont(value, 0.75) OVER w
               - quantile_cont(value, 0.25) OVER w AS iqr
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, round(value, 4) AS value,
           abs(value - med) > 1.5 * iqr AS is_outlier,
           round(CASE WHEN abs(value - med) > 1.5 * iqr
                 THEN med ELSE value END, 4) AS repaired
    FROM r
    """,
)
def e_win_hampel_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-style rolling outlier REPAIR: each value is screened against
    its trailing 7-event robust window (|x − median| > 1.5·IQR) and
    outliers are replaced by the window median — the despiking filter a
    metrics pipeline runs before feeding dashboards or anomaly baselines
    (unlike z-score screens, the robust window is immune to the outlier
    contaminating its own threshold). Emits the flag AND the repaired
    series.

    One keyed window sort per user, frames bounded at 7 rows — the same
    exact-percentile-over-frame contract as e_win_rolling_median
    (Spark `percentile` ≡ DuckDB `quantile_cont`), embarrassingly
    parallel across users.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    iqr = F.expr("percentile(value, 0.75)").over(w) - F.expr(
        "percentile(value, 0.25)"
    ).over(w)
    r = e.select(
        "event_id",
        "user_id",
        "value",
        med.alias("med"),
        iqr.alias("iqr"),
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 1.5 * F.col("iqr")
    return r.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        is_out.alias("is_outlier"),
        F.round(
            F.when(is_out, F.col("med")).otherwise(F.col("value")), 4
        ).alias("repaired"),
    )


# --------------------------------------------- Markov absorption probs ----


def _markov_abs_steps() -> str:
    steps = ""
    prev = "a0"
    for i in range(1, 9):
        steps += f""", a{i} AS (
      SELECT p.src AS st, a.target, sum(p.pr * a.pr) AS pr
      FROM pt p JOIN {prev} a ON p.dst = a.st GROUP BY p.src, a.target
    )"""
        prev = f"a{i}"
    return steps


def _markov_abs_reduced_sql() -> str:
    """The corpus reduction alone: events -> the <= |states|²+2-row
    transition-probability table pt (the chain state)."""
    return """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
      -- CAST AS DOUBLE everywhere: x.y literals parse as DECIMAL in both
      -- engines, and 8 multiplicative steps of decimal-rounded arithmetic
      -- drift from double arithmetic past the 6dp output rounding.
      SELECT prev_type AS src, next_type AS dst,
             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS pr
      FROM t WHERE prev_type NOT IN ('purchase', 'error')
      UNION ALL SELECT 'purchase', 'purchase', CAST(1.0 AS DOUBLE)
      UNION ALL SELECT 'error', 'error', CAST(1.0 AS DOUBLE)
    """


def _markov_abs_main_sql(pt_source: str) -> str:
    """The 8-step absorption chain over a pt relation (a subquery for the
    oracle's single WITH-chain, a checkpointed view on the Spark side)."""
    return f"""
    WITH pt AS ({pt_source}), a0 AS (
      SELECT 'purchase' AS st, 'purchase' AS target, CAST(1.0 AS DOUBLE) AS pr
      UNION ALL SELECT 'error', 'error', CAST(1.0 AS DOUBLE)
    ){_markov_abs_steps()}
    SELECT st AS from_state, target AS absorbed_into,
           round(pr, 6) AS p_absorbed_8
    FROM a8
    WHERE st NOT IN ('purchase', 'error')
    """


def _body_markov_absorption() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view): 8
    unrolled absorption steps of the user-journey chain."""
    return _markov_abs_main_sql(_markov_abs_reduced_sql())


@register("k_markov_absorption", oracle=_body_markov_absorption())
def k_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probabilities of the per-user event-journey Markov
    chain: with `purchase` and `error` as absorbing states, the
    probability that a journey starting in each transient state (view /
    click / signup) has been absorbed into each outcome within 8 steps —
    the "where do sessions END UP" readout k_markov_stationary's
    long-run mix cannot give (stationary analysis has no notion of
    first-passage outcome). 8 unrolled steps ARE the spec (finite-horizon
    absorption), written once as a shared ANSI body both engines parse.

    Scale: the corpus collapses to the ≤|states|² transition table in
    the first two shuffles (lag window + count); every unrolled step is
    a join-aggregate over ≤ 5×2 probability rows — constant-size work
    regardless of corpus. All floats derive from exact integer count
    ratios through the identical formula text; output rounds at 6dp.

    r13: Spark inlines the multi-referenced `pt` CTE per reference, so
    the pure WITH-chain re-ran the events lag-window + count per
    unrolled step wherever ReusedExchange failed to dedup. The Spark
    side now checkpoints the ≤27-row pt spine and runs the chain over
    the view (exactly 1 corpus scan by construction; interleaved A/B
    1.70 -> 1.27 s min at sf0.1, new wins all 5 reps — the residual is
    the 8 sequential spine-stage latencies); the DuckDB oracle keeps
    the single chain — it materializes multi-referenced CTEs.
    """
    import uuid as _uuid

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    view = f"dss_markov_abs_{_uuid.uuid4().hex[:12]}"
    spark.sql(_markov_abs_reduced_sql()).localCheckpoint() \
        .createOrReplaceTempView(view)
    try:
        return spark.sql(_markov_abs_main_sql(f"SELECT * FROM {view}"))
    finally:
        spark.catalog.dropTempView(view)

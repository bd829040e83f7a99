"""Pipeline-health monitors over the event stream (SURVEY.md §2.O
continuation of the zscore/PSI family in training.py).

A production ingest is guarded by monitors that are robust to the very
anomalies they hunt: CUSUM locates WHERE a level shift happened (not just
that some day is extreme), and MAD-based robust z-scores survive the heavy
tails that inflate a plain stddev until real outliers look normal. Both are
two-level aggregates — per-day/per-type rollups first, dimension-sized
statistics second — so corpus-sized rows cross exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import load
from data_service_spark.registry import register

# ----------------------------------------------- CUSUM changepoint ----


@register(
    "k_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), mu AS (
      SELECT event_type, avg(n) AS mu FROM daily GROUP BY 1
    ), cs AS (
      SELECT d.event_type, d.day, d.n,
             sum(d.n - mu.mu) OVER (PARTITION BY d.event_type
                                    ORDER BY d.day) AS cusum
      FROM daily d JOIN mu USING (event_type)
    )
    SELECT event_type, day, n, round(cusum, 4) + 0.0 AS cusum,
           (row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(round(cusum, 4)) DESC, day) = 1)
             AS is_changepoint
    FROM cs
    """,
)
def k_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization per event type: the centered
    cumulative sum C_t = Σ(n_i − μ) over daily counts peaks (in |C|) at the
    most likely level-shift day (Page 1954 / Pettitt's statistic). Where
    k_anomaly_zscore flags extreme DAYS, this locates the REGIME BOUNDARY —
    the question an ingest post-mortem actually asks.

    Daily rollup is the only corpus-sized aggregate; the cumulative window
    and the argmax ranking both run over (types × days) rows. The argmax
    ranks on the 4dp-ROUNDED |cusum| so float last-ulp noise cannot flip
    the flagged day between engines (day tiebreak).
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    mu = daily.groupBy("event_type").agg(F.avg("n").alias("mu"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = daily.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "day",
        "n",
        F.sum(F.col("n") - F.col("mu")).over(wc).alias("cusum"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.round("cusum", 4)).desc(), "day"
    )
    return cs.select(
        "event_type",
        "day",
        "n",
        (F.round("cusum", 4) + F.lit(0.0)).alias("cusum"),
        (F.row_number().over(wr) == 1).alias("is_changepoint"),
    )


# --------------------------------------------- MAD robust outliers ----


@register(
    "k_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ), mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(floor(0.6745 * (e.value - m.med) / d.mad * 1e4) AS BIGINT)
             AS z_q
    FROM events e JOIN med m USING (event_type)
                  JOIN mad d USING (event_type)
    WHERE abs(0.6745 * (e.value - m.med) / d.mad) >= 3.0
    """,
)
def k_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-value outlier screen: |0.6745·(x − median)/MAD| ≥ 3.0
    per event type (Iglewicz–Hoaglin modified z-score). Unlike the stddev
    z-score, median/MAD have a 50% breakdown point — a bot flood cannot
    mask itself by inflating the spread estimate it is scored against.

    Two dimension-sized statistic passes (median, then MAD of residuals),
    each an exact-percentile aggregate with map-side partials; both
    broadcast back into a scan-stage filter, so the corpus is read twice
    and never shuffled. Spark's exact `percentile` and DuckDB's
    `quantile_cont` share the linear-interpolation definition; med/MAD are
    pinned at 6dp and the score floor-quantized at 1e-4 (z_q) because a z
    landing exactly on a .00005 boundary rounds differently across engines
    (observed at sf0.1: 3.85225 → 3.8522 vs 3.8523).
    """
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"))
    )
    z = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) >= 3.0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.floor(z * 1e4).cast("long").alias("z_q"),
        )
    )


@register(
    "k_trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           round(avg(value), 4) AS plain_mean,
           round(avg(value) FILTER (WHERE rn > n * 0.05
                                      AND rn <= n * 0.95), 4)
             AS trimmed_mean_90
    FROM ranked GROUP BY event_type
    """,
)
def k_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-each-side TRIMMED mean per event type next to the plain mean —
    the robust location estimate between mean (0% trim) and median (50%
    trim): when the two disagree materially, the tails are driving the
    metric and k_tail_hill / k_anomaly_mad explain why.

    Trim membership comes from exact integer ranks (row_number with
    event_id tiebreak), not interpolated percentiles — no cross-engine
    quantile surface at all. One keyed window sort + one grouped
    conditional average.
    """
    e = load(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    inner = (F.col("rn") > F.col("n") * 0.05) & (
        F.col("rn") <= F.col("n") * 0.95
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.avg("value"), 4).alias("plain_mean"),
        F.round(F.avg(F.when(inner, F.col("value"))), 4).alias(
            "trimmed_mean_90"
        ),
    )


@register(
    "k_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.5) / 1e6, 2) AS p50_s,
           round(quantile_cont(gap_us, 0.99) / 1e6, 2) AS p99_s,
           round(avg(gap_us) / 1e6, 2) AS mean_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def k_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-time profile per event type (median / p99 / mean gap
    in seconds): the throughput-stability fingerprint — a p99 far above
    the median means bursty arrival (batch-flush upstream), a mean far
    above the median means stalls; feeds capacity models and the
    watermark-delay choice for the streaming twins.

    One keyed window lag (O(1) state), gaps as exact integer
    MICROSECONDS (the k_conversion_lag lesson — second-granularity
    diffs diverge across engines), percentiles interpolated over
    identical integers.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER "
            "(PARTITION BY event_type ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 2).alias("p50_s"),
        F.round(F.expr("percentile(gap_us, 0.99)") / 1e6, 2).alias("p99_s"),
        F.round(F.avg("gap_us") / 1e6, 2).alias("mean_s"),
    )

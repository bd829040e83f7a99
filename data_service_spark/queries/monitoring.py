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


# ----------------------------------------------- Theil–Sen robust slope ----


@register(
    "k_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             (b.n - a.n) * 1.0 / (b.d - a.d) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM slopes
    )
    SELECT event_type,
           (SELECT CAST(count(*) AS BIGINT) FROM daily dd
            WHERE dd.event_type = ranked.event_type) AS n_days,
           CAST(max(cnt) AS BIGINT) AS n_pairs,
           CAST(round(min(CASE WHEN rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
                          THEN slope END), 6)
             + 0.0 AS DOUBLE) AS ts_slope
    FROM ranked GROUP BY event_type
    """,
)
def k_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope per event type: the LOWER MEDIAN of all
    pairwise day-count slopes — a 29.3%-breakdown trend estimate that one
    outage day cannot bend, unlike the least-squares slope it sits next to
    (the `k_daily_growth` / `k_forecast_snaive` family). Lower median
    (rank ⌈n/2⌉ = floor((n+1)/2), computed with integer arithmetic so an
    EVEN pair count still matches a rank — float (n+1)/2 silently matched
    nothing for even n, ADVICE r04) instead of the interpolated median so
    the answer is one actual slope value both engines pick identically;
    slopes are exact int/int divisions.

    Scale shape: the corpus reduces to a ~30-row daily spine per type
    FIRST, so the O(days²) pair join is over a dimension-sized table by
    construction — the classic guard for quadratic statistics.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts").cast("date"),
                   F.lit("2024-01-01").cast("date")).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.n") - F.col("a.n")) * 1.0 / (F.col("b.d") - F.col("a.d")))
        .alias("slope"),
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    med = ranked.groupBy("event_type").agg(
        F.max("cnt").cast("long").alias("n_pairs"),
        (
            F.round(
                F.min(
                    F.when(
                        F.col("rn")
                        == F.floor((F.col("cnt") + 1) / 2).cast("long"),
                        F.col("slope"),
                    ).cast("double")
                ),
                6,
            )
            + 0.0
        ).cast("double").alias("ts_slope"),
    )
    return n_days.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs", "ts_slope"
    )


# -------------------------------------------------- Bollinger monitor ----


@register(
    "e_win_bollinger",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT event_type, day, cents,
             sum(cents) OVER w AS s1,
             sum(cents * cents) OVER w AS s2,
             count(*) OVER w AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, CAST(cents AS BIGINT) AS cents,
           CAST(floor(s1 * 1000.0 / n) AS BIGINT) AS mean7_tenths,
           CAST(floor(sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1)) * 1000.0)
             AS BIGINT) AS sd7_tenths,
           (n >= 7 AND abs(cents - s1 * 1.0 / n)
              > 2.0 * sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1))) AS breach
    FROM win WHERE n > 1
    """,
)
def e_win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band volume monitor: per event type, the trailing-7-day
    mean ± 2σ envelope over daily value mass, with a breach flag once the
    window is full — the rolling two-sided control chart between the
    global z-score (`k_anomaly_zscore`) and the robust Hampel repair
    (`e_win_hampel_repair`). All window sums run over exact integer
    CENTS (never floats), so the rolling moments are identical under any
    accumulation order — the e_win_vwap lesson; outputs are
    floor-quantized tenths (scale factors adjusted to the cent grid).
    Cents, not ten-thousandths, because the SQUARED daily-mass sum is
    the int64 governor: a daily mass past ~3×10⁹ quantization units
    wraps cents², which at 1e-4 units was ~6k purchase-level events/day
    — the isotropy overflow class (DuckDB widens to HUGEINT, Spark
    silently wraps). At 1e-2 units the same wrap needs ~10⁷ events/day
    per type at this value range; past that, re-quantize the daily mass
    to whole units before squaring.

    Scale shape: one map-side daily rollup, then windows over the
    |types|×|days| spine — corpus rows cross one shuffle.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    win = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter("n > 1")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    mean = F.col("s1") * 1.0 / F.col("n")
    return win.select(
        "event_type",
        "day",
        F.col("cents").cast("long"),
        F.floor(F.col("s1") * 1000.0 / F.col("n")).cast("long").alias(
            "mean7_tenths"
        ),
        F.floor(sd * 1000.0).cast("long").alias("sd7_tenths"),
        (
            (F.col("n") >= 7)
            & (F.abs(F.col("cents") - mean) > 2.0 * sd)
        ).alias("breach"),
    )


# ------------------------------------------------- seasonal strength ----


@register(
    "k_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             (dayofweek(CAST(date_trunc('day', ts) AS DATE)) + 7) % 7 AS dow,
             count(*) AS y
      FROM events GROUP BY 1, 2, 3
    ), comp AS (
      SELECT event_type, day, y,
             avg(y * 1.0) OVER (PARTITION BY event_type, dow) AS s_dow,
             avg(y * 1.0) OVER (PARTITION BY event_type) AS mu
      FROM daily
    ), q AS (
      SELECT event_type,
             CAST(round((y - mu) * 1000000) AS BIGINT) AS dev,
             CAST(round((y - s_dow) * 1000000) AS BIGINT) AS resid
      FROM comp
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(floor(greatest(0.0,
                 1.0 - (sum(resid * 1.0 * resid)
                        - sum(resid) * 1.0 * sum(resid) / count(*))
                       / nullif(sum(dev * 1.0 * dev)
                        - sum(dev) * 1.0 * sum(dev) / count(*), 0.0))
               * 10000) AS BIGINT) AS seasonal_strength_bp
    FROM q GROUP BY event_type
    """,
)
def k_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength score per event type (Hyndman's FeatuRes measure,
    additive weekly form): 1 − Var(y − s_dow)/Var(y − μ), where s_dow is
    the day-of-week mean level — ≈0 for a flat feed, →1 when the weekly
    cycle explains the variance. Tells the monitors whether to baseline
    on a weekly profile (`k_seasonal_dow`) or a flat mean
    (`k_anomaly_zscore`). Deviations are quantized to exact integer
    micro-units BEFORE the variance power sums, so accumulation order
    cannot flip a bit; dow is pinned Sunday=0 on both engines.

    Scale shape: daily rollup → per-type windows over a 30-row spine →
    5-row aggregate.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        ((F.dayofweek(F.date_trunc("day", "ts").cast("date")) - 1) % 7).alias(
            "dow"
        ),
    ).agg(F.count(F.lit(1)).alias("y"))
    comp = daily.select(
        "event_type",
        "day",
        "y",
        F.avg(F.col("y") * 1.0)
        .over(Window.partitionBy("event_type", "dow"))
        .alias("s_dow"),
        F.avg(F.col("y") * 1.0)
        .over(Window.partitionBy("event_type"))
        .alias("mu"),
    )
    q = comp.select(
        "event_type",
        F.round((F.col("y") - F.col("mu")) * 1000000).cast("long").alias("dev"),
        F.round((F.col("y") - F.col("s_dow")) * 1000000)
        .cast("long")
        .alias("resid"),
    )
    n = F.count(F.lit(1))
    ss_resid = F.sum(F.col("resid") * 1.0 * F.col("resid")) - F.sum(
        "resid"
    ) * 1.0 * F.sum("resid") / n
    ss_dev = F.sum(F.col("dev") * 1.0 * F.col("dev")) - F.sum(
        "dev"
    ) * 1.0 * F.sum("dev") / n
    return q.groupBy("event_type").agg(
        n.cast("long").alias("n_days"),
        F.floor(
            F.greatest(F.lit(0.0), 1.0 - ss_resid / F.nullif(ss_dev, F.lit(0.0)))
            * 10000
        )
        .cast("long")
        .alias("seasonal_strength_bp"),
    )


# ------------------------------------------------------- 14-day RSI ----


@register(
    "e_win_rsi",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 10000) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ), delta AS (
      SELECT event_type, day, cents,
             cents - lag(cents) OVER (PARTITION BY event_type ORDER BY day)
               AS d
      FROM daily
    ), win AS (
      SELECT event_type, day,
             sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS gain,
             sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS loss,
             count(d) OVER w AS n
      FROM delta
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           CAST(gain AS BIGINT) AS gain14, CAST(loss AS BIGINT) AS loss14,
           CAST(floor(10000.0 * gain / nullif(gain + loss, 0)) AS BIGINT)
             AS rsi_bp
    FROM win WHERE n >= 14
    """,
)
def e_win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Wilder's relative-strength index, simple-average form,
    as RSI = 100·gain/(gain+loss)) over daily value mass per event type —
    the bounded momentum oscillator ops dashboards read for
    overheating/cooling feeds (>70 / <30 in conventional units; here exact
    basis points of the [0,100] scale /100). Gains and losses accumulate
    as exact integer ten-thousandths; emitted only once 14 deltas exist
    (Wilder's warm-up rule), so every row is a full window.

    Scale shape: daily rollup map-side, lag + 14-row window over the
    dimension-sized spine.
    """
    ev = load(spark, sf_dir, "events")
    # 1e-4 grid is fine HERE: RSI sums are linear in the daily mass (no
    # squared term, unlike e_win_bollinger's cents-grid governor).
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 10000).cast("long")).alias("cents"))
    wl = Window.partitionBy("event_type").orderBy("day")
    delta = daily.select(
        "event_type",
        "day",
        (F.col("cents") - F.lag("cents").over(wl)).alias("d"),
    )
    w14 = wl.rowsBetween(-13, 0)
    win = delta.select(
        "event_type",
        "day",
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0)).over(w14).alias(
            "gain"
        ),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0))
        .over(w14)
        .alias("loss"),
        F.count("d").over(w14).alias("n"),
    ).filter("n >= 14")
    return win.select(
        "event_type",
        "day",
        F.col("gain").cast("long").alias("gain14"),
        F.col("loss").cast("long").alias("loss14"),
        F.floor(
            10000.0 * F.col("gain") / F.nullif(F.col("gain") + F.col("loss"),
                                               F.lit(0))
        )
        .cast("long")
        .alias("rsi_bp"),
    )


# ------------------------------------------------ Page–Hinkley drift ----


def _body_page_hinkley() -> str:
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CAST(round(value * 10000, 0) AS BIGINT)) AS s,
             count(*) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), seq AS (
      SELECT d, CAST(floor(s * 1.0 / c) AS BIGINT) AS md,
             row_number() OVER (ORDER BY d) AS t
      FROM daily
    ), dev AS (
      SELECT d, md, t,
             md - CAST(floor(sum(md) OVER (ORDER BY t) * 1.0 / t)
                       AS BIGINT) AS dv
      FROM seq
    ), m AS (
      SELECT d, md, t, sum(dv) OVER (ORDER BY t) AS m_t FROM dev
    )
    SELECT d, md AS mean_quanta,
           CAST(m_t AS BIGINT) AS m_t,
           CAST(max(m_t) OVER (ORDER BY t) - m_t AS BIGINT) AS ph_dec,
           CAST(m_t - min(m_t) OVER (ORDER BY t) AS BIGINT) AS ph_inc,
           (max(m_t) OVER (ORDER BY t) - m_t > 200000) AS alarm_dec,
           (m_t - min(m_t) OVER (ORDER BY t) > 200000) AS alarm_inc
    FROM m
    """


@register("k_page_hinkley", oracle=_body_page_hinkley())
def k_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley drift detector on the daily purchase-mean series: the
    sequential change-point monitor production pipelines run on a metric
    stream (the CUSUM family; ``k_changepoint_cusum`` is the offline
    retrospective twin). m_t accumulates deviations from the running mean;
    PH⁻ = max m − m_t alarms on mean DECREASE, PH⁺ = m_t − min m on
    increase, threshold λ = 20 value-units. Every term floor-quantizes to
    integer ten-thousandths before accumulation (daily mean, then the
    running-mean deviation), so all cumulative sums and extrema are exact
    BIGINT — no float accumulation anywhere.

    Scale shape: the fact table reduces map-side to the day spine; all
    windows run over that spine (hundreds of rows) in one task. At
    production scale this runs incrementally: the streaming twin keeps
    (t, Σmd, m_t, max m, min m) as O(1) state per metric."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_page_hinkley())


# ------------------------------------------- rolling correlation ----


@register(
    "e_win_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS x,
             sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS y
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ), w AS (
      SELECT d,
             count(*) OVER win AS n,
             sum(x) OVER win AS sx, sum(y) OVER win AS sy,
             sum(x * y) OVER win AS sxy,
             sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy
      FROM daily
      WINDOW win AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT d, CAST(n AS BIGINT) AS n,
           CAST(round(
             (n * sxy - sx * sy)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
             6) + 0.0 AS DOUBLE) AS corr_14d
    FROM w WHERE n >= 14
    """,
)
def e_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily purchase and click
    revenue — the co-movement monitor that flags when two metrics that
    normally track each other decouple (instrumentation break, funnel
    shift) before either one's own control chart fires. Both series
    quantize to integer cents. int64 overflow governor: the binding term
    is NOT the windowed Σx² but the final expression's CROSS PRODUCT
    sx·sx ≈ (14·daily_cents)² = 196·daily_cents², which wraps once a
    day's cents exceed √(2⁶³/196) ≈ 2.1e8 (DuckDB computes it in
    HUGEINT, Spark wraps silently); this corpus peaks at ~3.7e6
    cents/day (sf0.1) — ~50× inside the bound — and the mitigation is to
    requantize to whole currency units (×100² headroom on the squared
    term) before any corpus that approaches it. All five windowed power sums
    (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs, so the correlation is one
    final expression over identical integers in both engines — the
    bivariate extension of the ``e_win_bollinger`` order-proof-moment
    pattern. NULL where a window has zero variance.

    Scale shape: map-side reduce to the day spine; one 14-row window
    over hundreds of rows."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS x,
             sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS y
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ), w AS (
      SELECT d,
             count(*) OVER win AS n,
             sum(x) OVER win AS sx, sum(y) OVER win AS sy,
             sum(x * y) OVER win AS sxy,
             sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy
      FROM daily
      WINDOW win AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT d, CAST(n AS BIGINT) AS n,
           CAST(round(
             (n * sxy - sx * sy)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
             6) + 0.0 AS DOUBLE) AS corr_14d
    FROM w WHERE n >= 14
    """
    )


def _body_lag_ccf() -> str:
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS x,
             sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value * 100, 0) AS BIGINT) END) AS y
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ), pairs AS (
      SELECT l.lag, a.x, b.y
      FROM (SELECT explode(sequence(-7, 7)) AS lag) l
      JOIN daily a ON true
      JOIN daily b ON b.d = a.d + l.lag
    ), g AS (
      SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
           CAST(round(
             (n * sxy - sx * sy)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
             6) + 0.0 AS DOUBLE) AS ccf
    FROM g
    """


@register(
    "k_lag_corr_ccf",
    oracle=_body_lag_ccf().replace(
        "(SELECT explode(sequence(-7, 7)) AS lag)",
        "(SELECT CAST(b - 7 AS INT) AS lag FROM range(15) t(b))",
    ),
)
def k_lag_corr_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily purchase and click revenue
    at lags −7..+7 days: the lead–lag discovery tool (does click volume
    LEAD purchases, and by how many days?) that turns "the metrics look
    related" into an actionable offset for forecasting features and
    incident root-causing. Same integer power-sum determinism as
    ``e_win_rolling_corr``, and the same int64 overflow governor: the
    binding term is the final n·sxx − sx·sx cross product where sx is
    the WHOLE spine's cents (≈1e8 here → sx² ≈ 1e16 ≪ 2⁶³; wraps once
    total-period cents exceed ~3e9 — requantize to whole currency units
    before a corpus that approaches it); the lag alignment is a
    calendar-date equi-join
    (b.d = a.d + lag), so gaps in the day spine self-exclude instead of
    silently shifting the series (the row-number-alignment bug this
    formulation avoids).

    Scale shape: everything after the map-side day reduce runs on a
    15×|days| spine — dimension-sized."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_lag_ccf())


# ------------------------------------- classical seasonal decompose ----


def _body_seasonal_decompose() -> str:
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
      FROM events GROUP BY 1
    ), tr AS (
      SELECT d, v,
             CAST(extract(dayofweek_iso FROM d) AS INT) AS dow,
             count(*) OVER win AS n7,
             CAST(floor(sum(v) OVER win * 1.0 / 7) AS BIGINT) AS trend
      FROM daily
      WINDOW win AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
      SELECT d, v, dow, trend, v - trend AS detrended
      FROM tr WHERE n7 = 7
    ), seas AS (
      SELECT dow,
             CAST(floor(sum(detrended) * 1.0 / count(*)) AS BIGINT)
               AS seasonal
      FROM det GROUP BY dow
    )
    SELECT det.d, CAST(det.v AS BIGINT) AS v_cents,
           det.trend AS trend_cents,
           s.seasonal AS seasonal_cents,
           CAST(det.v - det.trend - s.seasonal AS BIGINT) AS residual_cents
    FROM det JOIN seas s ON det.dow = s.dow
    """


@register(
    "k_seasonal_decompose",
    oracle=_body_seasonal_decompose().replace(
        "extract(dayofweek_iso FROM d)", "extract(isodow FROM d)"
    ),
)
def k_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    trend = centered 7-day moving average (full windows only), seasonal =
    per-ISO-weekday mean of the detrended series, residual = the rest —
    the decomposition behind every "is this dip weekday effect or real"
    triage, and the model ``k_forecast_snaive``'s seasonal-naive baseline
    implicitly assumes. Values are integer cents; trend and seasonal
    floor-quantize (exact-integer window sums ÷ constants), so all three
    components are exact BIGINTs that sum back to v up to the published
    floors. ISO weekday aligns the engines (Spark ``dayofweek_iso`` =
    DuckDB ``isodow`` — probed; the non-ISO specifiers disagree by one).

    Scale shape: map-side day reduce, one 7-row window + one 7-group
    reduce over the day spine."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_seasonal_decompose())


# ------------------------------------------- same-weekday anomaly ----


def _body_dow_anomaly() -> str:
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(extract(dayofweek_iso FROM
                          CAST(date_trunc('day', ts) AS DATE)) AS INT)
               AS dow,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), base AS (
      SELECT d, dow, v,
             count(*) OVER w AS n,
             sum(v) OVER w AS s1,
             sum(v * v) OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY dow ORDER BY d
                   ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, dow, CAST(v AS BIGINT) AS v_cents,
           CAST(n AS BIGINT) AS n_baseline,
           CAST(round(
             (v - CAST(s1 AS DOUBLE) / n)
             / nullif(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                           / (n - 1)), 0),
             6) + 0.0 AS DOUBLE) AS dow_zscore
    FROM base WHERE n >= 3
    """


@register(
    "e_win_dow_anomaly",
    oracle=_body_dow_anomaly().replace(
        "extract(dayofweek_iso FROM", "extract(isodow FROM"
    ),
)
def e_win_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-weekday anomaly score: each day's revenue standardized against
    the TRAILING 4 occurrences of the same ISO weekday — the seasonality-
    aware control chart (a raw rolling z (``e_win_zscore_rolling``) flags
    every Sunday as an anomaly on a weekday-cyclic metric; comparing
    Sundays to Sundays removes exactly that). Cents-integer window power
    sums (the order-proof-moment pattern), strictly-past frame (4..1
    PRECEDING — no self-inclusion leak), NULL where the baseline has zero
    variance. int64 overflow governor: the 4-row windowed Σv² of daily
    cents (v ≤ ~3.7e6 here → Σv² ≤ ~5.5e13 ≪ 2⁶³; wraps once a day's
    cents exceed √(2⁶³/4) ≈ 1.5e9 — requantize to whole units first);
    the s1·s1 cross term is already computed in DOUBLE.

    Scale shape: day-spine reduce + one window partitioned by weekday
    (7 shards over the spine)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_dow_anomaly())


# ------------------------------------------ simple exponential smoothing ----


@register(
    "k_forecast_ses",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, n,
             CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS t
      FROM daily
    ), terms AS (
      SELECT day, n, t,
             CASE WHEN t = 1 THEN n * 2.0
                  ELSE n * pow(2.0, t - 1.0) END AS c
      FROM idx
    ), sm AS (
      SELECT day, n, t,
             pow(2.0, -t) * sum(c) OVER (ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS s
      FROM terms
    )
    SELECT day, CAST(n AS BIGINT) AS n_events, round(s, 4) AS ses,
           round(lag(s) OVER (ORDER BY t), 4) AS forecast,
           round(n - lag(s) OVER (ORDER BY t), 4) AS forecast_error
    FROM sm
    """,
)
def k_forecast_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α = ½) over the daily event-count
    spine, with the one-step-ahead forecast (yesterday's smoothed level)
    and its error per day — the baseline every ingest-volume forecaster is
    judged against (and the level estimator k_page_hinkley-style drift
    monitors consume).

    The recurrence s_t = α·x_t + (1−α)·s_{t−1} (s_1 = x_1) is a LINEAR
    recurrence, so it unrolls into a closed-form weighted cumulative sum:
    s_t = 2^(−t) · Σ_{i≤t} c_i with c_1 = 2·x_1, c_i = 2^(i−1)·x_i — ONE
    ordered window over the ~30-row day spine instead of a sequential
    driver loop. α = ½ is chosen deliberately: every term is a daily
    count times a power of two (DYADIC), so all products/sums are exact
    in IEEE doubles and both engines hold BIT-IDENTICAL values — no libm
    pow ulp drift, no half-boundary rounding flips (an α = 0.3 draft
    flipped 341.21335 across the 4dp boundary between engines).
    Exactness envelope: x·2^t < 2^53, i.e. ~40 days at sf0.1 daily
    volumes (the corpus spans 30; beyond the envelope the closed form
    graduates to a log-domain or fixed-tap variant).

    Scale: corpus reduces to the day spine in one shuffle; everything
    after is calendar-sized.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    idx = daily.select(
        "day",
        "n",
        F.row_number().over(Window.orderBy("day")).cast("double").alias("t"),
    )
    terms = idx.select(
        "day",
        "n",
        "t",
        F.when(F.col("t") == 1, F.col("n") * 2.0)
        .otherwise(F.col("n") * F.pow(F.lit(2.0), F.col("t") - 1.0))
        .alias("c"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    sm = terms.select(
        "day",
        "n",
        "t",
        (F.pow(F.lit(2.0), -F.col("t")) * F.sum("c").over(w)).alias("s"),
    )
    wl = Window.orderBy("t")
    return sm.select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.round("s", 4).alias("ses"),
        F.round(F.lag("s").over(wl), 4).alias("forecast"),
        F.round(F.col("n") - F.lag("s").over(wl), 4).alias("forecast_error"),
    )


# ------------------------------------------- Western Electric SPC rules ----


@register(
    "k_spc_rules",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, count(*) AS cnt, sum(n) AS sx, sum(n * n) AS sxx
      FROM daily GROUP BY 1
    ), z AS (
      SELECT d.event_type, d.day, d.n,
             (d.n - s.sx / s.cnt)
               / sqrt((s.sxx - s.sx * s.sx / s.cnt) / (s.cnt - 1)) AS z
      FROM daily d JOIN stats s USING (event_type)
      WHERE s.cnt >= 2
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
           round(z, 4) AS zscore,
           abs(z) > 3 AS rule1,
           sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 >= 2
             OR sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 >= 2 AS rule2,
           sum(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 >= 4
             OR sum(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 >= 4 AS rule3,
           sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 = 8
             OR sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 = 8 AS rule4
    FROM z
    WINDOW w3 AS (PARTITION BY event_type ORDER BY day ROWS 2 PRECEDING),
           w5 AS (PARTITION BY event_type ORDER BY day ROWS 4 PRECEDING),
           w8 AS (PARTITION BY event_type ORDER BY day ROWS 7 PRECEDING)
    """,
)
def k_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric control-chart rules over the daily event-count
    spine: rule 1 (point beyond 3σ), rule 2 (2 of 3 consecutive beyond 2σ,
    same side), rule 3 (4 of 5 beyond 1σ, same side), rule 4 (8 consecutive
    on one side of the mean), evaluated per event type. The standard SPC
    battery an ingest-volume monitor runs where a plain z-threshold
    (k_anomaly_zscore) only covers rule 1. Emits every (type, day) with its
    flag vector — the consuming alert layer filters; keeping all rows makes
    the whole chart surface verifiable.

    Mean/σ use the explicit Σ-formula (identical text both engines; the
    power sums accumulate in DOUBLE over the ~30-row-per-type spine, no
    int64 wrap surface). Each rule is a short ROWS-frame count over the
    day-ordered per-type spine — threshold comparisons sit far from any
    ulp boundary because counts are integers and σ is O(n). Types with a
    single active day are fenced out (cnt >= 2, both engines): their σ is
    0/0, NaN in Spark vs setting-dependent in DuckDB.

    Scale: one corpus shuffle to the (type, day) spine; four
    calendar-sized windows after, partitioned by type.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    # cnt >= 2 fence (both engines): a type active on a single day gives
    # 0/0 — NaN in Spark, setting-dependent in DuckDB (ADVICE r11).
    z = (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("cnt") >= 2)
        .select(
        "event_type",
        "day",
        "n",
        (
            (F.col("n") - F.col("sx") / F.col("cnt"))
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("cnt"))
                / (F.col("cnt") - 1)
            )
        ).alias("z"),
        )
    )
    w3 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    w5 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-4, 0)
    w8 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)

    def _cnt(cond, w):
        return F.sum(F.when(cond, 1).otherwise(0)).over(w)

    return z.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n_events"),
        F.round("z", 4).alias("zscore"),
        (F.abs(F.col("z")) > 3).alias("rule1"),
        (
            (_cnt(F.col("z") > 2, w3) >= 2) | (_cnt(F.col("z") < -2, w3) >= 2)
        ).alias("rule2"),
        (
            (_cnt(F.col("z") > 1, w5) >= 4) | (_cnt(F.col("z") < -1, w5) >= 4)
        ).alias("rule3"),
        (
            (_cnt(F.col("z") > 0, w8) == 8) | (_cnt(F.col("z") < 0, w8) == 8)
        ).alias("rule4"),
    )


# --------------------------------------------------- closed-form PACF ----


@register(
    "k_pacf_closed",
    oracle="""
    WITH daily AS (
      SELECT CAST(row_number() OVER (ORDER BY CAST(date_trunc('day', ts)
               AS DATE)) AS BIGINT) AS t,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE)
    ), mu AS (SELECT avg(n) AS m, count(*) AS cnt FROM daily),
    d AS (SELECT t, n - (SELECT m FROM mu) AS x FROM daily),
    denom AS (SELECT sum(x * x) AS s0 FROM d),
    r AS (
      SELECT
        (SELECT sum(a.x * b.x) FROM d a JOIN d b ON a.t = b.t + 1)
          / (SELECT s0 FROM denom) AS r1,
        (SELECT sum(a.x * b.x) FROM d a JOIN d b ON a.t = b.t + 2)
          / (SELECT s0 FROM denom) AS r2,
        (SELECT sum(a.x * b.x) FROM d a JOIN d b ON a.t = b.t + 3)
          / (SELECT s0 FROM denom) AS r3
    )
    SELECT (SELECT CAST(cnt AS BIGINT) FROM mu) AS n_days,
           round(r1, 4) AS acf1, round(r2, 4) AS acf2, round(r3, 4) AS acf3,
           round(r1, 4) AS pacf1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 4) AS pacf2,
           round((r3 - (r1 - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1) * r2
                     - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1)
                 / (1 - (r1 - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1) * r1
                      - ((r2 - r1 * r1) / (1 - r1 * r1)) * r2), 4) AS pacf3
    FROM r
    """,
)
def k_pacf_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1–3, biased estimator) and partial
    autocorrelation of the daily event-count series via the closed-form
    Durbin–Levinson unroll: pacf1 = r1, pacf2 = (r2 − r1²)/(1 − r1²),
    pacf3 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2) with
    φ22 = pacf2, φ21 = r1 − φ22·r1. PACF is the AR-order selector
    (k_autocorr_daily reports raw ACF; the partial series is what decides
    whether lag-2 structure is real or lag-1 echo).

    Lag products come from three self-joins of the DEMEANED calendar
    spine on shifted day index (spine is ~30 rows — the joins are
    dimension-sized), the denominator is one Σx²; x is a demeaned DOUBLE,
    so every power sum accumulates in DOUBLE (no int64 wrap surface) and
    both engines evaluate the identical formula text, rounding at 4dp.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        "n",
    )
    mu = idx.agg(
        F.avg("n").alias("m"), F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # r13: d feeds s0 plus both sides of the three lag self-joins (7
    # references); unpinned, Spark re-derived the corpus daily-count
    # aggregate per reference (14 parquet scans of events, 41 exchanges
    # in the before-plan). The demeaned spine is calendar-sized (~30
    # rows) — pin it once.
    d = idx.crossJoin(F.broadcast(mu)).select(
        "t", (F.col("n") - F.col("m")).alias("x"), "cnt"
    ).localCheckpoint()
    s0 = d.agg(
        F.sum(F.col("x") * F.col("x")).alias("s0"),
        F.max("cnt").alias("cnt"),
    )

    def lag_sum(k: int):
        a = d.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
        b = d.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
        return (
            a.join(b, a.ta == b.tb + k)
            .agg(F.sum(F.col("xa") * F.col("xb")).alias(f"s{k}"))
        )
    num = (
        lag_sum(1)
        .crossJoin(lag_sum(2))
        .crossJoin(lag_sum(3))
        .crossJoin(F.broadcast(s0))
    )
    r = num.select(
        F.col("cnt").alias("n_days"),
        (F.col("s1") / F.col("s0")).alias("r1"),
        (F.col("s2") / F.col("s0")).alias("r2"),
        (F.col("s3") / F.col("s0")).alias("r3"),
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    phi21 = F.col("r1") - phi22 * F.col("r1")
    return r.select(
        "n_days",
        F.round("r1", 4).alias("acf1"),
        F.round("r2", 4).alias("acf2"),
        F.round("r3", 4).alias("acf3"),
        F.round("r1", 4).alias("pacf1"),
        F.round(phi22, 4).alias("pacf2"),
        F.round(
            (F.col("r3") - phi21 * F.col("r2") - phi22 * F.col("r1"))
            / (1 - phi21 * F.col("r1") - phi22 * F.col("r2")),
            4,
        ).alias("pacf3"),
    )


# ---------------------------------------------------- winsorized mean ----


def _body_winsorized() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), k AS (
      -- k = floor(n/20): exact 5% tail count via floor over an exact
      -- double quotient (n < 2^49), identical in both engines.
      SELECT event_type, value, rn, n,
             CAST(floor(n / CAST(20 AS DOUBLE)) AS BIGINT) AS k
      FROM ranked
    ), caps AS (
      SELECT event_type,
             max(CASE WHEN rn = k + 1 THEN value END) AS lo_cap,
             max(CASE WHEN rn = n - k THEN value END) AS hi_cap
      FROM k GROUP BY event_type
    )
    SELECT k.event_type, CAST(max(k.n) AS BIGINT) AS n_events,
           round(avg(k.value), 4) AS mean_raw,
           round(avg(CASE WHEN k.value < c.lo_cap THEN c.lo_cap
                          WHEN k.value > c.hi_cap THEN c.hi_cap
                          ELSE k.value END), 4) AS mean_winsorized,
           round(max(c.lo_cap), 4) AS lo_cap,
           round(max(c.hi_cap), 4) AS hi_cap
    FROM k JOIN caps c ON k.event_type = c.event_type
    GROUP BY k.event_type
    """


@register("k_winsorized_mean", oracle=_body_winsorized())
def k_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-each-side WINSORIZED mean per event type next to the raw mean:
    tail values are CLIPPED to the 5th/95th order statistics rather than
    dropped — the robust location estimate that keeps n constant where
    k_trimmed_mean discards (the right tool when downstream weighting
    needs every row). Caps are exact order statistics selected by rank
    (k = floor(n/20), value at ranks k+1 and n−k, event_id tiebreak) —
    no percentile interpolation, so both engines select the identical
    cap VALUES bit-for-bit and the only float work is two averages.

    One per-type rank window over corpus rows, a dimension-sized cap
    table joined back (AQE broadcasts it), one grouped average pass.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_winsorized())


# ------------------------------------------------- Holt linear trend ----


# The day spine as a standalone fragment: the Spark side of
# k_forecast_holt collects it (calendar-sized) and folds the recurrence
# driver-side; the ORACLE splices it into the full WITH RECURSIVE text
# so DuckDB cross-validates the recursion semantics.
_HOLT_SPINE_SQL = """
      SELECT day, x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1
      ) daily
"""


def _holt_fit_sql(spine_sql: str) -> str:
    return f"""
    WITH RECURSIVE idx AS ({spine_sql}), holt(t, l, b) AS (
      SELECT CAST(1 AS BIGINT), a.x, bb.x - a.x
      FROM idx a JOIN idx bb ON a.t = 1 AND bb.t = 2
      UNION ALL
      SELECT i.t,
             CAST(0.5 AS DOUBLE) * i.x
               + CAST(0.5 AS DOUBLE) * (h.l + h.b),
             CAST(0.25 AS DOUBLE) * i.x
               - CAST(0.25 AS DOUBLE) * h.l
               + CAST(0.75 AS DOUBLE) * h.b
      FROM holt h JOIN idx i ON i.t = h.t + 1
    )
    SELECT i.day, CAST(i.x AS BIGINT) AS n_events,
           round(h.l, 4) + 0.0 AS level,
           round(h.b, 4) + 0.0 AS trend,
           round(lag(h.l + h.b) OVER (ORDER BY h.t), 4) + 0.0 AS forecast
    FROM holt h JOIN idx i ON i.t = h.t
    """


@register("k_forecast_holt", oracle=_holt_fit_sql(_HOLT_SPINE_SQL))
def k_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend method (double exponential smoothing,
    alpha = beta = 1/2) over the daily event-count spine: level l_t =
    alpha*x_t + (1-alpha)(l+b)_{t-1}, trend b_t substituted closed-form
    to 1/4*x_t - 1/4*l_{t-1} + 3/4*b_{t-1}; one-step forecast =
    yesterday's l+b. The trend-aware sibling of ``k_forecast_ses``
    (whose level-only forecast systematically lags a drifting series) —
    together with ``k_forecast_snaive`` they form the classical
    baseline ladder every volume forecaster is judged against.

    Unlike SES, the coupled (l, b) recurrence has a rotation-like
    transition matrix (complex eigenvalues), so no dyadic cumsum
    closed form exists — it runs as a ``WITH RECURSIVE`` CTE (the
    q_recursive_cte surface) stepping the 2-vector once per day.
    Determinism: the recursion fixes the evaluation ORDER, every
    coefficient is an explicit CAST-to-DOUBLE dyadic, and +, *, / are
    IEEE correctly-rounded — both engines walk bit-identical states,
    so the 4dp rounding cannot flip. Init l_1 = x_1, b_1 = x_2 - x_1
    (spines shorter than 2 days emit empty, both engines).

    Scale: the corpus crosses ONE shuffle into the day spine; the
    recursion is calendar-sized and inherently SEQUENTIAL (each state
    needs the previous), so the Spark side collects the spine (30 rows
    — calendar-sized by construction, not corpus-sized) and folds the
    recurrence driver-side in one pass: Spark 4 executes a recursive
    CTE as one job per iteration, which priced this spine at 4-6 s at
    sf0.1 for ~30 scheduler round-trips over 30 rows (measured both
    inlined and spine-checkpointed; ~0.3 s driver-side). Python floats
    are the same IEEE doubles evaluating the same expression tree, so
    the driver fold is bit-identical to the oracle's recursion; the
    4dp roundings run in Spark (HALF_UP — Python round() is banker's).
    The DuckDB oracle keeps the full recursive-CTE text, so the
    recursion semantics stay engine-cross-validated.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    from pyspark.sql import types as T

    spine = sorted(
        spark.sql(_HOLT_SPINE_SQL).collect(), key=lambda r: r.t
    )
    out = []
    if len(spine) >= 2:
        l, b = spine[0].x, spine[1].x - spine[0].x
        prev_lb = None
        for r in spine:
            if r.t > 1:
                prev_lb = l + b
                l, b = (
                    0.5 * r.x + 0.5 * (l + b),
                    0.25 * r.x - 0.25 * l + 0.75 * b,
                )
            out.append((r.day, int(r.x), l, b, prev_lb))
    schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("level_raw", T.DoubleType()),
            T.StructField("trend_raw", T.DoubleType()),
            T.StructField("forecast_raw", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema).select(
        "day",
        "n_events",
        (F.round("level_raw", 4) + F.lit(0.0)).alias("level"),
        (F.round("trend_raw", 4) + F.lit(0.0)).alias("trend"),
        (F.round("forecast_raw", 4) + F.lit(0.0)).alias("forecast"),
    )


# --------------------------------------------- forecast-accuracy panel ----


def _body_forecast_mase() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT day, x,
             lag(x, 1) OVER (ORDER BY day) AS p1,
             lag(x, 7) OVER (ORDER BY day) AS p7
      FROM daily
    ), scored AS (
      -- a 2-row forecaster selector joined once keeps the
      -- corpus-consuming chain single-referenced (a UNION ALL of two
      -- lagged reads re-runs the day-spine aggregation per branch
      -- under Spark's CTE inlining)
      SELECT f.forecaster, l.x,
             CASE WHEN f.forecaster = 'naive_1' THEN l.p1
                  ELSE l.p7 END AS yhat
      FROM lagged l
      CROSS JOIN (SELECT 'naive_1' AS forecaster
                  UNION ALL SELECT 'snaive_7') f
      WHERE CASE WHEN f.forecaster = 'naive_1' THEN l.p1
                 ELSE l.p7 END IS NOT NULL
    ), agg AS (
      SELECT forecaster,
             CAST(count(*) AS BIGINT) AS n_forecasts,
             avg(abs(x - yhat)) AS mae,
             sqrt(sum((x - yhat) * (x - yhat)) / count(*)) AS rmse,
             sum(abs(x - yhat)) / sum(abs(x)) AS wape
      FROM scored GROUP BY forecaster
    )
    SELECT forecaster, n_forecasts,
           round(mae, 4) AS mae,
           round(rmse, 4) AS rmse,
           round(wape, 4) AS wape,
           round(mae / max(CASE WHEN forecaster = 'naive_1'
                                THEN mae END) OVER (), 4) AS mase
    FROM agg
    """


@register("k_forecast_mase", oracle=_body_forecast_mase())
def k_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free forecast-accuracy panel (Hyndman-Koehler 2006) for the
    two classical baselines on the daily event-count spine: naive-1
    (yesterday) and seasonal-naive-7 (same weekday last week), each
    scored with MAE, RMSE, WAPE and MASE (MAE scaled by the in-sample
    naive-1 MAE — the denominator that makes accuracy comparable across
    series; MASE < 1 beats carrying yesterday forward). Complements
    ``k_forecast_snaive``'s MAPE/sMAPE readout with the estimators that
    stay defined when a day's count is zero (MAPE's failure mode).

    Determinism by construction: daily counts are integers, so every
    error, |error| and squared error is an exact integer in DOUBLE;
    the sums stay exact (far inside 2^53), and the final divisions /
    sqrt are IEEE correctly-rounded — bit-identical across engines, no
    rounding-boundary surface at all.

    Scale: one corpus shuffle to the day spine; two lag windows and a
    2-group aggregate after, all calendar-sized.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_forecast_mase())


# --------------------------------------------------- Durbin-Watson ----


def _body_durbin_watson() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day) AS DOUBLE) AS t
      FROM daily
    ), fit AS (
      -- OLS power sums as per-type WINDOW aggregates keep idx
      -- single-referenced (a separate fit aggregate joined back would
      -- re-run the day-spine aggregation under Spark's CTE inlining)
      SELECT event_type, t, x,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             sum(t) OVER w AS st, sum(x) OVER w AS sx,
             sum(t * x) OVER w AS stx, sum(t * t) OVER w AS stt
      FROM idx WINDOW w AS (PARTITION BY event_type)
    ), resid AS (
      SELECT event_type, t, n,
             (n * stx - st * sx) / (n * stt - st * st) AS slope,
             x - (sx - (n * stx - st * sx) / (n * stt - st * st) * st)
                   / n
               - (n * stx - st * sx) / (n * stt - st * st) * t AS e
      FROM fit WHERE n >= 3
    ), diffs AS (
      SELECT event_type, n, slope, e,
             lag(e) OVER (PARTITION BY event_type ORDER BY t) AS ep
      FROM resid
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_days,
           round(max(slope), 6) + 0.0 AS trend_slope,
           round(sum(CASE WHEN ep IS NULL THEN 0.0
                          ELSE (e - ep) * (e - ep) END)
                 / nullif(sum(e * e), 0), 4) + 0.0 AS dw,
           round(1.0 - sum(CASE WHEN ep IS NULL THEN 0.0
                                ELSE (e - ep) * (e - ep) END)
                       / nullif(sum(e * e), 0) / 2, 4) + 0.0
             AS rho_hat
    FROM diffs
    GROUP BY event_type
    """


@register("k_durbin_watson", oracle=_body_durbin_watson())
def k_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation test on the residuals of a
    per-type OLS day trend: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2),
    with rho_hat = 1 - DW/2 as the lag-1 residual autocorrelation
    estimate. The regression-diagnostics companion to ``k_pacf_closed``
    (which reads autocorrelation of the RAW series): DW answers whether
    the day-trend model left structure in the residuals — DW near 2
    means the trend explains the dynamics, near 0/4 means a drifting
    or oscillating remainder the SPC monitors should watch.

    OLS closed form from power sums over the ~30-row per-type spine
    (t and x both exact integers in DOUBLE, so the sums are exact; the
    slope/intercept divisions are the first rounding). Residual sums
    accumulate in DOUBLE — no int64 wrap surface. A perfectly-fit type
    (all residuals zero) yields NULL via nullif, identically in both
    engines, rather than a 0/0 NaN divergence.

    Scale: one corpus shuffle to the (type, day) spine; the fit, the
    residual pass and the lag window are all calendar-sized.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_durbin_watson())


# ----------------------------------------------- Hurst exponent (R/S) ----


def _body_hurst() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM daily
    ), sized AS (
      SELECT ws.w, CAST(floor((i.t - 1) / ws.w) AS BIGINT) AS blk, i.t, i.x
      FROM idx i CROSS JOIN (SELECT 8 AS w UNION ALL SELECT 16) ws
    ), blocks AS (
      SELECT w, blk, t, x,
             count(*) OVER (PARTITION BY w, blk) AS bn,
             avg(x) OVER (PARTITION BY w, blk) AS mu
      FROM sized
    ), cum AS (
      SELECT w, blk, x, mu,
             sum(x - mu) OVER (PARTITION BY w, blk ORDER BY t) AS z
      FROM blocks WHERE bn = w
    ), rs AS (
      SELECT w, blk,
             (max(z) - min(z))
               / nullif(sqrt(sum((x - mu) * (x - mu)) / w), 0) AS rs
      FROM cum GROUP BY w, blk
    ), mean_rs AS (
      SELECT w, avg(rs) AS rsbar, CAST(count(*) AS BIGINT) AS n_blocks
      FROM rs GROUP BY w
    )
    SELECT
      max(CASE WHEN w = 8 THEN n_blocks END) AS blocks_8,
      max(CASE WHEN w = 16 THEN n_blocks END) AS blocks_16,
      round(max(CASE WHEN w = 8 THEN rsbar END), 4) + 0.0 AS rs_8,
      round(max(CASE WHEN w = 16 THEN rsbar END), 4) + 0.0 AS rs_16,
      round(ln(max(CASE WHEN w = 16 THEN rsbar END)
               / max(CASE WHEN w = 8 THEN rsbar END)) / ln(2.0e0), 4)
        + 0.0 AS hurst
    FROM mean_rs
    """


@register("k_hurst_rs", oracle=_body_hurst())
def k_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of the daily
    event-count spine: for block sizes w = 8 and 16 days, each full
    block contributes R/S = (range of cumulative mean-deviations) /
    (population std); H = log2(RS_16 / RS_8) — the two-point slope of
    the log-log R/S law. H ~ 0.5 is short-memory noise, H > 0.5
    long-range persistence (load trends compound — capacity planning
    must extrapolate, not average), H < 0.5 mean reversion. The
    long-memory diagnostic next to k_pacf_closed's short-lag view.

    Determinism: block membership is integer arithmetic on the day
    index; within-block mean, cumulative deviations (ordered window)
    and the max-min range are exact-integer-derived; the one libm
    surface is the final ln ratio, rounded 4dp (same exposure class as
    the repo's other log-domain keys). Constant blocks yield NULL via
    nullif rather than a divide-by-zero divergence.

    Scale: one corpus shuffle to the day spine; block windows are
    calendar-sized. At 100 TB the spine grows with the calendar, not
    the data — more block sizes (powers of two) and an OLS log-log fit
    slot in without changing the shuffle shape.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_hurst())


# ------------------------------------------------------- Ljung-Box Q ----


def _body_ljung_box() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM daily
    ), mu AS (
      SELECT x, t,
             avg(x) OVER () AS m,
             CAST(count(*) OVER () AS DOUBLE) AS n
      FROM idx
    ), d AS (
      SELECT t, x - m AS e, n FROM mu
    ), shifted AS (
      -- all five lags as window functions in ONE pass keep d
      -- single-referenced (the lag-table self-join re-ran the
      -- day-spine aggregation per lag under Spark's CTE inlining)
      SELECT e, n,
             lag(e, 1) OVER w AS e1, lag(e, 2) OVER w AS e2,
             lag(e, 3) OVER w AS e3, lag(e, 4) OVER w AS e4,
             lag(e, 5) OVER w AS e5
      FROM d WINDOW w AS (ORDER BY t)
    ), sums AS (
      SELECT max(n) AS n, sum(e * e) AS s0,
             sum(e * e1) AS c1, sum(e * e2) AS c2, sum(e * e3) AS c3,
             sum(e * e4) AS c4, sum(e * e5) AS c5
      FROM shifted
    ), q AS (
      SELECT n,
             n * (n + 2) * ((c1 / s0) * (c1 / s0) / (n - 1)
                          + (c2 / s0) * (c2 / s0) / (n - 2)
                          + (c3 / s0) * (c3 / s0) / (n - 3)
                          + (c4 / s0) * (c4 / s0) / (n - 4)
                          + (c5 / s0) * (c5 / s0) / (n - 5)) AS q
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(5 AS BIGINT) AS n_lags,
           round(q, 4) + 0.0 AS ljung_box_q,
           q > 11.070497693516351e0 AS reject_white_noise_5pct
    FROM q
    """


@register("k_ljung_box", oracle=_body_ljung_box())
def k_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily event-count spine:
    Q = n(n+2) * sum_{k=1..5} r_k^2/(n-k) vs chi^2(5) — is the series
    white noise AT ALL, across all five lags jointly? The gatekeeper in
    front of the per-lag views: ``k_autocorr_daily`` reads individual
    r_k, ``k_pacf_closed`` picks an AR order, Ljung-Box says whether
    there is any autocorrelation worth modeling (and is the standard
    residual-whiteness check after a forecast fit).

    ACF numerators come from shifted self-joins on the integer day
    index (the k_pacf_closed pattern: the 5-lag spine is tiny, the
    joins are index-equi); the demeaned products are floats from
    exact-integer counts minus an exact-rational mean, summed over a
    ~30-row spine — 4dp rounding absorbs partial-order ulps, and the
    reject boolean compares far from the critical value on any
    non-degenerate corpus (power sums accumulate in DOUBLE, no int64
    wrap surface).

    Scale: one corpus shuffle to the day spine; everything after is
    calendar-sized.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_ljung_box())


# ---------------------------------------------------- DFT periodogram ----


def _body_periodogram() -> str:
    """Shared ANSI body (Spark temp-view `events` / DuckDB view)."""
    return """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM daily
    ), mu0 AS (
      SELECT x, t, avg(x) OVER () AS m,
             CAST(count(*) OVER () AS DOUBLE) AS n
      FROM idx
    ), mu AS (
      -- second layer: DuckDB rejects nested window calls
      SELECT x, t, m, n,
             sum((x - m) * (x - m)) OVER () AS ss
      FROM mu0
    ), harm AS (
      SELECT p.p, max(mu.n) AS n, max(mu.ss) AS ss,
             sum((x - m) * cos(6.283185307179586e0 * t / p.p)) AS c,
             sum((x - m) * sin(6.283185307179586e0 * t / p.p)) AS s
      FROM (SELECT 2 AS p UNION ALL SELECT 3 UNION ALL SELECT 4
            UNION ALL SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7
            UNION ALL SELECT 8 UNION ALL SELECT 9 UNION ALL SELECT 10) p
      JOIN mu ON 1 = 1
      GROUP BY p.p
    ), frac AS (
      SELECT p, CAST(n AS BIGINT) AS n_days,
             2 * (c * c + s * s) / (n * ss) AS var_frac
      FROM harm
    )
    SELECT p AS period_days, n_days,
           round(var_frac, 4) + 0.0 AS var_frac,
           (rank() OVER (ORDER BY round(var_frac, 6) DESC, p) = 1)
             AS is_dominant
    FROM frac
    """


@register("k_dft_periodogram", oracle=_body_periodogram())
def k_dft_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency DFT periodogram of the daily event-count spine
    at candidate periods 2..10 days: variance fraction 2(C^2+S^2)/(n*SS)
    per period (C, S = demeaned cos/sin dot products), dominant period
    flagged. The frequency-domain seasonality DETECTOR in front of the
    period-7 assumers (``k_seasonal_dow``, ``k_forecast_snaive``,
    ``k_seasonal_strength`` all hard-code weekly): this key is what
    says 7 is the right number — or that the cadence changed.

    cos/sin on identical double inputs are the libm exposure class
    (4dp-rounded output); the dominance rank acts on 6dp-rounded
    fractions with the period as tiebreak, so the flag is
    deterministic. Demeaned power sums accumulate in DOUBLE (no int64
    wrap surface).

    Scale: one corpus shuffle to the day spine; the 9-period harmonic
    probe is a constant-size broadcast join over the spine.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_periodogram())

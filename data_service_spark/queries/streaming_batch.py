"""§2.I — streaming operators, batch twins.

Contract (SURVEY.md §2.I): every windowing expression runs twice-for-once —
here in batch mode over events.parquet (what the driver hashes), and in the
Structured Streaming harness under tests/test_streaming.py with a file
source + availableNow trigger to prove the streaming path produces the same
result. The expressions are identical; only readStream/writeStream differ.

Scale: tumbling/sliding/session windows are all single-shuffle groupBys on
(window, key); at 100 TB the watermark bounds state, and session windows
merge incrementally in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import load
from data_service_spark.registry import register


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling count+sum by event_type (shared with streaming tests)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "event_type", "n", "sum_value"
        )
    )


@register(
    "i_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def i_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load(spark, sf_dir, "events"))


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 min (shared with streaming tests)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )


# Each event belongs to the 4 sliding windows whose starts are the four
# 15-minute marks in (ts - 1h, ts]; DuckDB zips parallel unnests.
_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - unnest([0, 1, 2, 3]) * INTERVAL '15 minutes' AS win_start
  FROM events
)
SELECT win_start, count(*) AS n FROM expanded GROUP BY win_start
"""


@register("i_sliding", oracle=_SLIDING_ORACLE)
def i_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load(spark, sf_dir, "events"))


def session_agg(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30-minute gap (shared with tests)."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value"
        )
    )


@register(
    "i_session",
    oracle="""
    -- Gaps-and-islands twin of Spark's session_window semantics: an event
    -- starts a new session only when it is STRICTLY more than the gap after
    -- the previous one — Spark merges windows that touch at the boundary
    -- (verified: events at 9:29 and 9:59 with a 30-min gap share a session;
    -- tests/test_operators.py::test_session_gap_boundary).
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def i_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load(spark, sf_dir, "events"))


def watermark_windowed_agg(events: DataFrame) -> DataFrame:
    """10-min watermark + 30-min tumbling window per event_type.

    In batch mode ``withWatermark`` is a declared no-op, so the batch result
    is the plain windowed aggregate — that is what the driver hashes. The
    *streaming* semantics (late rows beyond the watermark dropped, windows
    emitted on close in append mode) are proven in
    tests/test_streaming.py::test_watermark_drops_late with a controlled
    file-arrival order, per SURVEY.md §2.I ``i_watermark_late``.
    """
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@register(
    "i_watermark_late",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def i_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    return watermark_windowed_agg(load(spark, sf_dir, "events"))


def funnel_batch(events: DataFrame) -> DataFrame:
    """Per-user signup→purchase funnel state, batch formulation.

    Stage 0 = never signed up, 1 = signed up, 2 = purchased after signing up;
    also counts purchases after the first signup. The streaming twin keeps
    the same state per user in ``applyInPandasWithState``
    (tests/test_streaming.py::test_stateful_funnel) — SURVEY.md §2.I
    ``i_stateful``. Batch version is two hash aggregates over the same key
    (map-side partials keep it one shuffle each at 100 TB).
    """
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    return (
        events.join(first_signup, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.count(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("first_signup").isNotNull()
                    & (F.col("ts") > F.col("first_signup")),
                    1,
                )
            ).alias("purchases_after_signup"),
            F.max(F.col("first_signup").isNotNull()).alias("signed_up"),
        )
        .select(
            "user_id",
            "purchases_after_signup",
            F.when(F.col("purchases_after_signup") > 0, 2)
            .when(F.col("signed_up"), 1)
            .otherwise(0)
            .alias("funnel_stage"),
        )
    )


@register(
    "i_stateful",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), agg AS (
      SELECT e.user_id,
             count(*) FILTER (WHERE e.event_type = 'purchase'
                              AND su.first_signup IS NOT NULL
                              AND e.ts > su.first_signup)
               AS purchases_after_signup,
             max(su.first_signup IS NOT NULL) AS signed_up
      FROM events e LEFT JOIN su ON e.user_id = su.user_id
      GROUP BY e.user_id
    )
    SELECT user_id, purchases_after_signup,
           CASE WHEN purchases_after_signup > 0 THEN 2
                WHEN signed_up THEN 1 ELSE 0 END AS funnel_stage
    FROM agg
    """,
)
def i_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_batch(load(spark, sf_dir, "events"))


def sink_agg(events: DataFrame) -> DataFrame:
    """Global per-type rollup — the aggregate the foreachBatch sink converges
    to in complete output mode (tests/test_streaming.py::test_foreach_batch
    proves the streaming sink path; SURVEY.md §2.I ``i_stream_sink``)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "i_stream_sink",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def i_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sink_agg(load(spark, sf_dir, "events"))


def dedup_keys_agg(events: DataFrame) -> DataFrame:
    """Exact dedup on (user_id, event_type) keeping the earliest event.

    Batch formulation is a min aggregate; the streaming twin is
    dropDuplicates within a watermark (tests/test_streaming.py).
    """
    return events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


@register(
    "i_dedup_keys",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events GROUP BY user_id, event_type
    """,
)
def i_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_keys_agg(load(spark, sf_dir, "events"))


def purchase_click_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Each purchase joined to the same user's clicks in the preceding 30
    minutes (shared between the batch twin and the stream-stream test).

    Equi-key on user + time-band predicate: as a stream-stream join the
    watermarks on both sides bound the buffered state to the band width —
    the only join shape that runs indefinitely at 100 TB/day.
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    return p.join(c, cond).select(
        "purchase_id", F.col("p_user").alias("user_id"), "click_id"
    )


@register(
    "i_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
)
def i_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return purchase_click_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


def static_enrich_join(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static equi-join: each event enriched with the customer row
    whose key equals its user_id (shared between batch twin and stream
    test).

    As a stream the static side is re-planned per micro-batch (no state,
    no watermark needed) — the standard dimension-enrichment shape. The
    user dimension is data-dependent-size, so no broadcast hint: the
    planner broadcasts the snapshot while it fits and shuffle-joins each
    micro-batch once the dimension outgrows the bound.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    return events.join(dim, "user_id").select(
        "event_id", "user_id", "event_type", "c_mktsegment", "c_nationkey"
    )


@register(
    "i_stream_static",
    oracle="""
    SELECT event_id, user_id, event_type, c_mktsegment, c_nationkey
    FROM events JOIN customer ON user_id = c_custkey
    """,
)
def i_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    return static_enrich_join(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    )


def latest_state_agg(events: DataFrame) -> DataFrame:
    """Latest event per user — the state an UPSERT sink converges to
    (shared between the batch twin and the foreachBatch-merge test).

    event_id is unique and event-time-ordered (FIXTURES.md), so max_by on
    it is deterministic; in update-mode streaming each micro-batch emits
    the users it touched and the sink keeps the last row per key.
    """
    return events.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "i_upsert_sink",
    oracle="""
    SELECT user_id, max(event_id) AS last_event_id,
           round(arg_max(value, event_id), 2) AS last_value,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def i_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_state_agg(load(spark, sf_dir, "events"))


def chained_window_agg(events: DataFrame) -> DataFrame:
    """Hour→day chained windowed aggregation (shared with streaming tests):
    hourly event counts per type, then per-day avg/peak of those hourly
    counts. Spark 4 supports this natively in streaming — the second
    ``window()`` groups on the first's window column, so both levels ride
    one watermark. Batch and stream run the identical expression."""
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("hw"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_hour"))
    return (
        hourly.groupBy(F.window("hw", "1 day").alias("dw"), "event_type")
        .agg(
            F.round(F.avg("n_hour"), 4).alias("avg_hourly"),
            F.max("n_hour").alias("peak_hourly"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select(
            F.col("dw.start").alias("day_start"),
            "event_type",
            "avg_hourly",
            "peak_hourly",
            "n_hours",
        )
    )


@register(
    "i_window_chain",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n_hour
      FROM events GROUP BY 1, 2
    )
    SELECT date_trunc('day', h) AS day_start, event_type,
           round(avg(n_hour), 4) AS avg_hourly,
           max(n_hour) AS peak_hourly,
           count(*) AS n_hours
    FROM hourly GROUP BY 1, 2
    """,
)
def i_window_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregations (hour→day rollup) — the hypertable
    continuous-rollup shape. Two hash aggregates; the second input is
    already tiny (one row per hour×type) so the day-level shuffle is
    negligible — the pattern that lets a 100 TB event store keep multi-
    resolution rollups without re-scanning raw data."""
    return chained_window_agg(load(spark, sf_dir, "events"))


@register(
    "i_gap_fill",
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
      SELECT s.event_type, s.h, hv.sv, hv.sv IS NULL AS is_gap
      FROM spine s LEFT JOIN hourly hv
        ON s.h = hv.h AND s.event_type = hv.event_type
    )
    SELECT event_type, h AS hour_start, is_gap,
           last_value(sv IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM j
    """,
)
def i_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense hourly spine per event_type
    (`sequence()` between observed bounds) left-joined to the hourly
    aggregate, missing hours carried forward with IGNORE NULLS — the
    hypertable `locf`/gap-fill operator.

    The spine is generated from a per-key one-row bounds aggregate, so its
    size is hours×keys regardless of event volume; the join is an equi-join
    on (key, hour) that AQE broadcasts when the spine is small. The carry-
    forward window partitions by event_type — parallel across keys, and at
    100 TB the window state is one scalar per partition."""
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
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.col("h").alias("hour_start"),
        F.col("sv").isNull().alias("is_gap"),
        F.last("sv", ignorenulls=True).over(w).alias("filled"),
    )


def session_stats_batch(events: DataFrame) -> DataFrame:
    """Per-user session statistics (count / longest / events), batch
    formulation over ``session_window`` — the twin of the custom
    ``applyInPandasWithState`` sessionizer in streaming.py
    (tests/test_streaming.py::test_stateful_sessionizer)."""
    sess = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")).alias("dur_us"),
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("dur_us").alias("longest_us"),
        F.sum("n_ev").alias("n_events"),
    )


@register(
    "i_stateful_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    ), sess AS (
      SELECT user_id, sess_id, count(*) AS n_ev,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM numbered GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(max(dur_us) AS BIGINT) AS longest_us,
           CAST(sum(n_ev) AS BIGINT) AS n_events
    FROM sess GROUP BY 1
    """,
)
def i_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup (how many sessions, longest one, total
    events) — the per-entity engagement profile a product-analytics store
    maintains incrementally. Batch side is two hash aggregates over
    ``session_window``; the streaming side keeps the same numbers as
    explicit state in ``applyInPandasWithState`` (sessionize_stream),
    proving the arbitrary-stateful-operator path beyond the built-in
    session windows. Oracle is the strict-gap gaps-and-islands fixpoint —
    cross-validating Spark's merge-at-boundary semantics again at the
    rollup level."""
    return session_stats_batch(load(spark, sf_dir, "events"))


def purchase_click_outer_join(
    purchases: DataFrame, clicks: DataFrame
) -> DataFrame:
    """LEFT OUTER variant of purchase_click_join: purchases with NO
    preceding click still emit (null click_id). In streaming, outer
    results can only emit once the watermark proves no match can arrive —
    both sides carry watermarks and the null rows appear on window close
    (proven in tests/test_streaming.py::test_stream_outer_join)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    return p.join(c, cond, "left").select(
        "purchase_id", F.col("p_user").alias("user_id"), "click_id"
    )


@register(
    "i_stream_outer_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
)
def i_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: attribution with explicit
    'no prior click' rows. Outer stream joins need watermarks on BOTH
    sides — the engine emits null-padded rows only when the watermark
    closes the band, which also bounds state exactly like the inner
    variant. Batch twin here; streaming semantics in tests."""
    ev = load(spark, sf_dir, "events")
    return purchase_click_outer_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


@register(
    "i_state_reader",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def i_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State Store batch reader (Spark 4 ``statestore`` format): run a
    checkpointed streaming aggregation to completion, then read the
    operator's STATE as a plain DataFrame — the ops/debugging surface for
    stateful pipelines (inspect what a 100-TB-a-day job is actually
    holding per key, audit state growth, repair bad keys offline). The
    drained state of a full availableNow pass over events equals the batch
    aggregate, which is exactly what the oracle checks.

    The read is one task per state-store partition — the same parallelism
    the streaming job itself uses.
    """
    import os
    import tempfile

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(),
        f"dss_state_reader_{os.getpid()}_{sf_tag}",
    )
    ck = os.path.join(base, "ck")
    # The streaming file source wants a DIRECTORY; expose the single corpus
    # file through a symlinked dir (a real deployment streams a directory
    # or Kafka topic to begin with).
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    link = os.path.join(src, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    sdf = (
        spark.readStream.schema("event_type string, value double")
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
    )
    q = (
        sdf.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ck)
    # State value fields carry the PHYSICAL aggregate buffer names
    # (count/sum), not the query aliases — part of what the reader exposes.
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
        F.round(F.col("value.sum"), 2).alias("sum_value"),
    )


@register(
    "i_stream_file_sink",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events WHERE event_type IN ('purchase', 'signup')
    """,
)
def i_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PARQUET file sink with its exactly-once commit log: a
    filtered event stream drains (availableNow) into a parquet directory
    whose ``_spark_metadata`` transaction log records committed files —
    re-reading through Spark sees exactly the committed set even if stray
    files exist (the crash-safety contract of file sinks at scale). The
    oracle is the same filter over the source table: sink + read-back must
    be lossless and duplicate-free.
    """
    import os
    import shutil
    import tempfile

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(
        tempfile.gettempdir(), f"dss_file_sink_{os.getpid()}_{sf_tag}"
    )
    # Fresh fixture per process: the commit log must correspond to THIS
    # run's checkpoint, so clear both together.
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    os.makedirs(src)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    out, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    sdf = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .parquet(src)
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@register(
    "i_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN INTERVAL 60 MINUTE ELSE INTERVAL 30 MINUTE END AS gap
      FROM events
    ), runs AS (
      SELECT user_id, ts, event_id,
             max(ts + gap) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end,
             ts + gap AS my_end
      FROM g
    ), flagged AS (
      SELECT user_id, ts, event_id, my_end,
             CASE WHEN prev_end IS NULL OR ts > prev_end THEN 1 ELSE 0 END
               AS is_new
      FROM runs
    ), labeled AS (
      SELECT user_id, ts, my_end,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(my_end) AS session_end,
           count(*) AS n_events
    FROM labeled GROUP BY user_id, sess
    """,
)
def i_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: `session_window` whose inactivity gap is
    PER-EVENT (60 min after a purchase — buying intent keeps a session
    alive longer — 30 min otherwise). The oracle is the gaps-and-islands
    formulation: an event opens a new session iff its ts exceeds the
    running max of every earlier event's (ts + its own gap) — exactly the
    interval-union semantics session_window merges by (touching intervals
    merge: `>` not `>=`, the same boundary pinned for i_session).

    In streaming this is the state-bounded sessionizer with per-event
    timeouts; in batch it is one keyed window sort + one aggregate —
    parallel across users, O(1) running state per partition. The islands
    twin doubles as the backfill/repair path that recomputes historical
    sessions identically.
    """
    e = load(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "k_conversion_lag",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), p AS (
      SELECT e.user_id,
             min(e.ts) AS first_purchase_ts
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
      GROUP BY 1
    ), lags AS (
      SELECT s.user_id,
             date_diff('microsecond', s.signup_ts, p.first_purchase_ts)
               AS lag_us
      FROM s JOIN p USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(lag_us) AS BIGINT) AS min_us,
           round(quantile_cont(lag_us, 0.5) / 1e6, 2) AS p50_s,
           round(quantile_cont(lag_us, 0.9) / 1e6, 2) AS p90_s,
           CAST(max(lag_us) AS BIGINT) AS max_us
    FROM lags
    """,
)
def k_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from first signup
    to first subsequent purchase; reported as count / min / p50 / p90 /
    max — the product-analytics number that turns the funnel
    (d_agg_funnel_window) into an SLA ("median user converts within X").

    Two keyed min-aggregates and one join — every shuffle is user-keyed
    and dimension-sized after aggregation. Lags are exact integer
    MICROSECONDS (second-granularity diffs diverge across engines:
    boundary-crossing vs elapsed-truncation semantics on sub-second
    timestamps — observed off-by-one at sf0.01); the percentiles
    interpolate over identical integers in both engines.
    """
    e = load(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lags = s.join(p, "user_id").select(
        F.expr(
            "timestampdiff(MICROSECOND, signup_ts, first_purchase_ts)"
        ).alias("lag_us")
    )
    return lags.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("lag_us").cast("long").alias("min_us"),
        F.round(F.expr("percentile(lag_us, 0.5)") / 1e6, 2).alias("p50_s"),
        F.round(F.expr("percentile(lag_us, 0.9)") / 1e6, 2).alias("p90_s"),
        F.max("lag_us").cast("long").alias("max_us"),
    )


@register(
    "k_survival_km",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), conv AS (
      SELECT s.user_id,
             min(CASE WHEN e.event_type = 'purchase' AND e.ts > s.signup_ts
                      THEN e.ts END) AS conv_ts
      FROM s JOIN events e USING (user_id)
      GROUP BY s.user_id
    ), horizon AS (
      SELECT max(ts) AS h FROM events
    ), spells AS (
      SELECT c.user_id,
             CASE WHEN c.conv_ts IS NOT NULL
                  THEN date_diff('day', CAST(s.signup_ts AS DATE),
                                        CAST(c.conv_ts AS DATE))
                  ELSE date_diff('day', CAST(s.signup_ts AS DATE),
                                        CAST(h.h AS DATE)) END AS t,
             CAST(c.conv_ts IS NOT NULL AS INT) AS converted
      FROM conv c JOIN s USING (user_id) CROSS JOIN horizon h
    ), daily AS (
      SELECT t, CAST(sum(converted) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM spells GROUP BY t
    ), risk AS (
      SELECT t, d,
             CAST((SELECT count(*) FROM spells) -
               coalesce(sum(leaving) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM daily
    )
    SELECT t, d, n_risk,
           round(CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                        OVER (ORDER BY t) = 1
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN d < n_risk
                                   THEN ln(1.0 - d * 1.0 / n_risk)
                                   ELSE 0.0 END) OVER (ORDER BY t)) END, 4)
             AS survival
    FROM risk WHERE d > 0
    """,
)
def k_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-conversion with CENSORING:
    users who signed up but never purchased are censored at the
    observation horizon instead of being dropped (what the naive
    conversion-lag histogram gets wrong — it biases toward fast
    converters). S(t) = Π(1 − dᵢ/nᵢ) over conversion days, computed as
    exp of a cumulative log-sum window.

    Spell construction is two user-keyed aggregates; the risk table is
    day-granular (≤ horizon days), so the ordered windows run over a
    dimension-sized frame. Integer day diffs and counts; the only floats
    are the final per-day factors, folded in identical day order in both
    engines.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        s.join(e, "user_id")
        .groupBy("user_id", "signup_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("signup_ts")),
                    F.col("ts"),
                )
            ).alias("conv_ts")
        )
    )
    horizon = e.agg(F.max("ts").alias("h"))
    spells = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("conv_ts").isNotNull(),
            F.datediff(F.col("conv_ts").cast("date"),
                       F.col("signup_ts").cast("date")),
        )
        .otherwise(
            F.datediff(F.col("h").cast("date"),
                       F.col("signup_ts").cast("date"))
        )
        .alias("t"),
        F.col("conv_ts").isNotNull().cast("int").alias("converted"),
    )
    daily = spells.groupBy("t").agg(
        F.sum("converted").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    total = spells.agg(F.count(F.lit(1)).alias("n_tot"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = daily.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_tot")
            - F.coalesce(F.sum("leaving").over(wprev), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # A day where everyone at risk converts has factor 0 — ln is undefined,
    # so fold a guarded 0 term and pin survival to 0 from that day on.
    hit_zero = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(wcum)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk")),
    ).otherwise(0.0)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(wcum))
    )
    return risk.filter(F.col("d") > 0).select(
        "t", "d", "n_risk", F.round(surv, 4).alias("survival")
    )


@register(
    "k_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ), spend AS (
      SELECT e.user_id, f.cohort,
             CAST(date_diff('week', f.cohort, CAST(e.ts AS DATE)) AS BIGINT)
               AS week_age,
             e.value
      FROM events e JOIN first_seen f USING (user_id)
      WHERE e.event_type = 'purchase'
    ), weekly AS (
      SELECT cohort, week_age, sum(value) AS wk_value
      FROM spend GROUP BY 1, 2
    )
    SELECT cohort, week_age,
           round(sum(wk_value) OVER (PARTITION BY cohort ORDER BY week_age),
                 2) + 0.0 AS cum_value
    FROM weekly
    """,
)
def k_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase value per
    first-seen-week cohort by week age — the revenue twin of
    k_retention_cohorts' activity matrix, and the number product teams
    fit payback models against ("cohort X recovers acquisition cost by
    week N").

    First-seen assignment and weekly spend are user-keyed aggregates; the
    cumulative window runs over (cohorts × week-ages) — dimension-sized.
    Week arithmetic is integer date_diff on DATE-truncated timestamps,
    identical across engines.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort")) / 7
            ).cast("long").alias("week_age"),
            "value",
        )
    )
    weekly = spend.groupBy("cohort", "week_age").agg(
        F.sum("value").alias("wk_value")
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("week_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly.select(
        "cohort",
        "week_age",
        (F.round(F.sum("wk_value").over(wc), 2) + F.lit(0.0)).alias(
            "cum_value"
        ),
    )


@register(
    "k_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT n, lag(n, 1) OVER (ORDER BY day) AS n1,
             lag(n, 7) OVER (ORDER BY day) AS n7
      FROM daily
    ), m AS (SELECT avg(n) AS mu FROM daily)
    SELECT
      round(sum((n - mu) * (n1 - mu)) FILTER (WHERE n1 IS NOT NULL)
            / sum((n - mu) * (n - mu)), 4) AS acf_lag1,
      round(sum((n - mu) * (n7 - mu)) FILTER (WHERE n7 IS NOT NULL)
            / sum((n - mu) * (n - mu)), 4) AS acf_lag7
    FROM lagged CROSS JOIN m
    """,
)
def k_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event count at lags 1 and 7 — the
    numeric seasonality detector: a weekly-patterned feed shows acf_lag7
    well above acf_lag1's level, telling the anomaly monitors
    (k_anomaly_zscore, k_changepoint_cusum) to deseasonalize (the
    k_eval_regression hour-of-day model) before thresholding.

    Daily rollup → ~30-row lag windows → 1-row reduce; the ACF ratio
    is the standard Σ(xₜ−μ)(xₜ₋ₖ−μ)/Σ(xₜ−μ)² with the same formula text
    in both dialects.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = Window.orderBy("day")
    lagged = daily.select(
        "n",
        F.lag("n", 1).over(wd).alias("n1"),
        F.lag("n", 7).over(wd).alias("n7"),
    )
    m = daily.agg(F.avg("n").alias("mu"))
    lm = lagged.crossJoin(F.broadcast(m))
    num1 = F.sum(
        F.when(
            F.col("n1").isNotNull(),
            (F.col("n") - F.col("mu")) * (F.col("n1") - F.col("mu")),
        )
    )
    num7 = F.sum(
        F.when(
            F.col("n7").isNotNull(),
            (F.col("n") - F.col("mu")) * (F.col("n7") - F.col("mu")),
        )
    )
    den = F.sum((F.col("n") - F.col("mu")) * (F.col("n") - F.col("mu")))
    return lm.agg(
        F.round(num1 / den, 4).alias("acf_lag1"),
        F.round(num7 / den, 4).alias("acf_lag7"),
    )


@register(
    "k_peak_concurrency",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_type,
             CAST(min(ts) AS DATE) AS s_date, CAST(max(ts) AS DATE) AS e_date
      FROM events GROUP BY 1, 2
    ), deltas AS (
      SELECT s_date AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT e_date + INTERVAL 1 DAY, -1 FROM spans
    ), sweep AS (
      SELECT CAST(day AS DATE) AS day,
             CAST(sum(sum(delta)) OVER (ORDER BY day) AS BIGINT)
               AS active_spans
      FROM deltas GROUP BY day
    )
    SELECT day, active_spans,
           (row_number() OVER (ORDER BY active_spans DESC, day) = 1)
             AS is_peak
    FROM sweep
    """,
)
def k_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency by SWEEP-LINE: each (user, event-type)
    activity span emits +1 at its first day and −1 after its last; the
    running sum over day-boundaries is the number of simultaneously
    active spans, with the peak day flagged — the capacity-planning
    question ("how many concurrent anythings must we provision for")
    answered without expanding intervals into per-day rows.

    The delta table is 2 rows per span (dimension-sized); the sweep is
    one ordered prefix sum over distinct boundary days. Pure integer
    arithmetic.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    spans = e.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("s_date"),
        F.max(F.col("ts").cast("date")).alias("e_date"),
    )
    deltas = spans.select(
        F.col("s_date").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            F.date_add(F.col("e_date"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    ws = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = per_day.select(
        "day", F.sum("d").over(ws).cast("long").alias("active_spans")
    )
    wr = Window.orderBy(F.col("active_spans").desc(), "day")
    return sweep.select(
        "day",
        "active_spans",
        (F.row_number().over(wr) == 1).alias("is_peak"),
    )


@register(
    "k_event_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 10
    """,
)
def k_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step behaviour paths (consecutive
    event-type trigrams per user in event-time order) — the path-analysis
    view behind "what do users do right before purchasing", one order of
    structure above k_event_transitions' single-step Markov matrix.

    One keyed window (user partition, two leads — O(1) state), one
    trigram groupBy whose key space is |types|³ ≤ 125, and a
    TakeOrdered top-10. Integer counts with full lexical tiebreaks.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


@register(
    "k_event_pattern_negation",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_us,
             max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_signup_us
      FROM events
    )
    SELECT user_id, event_id AS purchase_event_id,
           CAST(last_view_us AS BIGINT) AS view_us,
           CAST(epoch_us(ts) AS BIGINT) AS purchase_us
    FROM o
    WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
      AND (last_signup_us IS NULL OR last_signup_us < last_view_us)
    """,
)
def k_event_pattern_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern WITH NEGATION: purchases preceded by a view
    with NO signup in between (view → ¬signup → purchase) — the CEP shape
    (Flink MATCH_RECOGNIZE's NOT pattern) that plain funnels can't
    express, here compiled to two running-max windows over the SAME
    user-keyed exchange: the last-view and last-signup timestamps before
    each event, with the negation as a comparison of the two (a signup
    between the view and the purchase iff last_signup > last_view).
    Exact integer microseconds; linear per partition, one shuffle total.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = e.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("ev_us"),
        F.max(F.when(F.col("event_type") == "view", us)).over(w).alias(
            "last_view_us"
        ),
        F.max(F.when(F.col("event_type") == "signup", us)).over(w).alias(
            "last_signup_us"
        ),
    )
    return (
        o.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_us").isNotNull()
            & (
                F.col("last_signup_us").isNull()
                | (F.col("last_signup_us") < F.col("last_view_us"))
            )
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("last_view_us").cast("long").alias("view_us"),
            F.col("ev_us").cast("long").alias("purchase_us"),
        )
    )


@register(
    "k_state_sizing",
    oracle="""
    WITH kb AS (
      SELECT DISTINCT user_id, event_type,
             CAST(floor(epoch_us(ts) / 600000000.0) AS BIGINT) AS bkt
      FROM events
    ), cover AS (
      SELECT DISTINCT user_id, event_type, kb.bkt + o.o AS b
      FROM kb, unnest(generate_series(0, 5)) AS o(o)
    ), per AS (
      SELECT b, count(*) AS state_rows FROM cover GROUP BY b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(state_rows) AS BIGINT) AS max_state_rows,
           CAST(floor(avg(state_rows)) AS BIGINT) AS avg_state_rows
    FROM per
    """,
)
def k_state_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming STATE-SIZE planner for a keyed stateful op (the
    i_dedup_keys key = (user, event_type)) under a 60-minute watermark:
    per 10-minute grid bucket, how many keys would be live in the state
    store (any event within the trailing 6 buckets), reported as
    max/avg/bucket-count — the capacity number that decides executor
    memory and RocksDB spill BEFORE the query ships. Run it on history,
    size the cluster, then start the stream.

    The sliding-horizon distinct is computed WITHOUT a range join: each
    (key, bucket) occurrence explodes to the buckets it NEWLY keeps the
    key alive in ([max(bkt, prev+6), bkt+5] per key via lag — disjoint
    ranges, so each (key, b) appears exactly once and no dedup pass is
    needed), then one count per bucket — linear in events, the same
    coverage-explode trick as the spatial grid join. Exact integer
    microsecond bucketing on both engines.
    """
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # r14 (guide §2.4): ONE upfront hash repartition on the state key
    # establishes the clustering every downstream op needs — the
    # (key, bkt) distinct, the per-key window and the coverage explode
    # all run exchange-free on top of it (HashPartitioning on a subset
    # of each grouping/partitioning key satisfies ClusteredDistribution).
    # The old chain paid a second, 6x-exploded corpus exchange for the
    # cover distinct; the explode below emits each (key, b) EXACTLY once
    # (per key, a bucket's fresh coverage is [max(bkt, prev+6), bkt+5] —
    # buckets are strictly increasing after the distinct, so the range is
    # never empty and never overlaps the previous one), so no second
    # dedup pass exists at all. 4 exchanges -> 3; the only corpus-sized
    # shuffle carries raw (user, type, bkt) triples once.
    kb = (
        e.select(
            "user_id",
            "event_type",
            F.floor(us / 600000000.0).cast("long").alias("bkt"),
        )
        .repartition("user_id", "event_type")
        .distinct()
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("bkt")
    start = F.greatest(
        F.col("bkt"), F.coalesce(F.col("prev") + 6, F.col("bkt"))
    )
    cover = kb.withColumn("prev", F.lag("bkt").over(w)).select(
        "user_id",
        "event_type",
        F.explode(
            # NULL-bucket fence (ts NULL): emit the single NULL bucket the
            # old explode+distinct produced; sequence(NULL, ...) would
            # silently drop it.
            F.when(
                F.col("bkt").isNull(), F.array(F.lit(None).cast("long"))
            ).otherwise(F.sequence(start, F.col("bkt") + 5))
        ).alias("b"),
    )
    per = cover.groupBy("b").agg(F.count(F.lit(1)).alias("state_rows"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("state_rows").cast("long").alias("max_state_rows"),
        F.floor(F.avg("state_rows")).cast("long").alias("avg_state_rows"),
    )


# ------------------------------------------------------ stream union ----


def union_hourly_counts(clicks: DataFrame, views: DataFrame) -> DataFrame:
    """Union of two event streams → tumbling hourly counts per type
    (shared by the batch twin and the streaming pytest).

    Structured Streaming unions stream-stream with no state of its own —
    the union is a routing concept; only the downstream window carries
    state, with ONE watermark across both legs (the min of the inputs'),
    so a lagging leg holds results exactly as correctness demands.
    """
    unioned = clicks.unionByName(views)
    return (
        unioned.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "i_stream_union",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY 1, 2
    """,
)
def i_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return union_hourly_counts(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "view"),
    )


@register(
    "i_idempotent_sink",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(round(value * 10000) AS BIGINT) AS value_q
    FROM events
    """,
)
def i_idempotent_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming delivery over an at-least-once channel: the
    events stream drains through ``IdempotentBatchSink`` (foreachBatch +
    rename-publish + per-epoch commit marker — streaming.py), then the
    FIRST epoch is deliberately REPLAYED (the failure mode foreachBatch
    contracts warn about) before reading the sink back. The returned table
    must contain every event exactly once — which is precisely what the
    oracle asserts, so the driver's hash check IS the exactly-once proof,
    not just a smoke test. ``i_upsert_sink`` converges by overwrite;
    this sink converges by transactional append.

    Scale shape: per-epoch parquet appends with one atomic rename + one
    marker create each — the Delta txnAppId/txnVersion pattern on raw
    files; no global state, readers see only published epochs."""
    import glob
    import os
    import shutil
    import tempfile

    from data_service_spark.streaming import (
        IdempotentBatchSink,
        read_event_stream,
    )

    from data_service_spark.queries.scans import _tmpdir

    base = _tmpdir("idempotent")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    # stream from a copy of the events parquet (a file-source dir we own)
    src = os.path.join(base, "src")
    os.makedirs(src)
    for i, f in enumerate(
        sorted(glob.glob(os.path.join(sf_dir, "events.parquet")))
    ):
        os.symlink(f, os.path.join(src, f"part-{i}.parquet"))
    sink = IdempotentBatchSink(os.path.join(base, "sink"))
    projected = read_event_stream(spark, src).select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("value_q"),
    )
    q = (
        projected.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # simulate the at-least-once replay: re-deliver epoch 0's data
    # (guarded: an empty source commits no epochs, and sink.read raises a
    # descriptive FileNotFoundError in that case rather than ValueError)
    committed = sink.committed()
    if committed:
        first_epoch = min(committed)
        replay = spark.read.parquet(
            os.path.join(sink.data_dir, f"epoch={first_epoch}")
        )
        sink(replay, first_epoch)  # must no-op — already committed
    return sink.read(spark)


def type_counts(events: DataFrame) -> DataFrame:
    """Global per-type counters (shared with the streaming twin in
    tests/test_streaming.py — the complete-output-mode running-aggregate
    shape, no window column)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
            "value_cents4"
        ),
    )


@register(
    "i_stream_topk",
    oracle="""
    WITH counts AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS value_cents4
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, value_cents4,
           CAST(row_number() OVER (ORDER BY n DESC, event_type) AS INT)
             AS rnk
    FROM counts QUALIFY rnk <= 3
    """,
)
def i_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: top-3 event types by running count — the
    complete-output-mode dashboard query (a windowless global aggregate
    is exactly what Structured Streaming maintains as running state; the
    RANKING happens outside the stream because window functions are
    unsupported on streaming DataFrames — the standard pattern is
    complete-mode counts into a sink, rank at read time, which is what
    the ``/stream/start`` service route + ``/sql`` over its memory sink
    do). The batch twin here is the exact fixpoint of that stream after
    the backlog drains; tests/test_streaming.py proves the equivalence
    by draining the shared ``type_counts`` aggregation with
    availableNow. Value mass is summed in exact 1e-4 cents.

    Scale shape: one partial-aggregated groupBy on a 5-key spine; the
    rank is a 5-row window."""
    counts = type_counts(load(spark, sf_dir, "events"))
    w = Window.orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("event_type", F.col("n").cast("long"), "value_cents4", "rnk")
    )

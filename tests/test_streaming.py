"""Structured Streaming proofs for the §2.I operators.

The driver hashes the *batch* twins; these tests prove the *streaming* path
computes the same thing: file source → windowed/stateful op → foreachBatch
sink, drained with availableNow (deterministic per SURVEY.md §7.4.8).
Watermark and stateful semantics (arrival-order dependent) use hand-built
file sequences with controlled mtimes so micro-batch order is fixed.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from data_service_spark.io import load
from data_service_spark.queries.streaming_batch import (
    dedup_keys_agg,
    funnel_batch,
    session_agg,
    sink_agg,
    tumbling_agg,
)
from data_service_spark.streaming import (
    dedup_stream,
    drain_available_now,
    funnel_stream,
    last_rows_per_key,
    read_event_stream,
)

TS = pd.Timestamp


def write_event_files(spark, path: str, *file_rows: list[dict]) -> None:
    """Write each row-list as one parquet file with strictly increasing
    mtimes so the file source replays them in order."""
    os.makedirs(path, exist_ok=True)
    for i, rows in enumerate(file_rows):
        pdf = pd.DataFrame(rows)
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        fpath = os.path.join(path, f"batch_{i:03d}.parquet")
        # µs precision: Spark 4 rejects parquet TIMESTAMP(NANOS) outright.
        pdf.to_parquet(fpath, index=False, coerce_timestamps="us")
        os.utime(fpath, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))


def ev(eid, ts, uid, et="view", value=1.0):
    return {
        "event_id": eid,
        "ts": ts,
        "user_id": uid,
        "event_type": et,
        "value": value,
        "props": "{}",
    }


def corpus_stream_dir(spark, sf_dir, tmp_path_factory) -> str:
    """sf0.001 events re-written as a clean µs-timestamp parquet stream dir."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory) -> str:
    return corpus_stream_dir(spark, sf_dir, tmp_path_factory)


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, keys):
    a = actual.sort_values(keys).reset_index(drop=True)
    e = expected.sort_values(keys).reset_index(drop=True)
    assert list(a.columns) == list(e.columns)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, atol=1e-6)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    sdf = tumbling_agg(read_event_stream(spark, events_dir))
    batches = drain_available_now(sdf, output_mode="complete")
    final = batches[-1]
    expected = tumbling_agg(load(spark, sf_dir, "events")).toPandas()
    assert_frames_match(final, expected, ["bucket_start", "event_type"])


def test_session_stream_matches_batch(spark, sf_dir, events_dir):
    sdf = session_agg(read_event_stream(spark, events_dir))
    batches = drain_available_now(sdf, output_mode="complete")
    expected = session_agg(load(spark, sf_dir, "events")).toPandas()
    assert_frames_match(batches[-1], expected, ["user_id", "session_start"])


def test_foreach_batch_sink_converges(spark, sf_dir, events_dir):
    # i_stream_sink: complete-mode agg through foreachBatch converges to the
    # batch rollup once all files are consumed.
    sdf = sink_agg(read_event_stream(spark, events_dir))
    batches = drain_available_now(sdf, output_mode="complete")
    expected = sink_agg(load(spark, sf_dir, "events")).toPandas()
    assert_frames_match(batches[-1], expected, ["event_type"])


def test_dedup_stream_keys_match_batch(spark, tmp_path):
    d = str(tmp_path / "dedup")
    write_event_files(
        spark,
        d,
        [ev(1, "2024-01-01 10:00", 1, "view"), ev(2, "2024-01-01 10:01", 1, "view")],
        [ev(3, "2024-01-01 10:02", 1, "click"), ev(4, "2024-01-01 10:03", 1, "view")],
    )
    sdf = dedup_stream(read_event_stream(spark, d, one_file_per_batch=True))
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat(batches, ignore_index=True)
    # One survivor per key, and it is the FIRST arrival (event_id 1 and 3).
    assert sorted(zip(got["user_id"], got["event_type"])) == [
        (1, "click"),
        (1, "view"),
    ]
    assert sorted(got["event_id"]) == [1, 3]
    # Same key set as the batch twin.
    events = spark.createDataFrame(
        [(r.event_id, r.ts, r.user_id, r.event_type, r.value, r.props)
         for r in spark.read.parquet(d).collect()],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch_keys = {
        (r.user_id, r.event_type) for r in dedup_keys_agg(events).collect()
    }
    assert set(zip(got["user_id"], got["event_type"])) == batch_keys


def test_watermark_drops_late(spark, tmp_path):
    """i_watermark_late: a row older than the watermark must not reach the
    closed window's aggregate (append mode emits a window once, on close).

    Spark ≥3.4 keeps TWO watermarks per batch: late-input filtering uses the
    watermark committed after batch N-2, state eviction the one after N-1 —
    so the late row must arrive ≥2 batches after the event that advanced the
    watermark past it.
    """
    d = str(tmp_path / "late")
    write_event_files(
        spark,
        d,
        # Window [10:00, 10:30): two on-time rows.
        [ev(1, "2024-01-01 10:00", 1, value=1.0), ev(2, "2024-01-01 10:10", 1, value=2.0)],
        # Advances the committed watermark to 11:50.
        [ev(3, "2024-01-01 12:00", 1, value=4.0)],
        # Batch 2: late-filter watermark now 11:50 → closes+emits the 10:00
        # window (n=2) and arms the filter for the next batch.
        [ev(4, "2024-01-01 12:05", 1, value=8.0)],
        # Late by ~1h45m against the 11:50 watermark → must be dropped, and
        # the already-closed 10:00 window must NOT re-emit.
        [ev(5, "2024-01-01 10:05", 1, value=99.0)],
    )
    from data_service_spark.queries.streaming_batch import watermark_windowed_agg

    sdf = watermark_windowed_agg(read_event_stream(spark, d, one_file_per_batch=True))
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat(batches, ignore_index=True) if batches else pd.DataFrame()
    closed = got[got["win_start"] == TS("2024-01-01 10:00")]
    assert len(closed) == 1, f"expected exactly one closed-window row, got:\n{got}"
    assert int(closed.iloc[0]["n"]) == 2  # late event_id=5 excluded
    assert abs(closed.iloc[0]["sum_value"] - 3.0) < 1e-9  # 1.0+2.0, not +99


def test_stateful_funnel(spark, tmp_path, sf_dir):
    """i_stateful: applyInPandasWithState funnel over time-ordered batches
    converges to the batch-twin result."""
    d = str(tmp_path / "funnel")
    write_event_files(
        spark,
        d,
        [
            ev(1, "2024-01-01 09:00", 1, "view"),
            ev(2, "2024-01-01 09:05", 1, "signup"),
            ev(3, "2024-01-01 09:00", 2, "purchase"),  # purchase before signup
        ],
        [
            ev(4, "2024-01-01 10:00", 1, "purchase"),
            ev(5, "2024-01-01 10:05", 2, "signup"),
            ev(6, "2024-01-01 10:10", 3, "view"),
        ],
        [ev(7, "2024-01-01 11:00", 2, "purchase")],
    )
    sdf = funnel_stream(read_event_stream(spark, d, one_file_per_batch=True))
    batches = drain_available_now(sdf, output_mode="update")
    final = last_rows_per_key(batches, "user_id")
    # user 1: signup then purchase → stage 2, 1 purchase after signup
    assert final[1]["funnel_stage"] == 2 and final[1]["purchases_after_signup"] == 1
    # user 2: pre-signup purchase ignored, post-signup purchase counts → 2/1
    assert final[2]["funnel_stage"] == 2 and final[2]["purchases_after_signup"] == 1
    # user 3: never signed up → stage 0
    assert final[3]["funnel_stage"] == 0 and final[3]["purchases_after_signup"] == 0
    # Batch twin agrees on every user.
    events = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(d)
    for r in funnel_batch(events).collect():
        assert final[r.user_id]["funnel_stage"] == r.funnel_stage, r
        assert final[r.user_id]["purchases_after_signup"] == r.purchases_after_signup, r


def test_tws_port_api_shape(spark, tmp_path):
    """The transformWithStateInPandas port of the funnel must COMPILE
    against the Spark 4.1 TWS surface today (plan construction + schema),
    even though the TWS python worker needs google.protobuf at runtime —
    this pins the 'mechanical port' claim as code, and the shared
    ``_funnel_fold`` is proven identical to the applyInPandasWithState
    fold on a direct pandas call."""
    from data_service_spark.streaming import _funnel_fold, funnel_stream_tws

    d = str(tmp_path / "tws_shape")
    write_event_files(spark, d, [ev(1, "2024-01-01 09:00", 1, "view")])
    sdf = funnel_stream_tws(read_event_stream(spark, d))
    assert sdf.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields] == [
        ("user_id", "bigint"),
        ("purchases_after_signup", "bigint"),
        ("funnel_stage", "int"),
    ]
    # The fold itself (used by BOTH stateful APIs): purchase-before-signup
    # ignored, post-signup purchase counted, state carries across calls.
    b1 = pd.DataFrame(
        {
            "ts": [TS("2024-01-01 09:00"), TS("2024-01-01 09:05")],
            "event_type": ["purchase", "signup"],
        }
    )
    first, purchases = _funnel_fold(b1, None, 0)
    assert purchases == 0 and first == TS("2024-01-01 09:05").value // 1000
    b2 = pd.DataFrame(
        {"ts": [TS("2024-01-01 10:00")], "event_type": ["purchase"]}
    )
    first, purchases = _funnel_fold(b2, first, purchases)
    assert purchases == 1


def test_stateful_funnel_tws_port(spark, tmp_path):
    """ACTIVATES when the environment grows google.protobuf (the TWS
    python worker's import): the transformWithStateInPandas funnel must
    converge to the same per-user state as the applyInPandasWithState
    path and the batch twin. Skips cleanly where protobuf is absent
    (re-probed each round — SURVEY §8 environment notes)."""
    pytest.importorskip("google.protobuf")
    from data_service_spark.streaming import funnel_stream_tws

    conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf)
    # TWS requires the RocksDB state store provider.
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        d = str(tmp_path / "funnel_tws")
        write_event_files(
            spark,
            d,
            [
                ev(1, "2024-01-01 09:00", 1, "view"),
                ev(2, "2024-01-01 09:05", 1, "signup"),
                ev(3, "2024-01-01 09:00", 2, "purchase"),
            ],
            [
                ev(4, "2024-01-01 10:00", 1, "purchase"),
                ev(5, "2024-01-01 10:05", 2, "signup"),
            ],
            [ev(6, "2024-01-01 11:00", 2, "purchase")],
        )
        sdf = funnel_stream_tws(
            read_event_stream(spark, d, one_file_per_batch=True)
        )
        batches = drain_available_now(sdf, output_mode="update")
        final = last_rows_per_key(batches, "user_id")
        events = spark.read.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(d)
        for r in funnel_batch(events).collect():
            assert final[r.user_id]["funnel_stage"] == r.funnel_stage, r
            assert (
                final[r.user_id]["purchases_after_signup"]
                == r.purchases_after_signup
            ), r
    finally:
        spark.conf.set(conf, old)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """i_stream_join: watermarked stream-stream interval join produces the
    same pairs as the batch twin over the same files."""
    from data_service_spark.queries.streaming_batch import purchase_click_join
    from pyspark.sql import functions as F

    d = str(tmp_path / "ssj")
    write_event_files(
        spark,
        d,
        [
            ev(1, "2024-01-01 10:00", 1, "click"),
            ev(2, "2024-01-01 10:20", 1, "purchase"),  # joins click 1
            ev(3, "2024-01-01 10:50", 1, "purchase"),  # click 1 is >30m old
        ],
        [
            ev(4, "2024-01-01 11:00", 2, "click"),
            ev(5, "2024-01-01 11:10", 2, "purchase"),  # joins click 4
            ev(6, "2024-01-01 12:30", 1, "purchase"),  # no click in band
        ],
    )
    stream = read_event_stream(spark, d, one_file_per_batch=True)
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "1 hour"
    )
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", "2 hours"  # clicks buffer longer: they must outlive the band
    )
    sdf = purchase_click_join(purchases, clicks)
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat(batches, ignore_index=True)
    pairs = set(zip(got["purchase_id"], got["click_id"]))
    assert pairs == {(2, 1), (5, 4)}
    # Batch twin over the same files agrees.
    events = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(d)
    batch = purchase_click_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "click"),
    )
    assert pairs == {(r.purchase_id, r.click_id) for r in batch.collect()}


def test_stream_static_join_matches_batch(spark, sf_dir, events_dir):
    # i_stream_static: the static dimension side is joined per micro-batch;
    # appended outputs over all batches equal the batch-twin join.
    from data_service_spark.queries.streaming_batch import static_enrich_join

    customers = load(spark, sf_dir, "customer")
    sdf = static_enrich_join(read_event_stream(spark, events_dir), customers)
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat([b for b in batches if len(b)], ignore_index=True)
    expected = static_enrich_join(
        load(spark, sf_dir, "events"), customers
    ).toPandas()
    assert_frames_match(got, expected, ["event_id"])


def test_upsert_sink_converges_to_latest_state(spark, sf_dir, events_dir):
    # i_upsert_sink: update-mode agg emits touched users per micro-batch; an
    # upsert sink (last row per key wins) converges to the batch state.
    from data_service_spark.queries.streaming_batch import latest_state_agg

    sdf = latest_state_agg(read_event_stream(spark, events_dir))
    batches = drain_available_now(sdf, output_mode="update")
    state = last_rows_per_key(batches, "user_id")
    got = pd.DataFrame(sorted(state.values(), key=lambda r: r["user_id"])).reset_index(
        drop=True
    )
    expected = (
        latest_state_agg(load(spark, sf_dir, "events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert_frames_match(got, expected, ["user_id"])


def test_chained_window_stream_matches_batch(spark, sf_dir, events_dir):
    # i_window_chain: Spark 4 chained windowed aggregations (hour -> day)
    # run natively in streaming; complete-mode drain converges to the
    # batch twin.
    from data_service_spark.queries.streaming_batch import chained_window_agg

    # Spark's chained-stateful check guards append/update modes, where late
    # rows between the two aggs could be dropped; complete mode keeps all
    # state so nothing can be lost — disable the guard for this query only.
    conf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        sdf = chained_window_agg(read_event_stream(spark, events_dir))
        batches = drain_available_now(sdf, output_mode="complete")
    finally:
        spark.conf.set(conf, prev)
    expected = chained_window_agg(load(spark, sf_dir, "events")).toPandas()
    assert_frames_match(batches[-1], expected, ["day_start", "event_type"])


def test_stateful_sessionizer(spark, tmp_path):
    # Sessions spanning micro-batches: user 1 has one session continued
    # across files (gap < 30 min), then a new session in a later file;
    # user 2 stays in one session; exact-gap boundary continues (matches
    # session_window merge-at-boundary).
    from data_service_spark.queries.streaming_batch import session_stats_batch
    from data_service_spark.streaming import read_event_stream, sessionize_stream

    d = str(tmp_path / "sess_stream")
    f1 = [
        ev(1, TS("2024-01-01 09:00:00"), 1),
        ev(2, TS("2024-01-01 09:10:00"), 1),
        ev(3, TS("2024-01-01 09:00:00"), 2),
    ]
    f2 = [
        ev(4, TS("2024-01-01 09:40:00"), 1),   # exactly 30 min after 09:10 -> same session
        ev(5, TS("2024-01-01 09:20:00"), 2),
    ]
    f3 = [
        ev(6, TS("2024-01-01 11:00:00"), 1),   # > 30 min gap -> new session
        ev(7, TS("2024-01-01 11:05:00"), 1),
    ]
    write_event_files(spark, d, f1, f2, f3)
    sdf = sessionize_stream(read_event_stream(spark, d))
    batches = drain_available_now(sdf, output_mode="update")
    # last emitted row per user across all update batches = final state
    final = (
        pd.concat(batches, ignore_index=True)
        .groupby("user_id", as_index=False)
        .last()
    )
    batch_events = spark.createDataFrame(
        pd.DataFrame(f1 + f2 + f3).assign(ts=lambda x: pd.to_datetime(x["ts"]))
    )
    expected = session_stats_batch(batch_events).toPandas()
    assert_frames_match(
        final[["user_id", "n_sessions", "longest_us", "n_events"]],
        expected[["user_id", "n_sessions", "longest_us", "n_events"]],
        ["user_id"],
    )


def test_stream_outer_join_emits_null_rows(spark, tmp_path):
    """i_stream_outer_join: LEFT OUTER stream-stream join emits null-padded
    rows for purchases with no prior click — but only after the watermark
    closes the band, so a final far-future event forces the emission."""
    from pyspark.sql import functions as F

    from data_service_spark.queries.streaming_batch import purchase_click_outer_join

    d = str(tmp_path / "ssoj")
    write_event_files(
        spark,
        d,
        [
            ev(1, "2024-01-01 10:00", 1, "click"),
            ev(2, "2024-01-01 10:20", 1, "purchase"),   # joins click 1
            ev(3, "2024-01-01 11:30", 2, "purchase"),   # NO click -> null row
        ],
        # Watermark movers on BOTH sides (global watermark = min over all
        # watermark nodes) and spread over several batches (late-filter uses
        # the watermark committed two batches back).
        [ev(20, "2024-01-02 12:00", 9, "purchase"), ev(21, "2024-01-02 12:00", 9, "click")],
        [ev(22, "2024-01-03 00:00", 9, "purchase"), ev(23, "2024-01-03 00:00", 9, "click")],
        [ev(24, "2024-01-04 00:00", 9, "purchase"), ev(25, "2024-01-04 00:00", 9, "click")],
    )
    stream = read_event_stream(spark, d, one_file_per_batch=True)
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "1 hour"
    )
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", "2 hours"
    )
    sdf = purchase_click_outer_join(purchases, clicks)
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat(batches, ignore_index=True)
    pairs = {
        (int(p), None if pd.isna(c) else int(c))
        for p, c in zip(got["purchase_id"], got["click_id"])
    }
    assert (2, 1) in pairs          # matched purchase
    assert (3, None) in pairs       # unmatched purchase emitted with null


def test_checkpoint_resume(spark, tmp_path):
    """Checkpointed drain is exactly-once over the source: a second drain
    with the same checkpoint processes ONLY files added since the first —
    the recovery/backfill contract a production sink depends on."""
    d = str(tmp_path / "ckpt_src")
    ckpt = str(tmp_path / "ckpt_loc")
    write_event_files(
        spark, d,
        [ev(1, "2024-01-01 10:00", 1), ev(2, "2024-01-01 10:05", 2)],
    )
    proj = lambda s: s.select("event_id", "user_id")  # stateless pass-through
    first = drain_available_now(
        proj(read_event_stream(spark, d)), checkpoint=ckpt
    )
    assert sorted(pd.concat(first)["event_id"]) == [1, 2]
    # New file arrives; resumed drain sees only it.
    pdf = pd.DataFrame([ev(3, "2024-01-01 10:10", 3)])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(
        os.path.join(d, "batch_zzz.parquet"), index=False, coerce_timestamps="us"
    )
    second = drain_available_now(
        proj(read_event_stream(spark, d)), checkpoint=ckpt
    )
    got = pd.concat(second) if second else pd.DataFrame(columns=["event_id"])
    assert sorted(got["event_id"]) == [3]


def test_dedup_within_watermark(spark, tmp_path):
    # dropDuplicatesWithinWatermark: duplicates within the horizon are
    # dropped across micro-batches; state is bounded by the watermark.
    from data_service_spark.streaming import dedup_stream_within_watermark

    d = str(tmp_path / "dedup_wm")
    write_event_files(
        spark,
        d,
        [ev(1, "2024-01-01 10:00", 1, "view"), ev(2, "2024-01-01 10:01", 1, "view")],
        [ev(3, "2024-01-01 10:02", 1, "view"), ev(4, "2024-01-01 10:03", 1, "click")],
    )
    sdf = dedup_stream_within_watermark(
        read_event_stream(spark, d, one_file_per_batch=True)
    )
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat(batches, ignore_index=True)
    # one survivor per key within the horizon, first arrival wins
    assert sorted(got["event_id"]) == [1, 4]


def test_python_stream_source_offset_resume(spark, tmp_path):
    """The streaming Python data source honors the offset contract across
    restarts: a checkpointed run killed mid-stream resumes from the
    committed offset — every row exactly once, none replayed. Pinned to
    the driver-prefetch simple shape (mode=simple): its chunk-per-batch
    cadence is what makes the mid-stream kill land between commits (the
    default partition-based reader drains everything in one batch, which
    test_python_stream_v2_* cover)."""
    from data_service_spark.sources import register_synthetic_stream_source

    register_synthetic_stream_source(spark)
    ckpt = str(tmp_path / "pyds_ckpt")
    sdf = (
        spark.readStream.format("dss_synth_stream")
        .option("n", 300)
        .option("chunk", 100)
        .option("mode", "simple")
        .load()
    )
    # foreachBatch is AT-LEAST-once on restart: a batch whose sink ran but
    # whose commit never landed is replayed with the SAME batchId, so the
    # documented exactly-once recipe is an idempotent sink keyed by epoch.
    seen: dict[int, pd.DataFrame] = {}

    def sink(b, epoch):
        seen[epoch] = b.toPandas()

    def n_rows() -> int:
        return sum(len(p) for p in seen.values())

    # First run: stop after at least one micro-batch commits.
    q = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and n_rows() < 100:
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()
    first_rows = n_rows()
    assert 100 <= first_rows <= 300

    # Resumed run: same checkpoint drains the remainder (or nothing if the
    # first run already finished). A replayed uncommitted batch overwrites
    # its own epoch slot; committed rows are never re-emitted under a NEW
    # epoch — so the union over epochs is exactly the full range.
    q2 = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and n_rows() < 300:
        time.sleep(0.1)
    q2.stop()
    q2.awaitTermination()
    allr = pd.concat(seen.values())
    assert sorted(allr["id"]) == list(range(300))  # exactly once, complete


def test_python_stream_v2_available_now_drains_fully(spark, tmp_path):
    """The partition-based streamReader under Trigger.AvailableNow: Spark
    snapshots latestOffset at start and runs exactly to it, so ONE
    awaitTermination drains the whole bounded feed — every row exactly
    once, no poll loop — and a restart from the same checkpoint finds no
    new offsets and re-emits nothing."""
    from data_service_spark.sources import register_synthetic_stream_source

    register_synthetic_stream_source(spark)
    ckpt = str(tmp_path / "pyds_v2_ckpt")
    sdf = (
        spark.readStream.format("dss_synth_stream")
        .option("n", 1000)
        .option("chunk", 256)
        .load()
    )
    seen: dict[int, pd.DataFrame] = {}
    q = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(lambda b, e: seen.__setitem__(e, b.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(60)
    allr = pd.concat(seen.values())
    assert sorted(allr["id"]) == list(range(1000))

    seen2: dict[int, pd.DataFrame] = {}
    q2 = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(lambda b, e: seen2.__setitem__(e, b.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(60)
    assert sum(len(p) for p in seen2.values()) == 0


def test_python_stream_v2_partition_replay_is_deterministic():
    """The exactly-once replay argument for the full reader, unit-level:
    partitions(start, end) re-planned from any committed offset pair
    yields the same chunk boundaries, and read() over them reproduces
    exactly the rows of that offset range — so a restart that re-plans a
    batch from the offset log re-reads identical data. No Spark session
    needed: the offset contract is plain Python."""
    from data_service_spark.sources import register_synthetic_stream_source

    # Reach the reader class without a session: rebuild it through the
    # registration closure's locals via a tiny stub.
    class _Reg:
        def register(self, cls):
            self.cls = cls

    class _Stub:
        dataSource = _Reg()

    stub = _Stub()
    register_synthetic_stream_source(stub)  # type: ignore[arg-type]
    src = stub.dataSource.cls({"n": "1000", "chunk": "256"})
    reader = src.streamReader(schema=None)

    assert reader.initialOffset() == {"pos": 0}
    assert reader.latestOffset() == {"pos": 1000}
    parts = reader.partitions({"pos": 0}, {"pos": 1000})
    assert [(p.lo, p.hi) for p in parts] == [
        (0, 256), (256, 512), (512, 768), (768, 1000),
    ]
    # Replay of a mid-stream range: same boundaries, same rows.
    replay = reader.partitions({"pos": 256}, {"pos": 768})
    rows = [r for p in replay for r in reader.read(p)]
    assert [r[0] for r in rows] == list(range(256, 768))
    assert rows[0] == (256, 256 * 256 % 97, "row256")
    # The simple shape stays reachable for control feeds.
    simple = stub.dataSource.cls({"mode": "simple"}).simpleStreamReader(
        schema=None
    )
    it, off = simple.read({"pos": 0})
    assert off == {"pos": 256} and next(it)[0] == 0


def test_stateful_funnel_on_rocksdb(spark, tmp_path):
    """Scale-grade state backend: the applyInPandasWithState funnel yields
    identical state under RocksDBStateStoreProvider — the off-heap backend
    that holds 100s of millions of keys with changelog checkpointing —
    proving the stateful operators are provider-agnostic (the conf is the
    ONLY difference between this test and test_stateful_funnel)."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        d = str(tmp_path / "funnel_rocks")
        write_event_files(
            spark,
            d,
            [
                ev(1, "2024-01-01 09:00", 1, "signup"),
                ev(2, "2024-01-01 09:05", 2, "purchase"),
            ],
            [
                ev(3, "2024-01-01 10:00", 1, "purchase"),
                ev(4, "2024-01-01 10:05", 2, "signup"),
            ],
        )
        sdf = funnel_stream(read_event_stream(spark, d, one_file_per_batch=True))
        batches = drain_available_now(sdf, output_mode="update")
        final = last_rows_per_key(batches, "user_id")
        assert final[1]["funnel_stage"] == 2
        assert final[1]["purchases_after_signup"] == 1
        assert final[2]["funnel_stage"] == 1  # purchase preceded signup
        assert final[2]["purchases_after_signup"] == 0
    finally:
        spark.conf.set(conf, old)


def test_cdc_stream_matches_batch_merge(spark, tmp_path, sf_dir):
    """cdc_stream: last-writer-wins with tombstones converges, per key, to
    c_merge_cdc's final table state over the same events."""
    from data_service_spark.streaming import cdc_stream

    d = str(tmp_path / "cdc")
    write_event_files(
        spark,
        d,
        [
            ev(1, "2024-01-01 09:00", 1, "view", value=10.0),
            ev(2, "2024-01-01 09:05", 2, "click", value=20.0),
        ],
        [
            ev(3, "2024-01-01 10:00", 1, "error", value=0.0),   # tombstone
            ev(4, "2024-01-01 10:05", 2, "purchase", value=25.0),
            ev(5, "2024-01-01 10:10", 3, "view", value=30.0),
        ],
        [ev(6, "2024-01-01 11:00", 1, "click", value=11.0)],    # resurrect
    )
    sdf = cdc_stream(read_event_stream(spark, d, one_file_per_batch=True))
    batches = drain_available_now(sdf, output_mode="update")
    final = last_rows_per_key(batches, "user_id")
    assert final[1]["deleted"] == False and final[1]["value"] == 11.0  # noqa: E712
    assert final[2]["deleted"] == False and final[2]["value"] == 25.0  # noqa: E712
    assert final[3]["deleted"] == False and final[3]["value"] == 30.0  # noqa: E712
    # Mid-stream check: after batch 2, user 1 must surface as deleted.
    mid = last_rows_per_key(batches[:2], "user_id")
    assert mid[1]["deleted"] == True  # noqa: E712
    # Batch twin agrees with the surviving rows.
    events = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(d)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    batch_final = {
        r.user_id: round(r.value, 4)
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1) & (F.col("event_type") != "error")
        )
        .collect()
    }
    stream_final = {
        k: v["value"] for k, v in final.items() if not v["deleted"]
    }
    assert stream_final == batch_final


def test_streaming_progress_exposes_state_metrics(spark, tmp_path):
    """Observability contract: a drained stateful query leaves progress
    telemetry (rows processed, state rows) that an operator dashboard can
    scrape — the streaming twin of the /metrics surface."""
    d = str(tmp_path / "obs")
    write_event_files(
        spark,
        d,
        [ev(1, "2024-01-01 09:00", 1, "signup"),
         ev(2, "2024-01-01 09:05", 1, "purchase")],
    )
    sdf = funnel_stream(read_event_stream(spark, d))
    progress = {}

    def collect(batch_df, epoch):
        batch_df.count()

    q = (
        sdf.writeStream.outputMode("update")
        .foreachBatch(collect)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = q.lastProgress
    assert last is not None
    assert last["numInputRows"] >= 2
    ops = last["stateOperators"]
    assert ops and ops[0]["numRowsUpdated"] >= 1
    assert ops[0]["numRowsTotal"] >= 1


def test_stream_union_matches_batch(spark, sf_dir, events_dir):
    """i_stream_union: two filtered legs of the same source unioned then
    window-aggregated converge to the batch twin (union carries no state;
    the downstream window holds the single watermark)."""
    from data_service_spark.queries.streaming_batch import union_hourly_counts

    src = read_event_stream(spark, events_dir)
    sdf = union_hourly_counts(
        src.filter("event_type = 'click'"),
        src.filter("event_type = 'view'"),
    )
    batches = drain_available_now(sdf, output_mode="complete")
    ev = load(spark, sf_dir, "events")
    expected = union_hourly_counts(
        ev.filter("event_type = 'click'"), ev.filter("event_type = 'view'")
    ).toPandas()
    assert_frames_match(batches[-1], expected, ["win_start", "event_type"])


def test_idempotent_sink_survives_replay_and_restart(spark, tmp_path):
    # IdempotentBatchSink: replayed epochs no-op (even with corrupted
    # payloads), a fresh instance over the same path recovers the manifest,
    # and half-written scratch dirs stay invisible to readers.
    from data_service_spark.streaming import IdempotentBatchSink

    sink = IdempotentBatchSink(str(tmp_path / "sink"))
    b0 = spark.range(5).selectExpr("id", "id * 2 AS v")
    b1 = spark.range(5, 8).selectExpr("id", "id * 2 AS v")
    sink(b0, 0)
    sink(b1, 1)
    assert sink.committed() == {0, 1}
    assert sink.read(spark).count() == 8

    # at-least-once replay with DIFFERENT (corrupt) data: must be ignored
    evil = spark.range(100, 200).selectExpr("id", "id AS v")
    sink(evil, 0)
    assert sink.read(spark).count() == 8

    # crash recovery: a new instance on the same path sees the manifest
    sink2 = IdempotentBatchSink(str(tmp_path / "sink"))
    assert sink2.committed() == {0, 1}
    sink2(evil, 1)  # replay against the recovered manifest: still a no-op
    assert sink2.read(spark).count() == 8

    # a new epoch still lands
    sink2(spark.range(8, 10).selectExpr("id", "id * 2 AS v"), 2)
    got = sorted(r.id for r in sink2.read(spark).collect())
    assert got == list(range(10))

    # empty manifest: read() raises a descriptive error, not an opaque
    # parquet/ValueError (ADVICE r04)
    import pytest as _pytest

    empty = IdempotentBatchSink(str(tmp_path / "never_committed"))
    with _pytest.raises(FileNotFoundError, match="no committed epochs"):
        empty.read(spark)


def test_page_hinkley_stream_matches_batch(spark, sf_dir, tmp_path):
    # page_hinkley_stream: O(1)-state sequential drift monitor fed
    # day-complete batches must reproduce the batch key's m_t/ph columns
    # day for day.
    from data_service_spark.registry import QUERIES
    from data_service_spark.streaming import (
        page_hinkley_stream,
        read_event_stream,
    )

    # split the corpus into one parquet file per day, mtime-ordered.
    # A 12-day PREFIX suffices: every Page-Hinkley column is a prefix
    # statistic (running mean / running min), so day-for-day equality
    # over the first 12 micro-batches proves the same state carry as the
    # full month at a third of the drain cost (r13: each one-file batch
    # is a full stateful Spark job; 30 batches cost ~38 s of the suite).
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type == "purchase"].sort_values("event_id")
    src = tmp_path / "days"
    os.makedirs(src)
    n_days = 12
    for i, (d, g) in enumerate(sorted(ev.groupby(ev.ts.dt.floor("D")))):
        if i >= n_days:
            break
        p = src / f"day-{i:03d}.parquet"
        g.to_parquet(p)
        mt = 1_700_000_000 + i
        os.utime(p, (mt, mt))

    sdf = page_hinkley_stream(
        read_event_stream(spark, str(src), one_file_per_batch=True)
    )
    batches = drain_available_now(sdf, output_mode="append")
    got = pd.concat([b for b in batches if len(b)], ignore_index=True)
    got = got.sort_values("d").reset_index(drop=True)

    expected = (
        QUERIES["k_page_hinkley"](spark, sf_dir)
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
        .head(n_days)
    )
    assert len(got) == len(expected) == n_days
    for col in ["mean_quanta", "m_t", "ph_dec", "ph_inc"]:
        assert got[col].tolist() == expected[col].tolist(), col


def test_stream_topk_counts_match_batch(spark, sf_dir, tmp_path):
    """The i_stream_topk leaderboard is the fixpoint of a complete-mode
    streaming run of the shared type_counts aggregation: drain the events
    stream with availableNow, rank the final batch pandas-side, compare
    to the registered batch key."""
    import glob
    import os

    from data_service_spark.io import load
    from data_service_spark.queries.streaming_batch import type_counts
    from data_service_spark.registry import QUERIES
    from data_service_spark.streaming import (
        drain_available_now,
        read_event_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    for i, f in enumerate(
        sorted(glob.glob(os.path.join(sf_dir, "events.parquet")))
    ):
        os.symlink(f, src / f"part-{i}.parquet")
    sdf = type_counts(read_event_stream(spark, str(src)))
    batches = drain_available_now(sdf, output_mode="complete")
    final = batches[-1].sort_values(
        ["n", "event_type"], ascending=[False, True]
    ).reset_index(drop=True)
    final["rnk"] = range(1, len(final) + 1)
    top3 = final[final.rnk <= 3]
    got = {
        (r.event_type, r.n, r.value_cents4, r.rnk)
        for r in QUERIES["i_stream_topk"](spark, sf_dir).collect()
    }
    want = {
        (r.event_type, int(r.n), int(r.value_cents4), int(r.rnk))
        for r in top3.itertuples()
    }
    assert got == want

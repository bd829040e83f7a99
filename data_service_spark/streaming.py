"""Structured Streaming twins of the §2.I batch operators.

Contract (SURVEY.md §2.I): every streaming operator exists twice-for-once —
the batch formulation in ``queries/streaming_batch.py`` (what the driver's
DuckDB oracle hashes) and the streaming path here, proven equivalent by
``tests/test_streaming.py`` with a file source + ``availableNow`` trigger
(the only deterministic drain, SURVEY.md §7.4.8).

Scale notes: a file/Kafka source partitions by input split; the windowed
aggregates shuffle once on (window, key); watermarks bound state so a
100 TB/day stream holds only the open windows per key in the state store.
The stateful funnel keeps O(1) state per user (two scalars), the shape that
survives hundreds of millions of keys with RocksDB state backend.

Stateful API choice: Spark 4.x adds ``transformWithStateInPandas`` as the
successor API, but its driver worker imports ``google.protobuf``, which this
environment does not ship (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION
ImportError) — so the funnel uses ``applyInPandasWithState``, which is
self-contained. The processor body would port to a StatefulProcessor
unchanged (same per-key scalar state, same update-mode emissions).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, one_file_per_batch: bool = False
) -> DataFrame:
    """File-source stream over parquet event files (schema fixed up front —
    streaming sources never infer). ``one_file_per_batch`` gives tests
    deterministic micro-batch boundaries (files ordered by mtime)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(path)


def drain_available_now(
    sdf: DataFrame,
    output_mode: str = "append",
    checkpoint: str | None = None,
) -> list[pd.DataFrame]:
    """Run a streaming DataFrame to completion with ``availableNow`` and a
    ``foreachBatch`` collector; returns one pandas frame per micro-batch.
    This is the pytest-facing sink; production would point ``writeStream``
    at parquet/Kafka with the same plan.

    ``checkpoint`` persists source offsets + state: a second drain with the
    same location resumes where the first stopped (exactly-once progress —
    proven in tests/test_streaming.py::test_checkpoint_resume)."""
    batches: list[pd.DataFrame] = []

    def collect(batch_df: DataFrame, _epoch: int) -> None:
        batches.append(batch_df.toPandas())

    w = sdf.writeStream.outputMode(output_mode).foreachBatch(collect)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    return batches


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``streaming_batch.funnel_batch``: per-user
    signup→purchase funnel kept as explicit state in
    ``applyInPandasWithState``.

    State per user is (first_signup_us, purchases_after_signup) — two
    scalars, updated per micro-batch in event-time order; each batch emits
    the user's current funnel row (update semantics). Equivalence with the
    batch twin holds when batches arrive in event-time order, which is the
    at-most-once-late regime watermarks enforce; the pytest harness feeds
    time-ordered files.
    """

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            first_signup_us, purchases = state.get
        else:
            first_signup_us, purchases = None, 0
        # Concatenate the chunk iterator BEFORE folding: Spark may split one
        # group's micro-batch across several ~10k-row pandas chunks, and a
        # signup in a later chunk must still see purchases from an earlier
        # chunk with a later ts. One concat + one sort per (group, batch)
        # restores whole-batch event-time order (sort lives in
        # ``_funnel_fold``, shared with the transformWithStateInPandas
        # port so the two stateful APIs cannot drift).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            first_signup_us, purchases = _funnel_fold(
                pd.concat(chunks, ignore_index=True), first_signup_us, purchases
            )
        state.update((first_signup_us, purchases))
        stage = 2 if purchases > 0 else (1 if first_signup_us is not None else 0)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "purchases_after_signup": [purchases],
                "funnel_stage": [stage],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, purchases_after_signup long, funnel_stage int",
        stateStructType="first_signup_us long, purchases long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _funnel_fold(
    batch: pd.DataFrame, first_signup_us: int | None, purchases: int
) -> tuple[int | None, int]:
    """One (group, micro-batch) fold of the funnel state — shared verbatim
    by the ``applyInPandasWithState`` path and the
    ``transformWithStateInPandas`` port so the two APIs cannot drift.

    Vectorized (no per-row Python): a purchase at row i counts iff some
    signup strictly earlier in event time has been seen — ts_us[i] >
    running-min of signup ts through row i, seeded with carried-in state.
    """
    import numpy as np

    batch = batch.sort_values("ts", kind="stable")
    ts_us = batch["ts"].astype("int64").to_numpy() // 1000
    is_signup = (batch["event_type"] == "signup").to_numpy()
    is_purchase = (batch["event_type"] == "purchase").to_numpy()
    seed = float("inf") if first_signup_us is None else first_signup_us
    sig_ts = np.where(is_signup, ts_us.astype("float64"), np.inf)
    eff_first = np.minimum(np.minimum.accumulate(sig_ts), seed)
    purchases += int((is_purchase & (ts_us > eff_first)).sum())
    if eff_first[-1] != float("inf"):
        first_signup_us = int(eff_first[-1])
    return first_signup_us, purchases


def funnel_stream_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` port of ``funnel_stream`` — the
    Spark 4 successor stateful API (SPARK-49564). Same per-user scalar
    state, same update-mode emissions; the fold is the SAME function
    (``_funnel_fold``), so equivalence with the applyInPandasWithState
    path is structural, not re-derived.

    Environment gate: the TWS python worker imports ``google.protobuf``
    at STREAMING_PYTHON_RUNNER_INITIALIZATION time, which this container
    does not ship — so this path is exercised by
    tests/test_streaming.py::test_stateful_funnel_tws_port, which
    ``importorskip``s protobuf and otherwise pins the port's API shape
    by inspection. The day the environment grows protobuf, the
    equivalence test activates with no code change.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # ValueState replaces GroupState: one (first_signup_us,
            # purchases) tuple per user key, no TTL (the funnel is
            # lifetime state by design, like the GroupState NoTimeout).
            self._state = handle.getValueState(
                "funnel", "first_signup_us long, purchases long"
            )

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                first_signup_us, purchases = self._state.get()
            else:
                first_signup_us, purchases = None, 0
            # Concat chunk iterator BEFORE folding (same contract as the
            # applyInPandasWithState path: one group's batch may arrive
            # as several pandas chunks).
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                first_signup_us, purchases = _funnel_fold(
                    pd.concat(chunks, ignore_index=True),
                    first_signup_us,
                    purchases,
                )
            self._state.update((first_signup_us, purchases))
            stage = 2 if purchases > 0 else (1 if first_signup_us is not None else 0)
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "purchases_after_signup": [purchases],
                    "funnel_stage": [stage],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=(
            "user_id long, purchases_after_signup long, funnel_stage int"
        ),
        outputMode="Update",
        timeMode="None",
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``i_dedup_keys``: first event per (user_id,
    event_type) within the watermark horizon. State = one row per seen key,
    expired past the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def last_rows_per_key(
    batches: list[pd.DataFrame], key: str
) -> dict[Any, pd.Series]:
    """Fold update-mode micro-batch outputs to the final row per key."""
    final: dict[Any, pd.Series] = {}
    for pdf in batches:
        for _, row in pdf.iterrows():
            final[row[key]] = row
    return final


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful sessionizer: per-user (n_sessions, longest_us,
    n_events) maintained as explicit state in ``applyInPandasWithState`` —
    the arbitrary-stateful path for session logic the built-in
    ``session_window`` can't express (e.g. emitting rollups, capping
    session length, custom merge rules).

    State per user: (open_start_us, open_last_us, closed_sessions,
    longest_us, n_events). A new event more than ``gap_minutes`` after the
    open session's last event closes it. Events are folded in event-time
    order per micro-batch (chunk-concat first — one group's batch may span
    pandas chunks); cross-batch order comes from the watermark regime, as
    with funnel_stream. Boundary rule matches session_window: a gap of
    EXACTLY gap_minutes continues the session (merge-at-boundary), only
    strictly-greater gaps split.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, closed, longest, n_ev = state.get
        else:
            start_us, last_us, closed, longest, n_ev = None, None, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts in batch["ts"]:
                ts_us = ts.value // 1000
                n_ev += 1
                if start_us is None:
                    start_us, last_us = ts_us, ts_us
                elif ts_us - last_us > gap_us:
                    closed += 1
                    longest = max(longest, last_us - start_us)
                    start_us, last_us = ts_us, ts_us
                else:
                    last_us = ts_us
        state.update((start_us, last_us, closed, longest, n_ev))
        open_n = 1 if start_us is not None else 0
        open_dur = (last_us - start_us) if open_n else 0
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [closed + open_n],
                "longest_us": [max(longest, open_dur)],
                "n_events": [n_ev],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, n_sessions long, longest_us long, n_events long"
        ),
        stateStructType=(
            "open_start_us long, open_last_us long, closed long, "
            "longest_us long, n_events long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Bounded-state streaming dedup (`dropDuplicatesWithinWatermark`,
    Spark 3.5+): duplicates of (user_id, event_type) are dropped while the
    key is inside the watermark horizon, and the key's state is GUARANTEED
    evictable once the watermark passes — unlike plain `dropDuplicates`,
    whose state grows forever. The dedup contract a 100 TB/day stream can
    actually run."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def cdc_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``c_merge_cdc``: last-writer-wins CDC apply with
    delete tombstones kept as explicit state in ``applyInPandasWithState``.

    State per user is (last_ts_us, last_event_id, last_op, last_value);
    each micro-batch folds its rows in (ts, event_id) order and emits the
    user's CURRENT materialized row — ``deleted`` true when the latest
    record is a tombstone ('error' events, mirroring the batch op). A
    downstream sink upserts/deletes on that flag; the final emission per
    key equals the batch op's final table state (proven in
    tests/test_streaming.py).
    """

    def update(
        key: tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_eid, last_op, last_val = state.get
        else:
            last_ts, last_eid, last_op, last_val = -1, -1, "U", 0.0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # Last-writer-wins is a max-fold: only the batch's (ts, event_id)
            # maximum can survive, so sort vectorized and test the single
            # winning row against the state cursor — no per-row Python.
            batch = pd.concat(chunks, ignore_index=True)
            batch["_ts_us"] = (
                batch["ts"].to_numpy("datetime64[ns]").astype("int64") // 1000
            )
            top = batch.sort_values(["_ts_us", "event_id"]).iloc[-1]
            ts_us, eid = int(top["_ts_us"]), int(top["event_id"])
            if (ts_us, eid) >= (last_ts, last_eid):
                last_ts, last_eid = ts_us, eid
                last_op = "D" if top["event_type"] == "error" else "U"
                last_val = float(top["value"])
        state.update((last_ts, last_eid, last_op, last_val))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "value": [round(last_val, 4)],
                "deleted": [last_op == "D"],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, value double, deleted boolean",
        stateStructType=(
            "last_ts long, last_eid long, last_op string, last_val double"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class IdempotentBatchSink:
    """Exactly-once ``foreachBatch`` sink over an at-least-once channel.

    Structured Streaming guarantees each epoch's DATA is deterministic on
    replay, but ``foreachBatch`` itself is at-least-once: after a failure
    between user-code success and checkpoint commit, the same epoch runs
    again. The standard fix (Spark docs' "idempotent sink" contract) is a
    transactional commit keyed by ``(queryId-scoped) epoch_id``:

    1. write the batch under a scratch name,
    2. atomically publish it (rename) as ``epoch=<id>``,
    3. record the epoch in a manifest; a replayed epoch short-circuits.

    The manifest lives on the sink's own storage (here a directory of
    empty marker files — one atomic create per epoch), so recovery after a
    process crash sees exactly the committed epochs. Readers union the
    published epoch directories; a half-written scratch dir is invisible.

    At 100 TB this is the Delta/Iceberg ``txnAppId``/``txnVersion``
    pattern; on raw parquet it is exactly this rename-plus-manifest
    protocol, one marker per micro-batch.
    """

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "_committed")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _marker(self, epoch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch_id}")

    def committed(self) -> set[int]:
        return {
            int(f.split("-", 1)[1]) for f in os.listdir(self.manifest_dir)
        }

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if os.path.exists(self._marker(epoch_id)):
            return  # replayed epoch after a commit — exactly-once no-op
        scratch = os.path.join(self.data_dir, f".tmp-epoch-{epoch_id}")
        final = os.path.join(self.data_dir, f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(scratch)
        if os.path.exists(final):  # crash between rename and marker
            shutil.rmtree(final)
        os.rename(scratch, final)
        with open(self._marker(epoch_id), "x") as fh:
            fh.write("")

    def read(self, spark: SparkSession) -> DataFrame:
        epochs = sorted(self.committed())
        if not epochs:
            raise FileNotFoundError(
                f"no committed epochs under {self.path!r}: the manifest "
                f"({self.manifest_dir!r}) is empty — either the stream has "
                "not committed a micro-batch yet or the sink path is wrong"
            )
        paths = [
            os.path.join(self.data_dir, f"epoch={e}") for e in epochs
        ]
        return spark.read.parquet(*paths)


def page_hinkley_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``k_page_hinkley``: the sequential drift monitor
    as ``applyInPandasWithState`` with O(1) state per metric —
    (t, cum_md, m_t, max_m, min_m), five BIGINTs regardless of history
    length, exactly the state the batch key's docstring promises.

    Contract: upstream must deliver DAY-COMPLETE micro-batches in day
    order (the natural shape when fed from a daily-rollup topic or a
    date-partitioned file drop) — PH is a per-day recurrence, so a day
    split across batches would fold twice. Each batch reduces to its
    daily floor-quantized means (same integer ten-thousandths as the
    batch twin), folds them through the recurrence in day order, and
    emits one row per new day.
    """

    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        if state.exists:
            t, cum_md, m_t, max_m, min_m = state.get
        else:
            t, cum_md, m_t, max_m, min_m = 0, 0, 0, None, None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[dict] = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch["q"] = (batch["value"] * 10000).round().astype("int64")
            daily = (
                batch.groupby(batch["ts"].dt.floor("D"))
                .agg(s=("q", "sum"), c=("q", "size"))
                .sort_index()
            )
            for d, row in daily.iterrows():
                md = int(row.s) // int(row.c) if row.s >= 0 else -(
                    (-int(row.s) + int(row.c) - 1) // int(row.c)
                )  # floor division toward -inf, matching SQL floor()
                t += 1
                cum_md += md
                dv = md - cum_md // t
                m_t += dv
                max_m = m_t if max_m is None else max(max_m, m_t)
                min_m = m_t if min_m is None else min(min_m, m_t)
                out.append(
                    {
                        "metric": metric,
                        "d": d.date(),
                        "mean_quanta": md,
                        "m_t": m_t,
                        "ph_dec": max_m - m_t,
                        "ph_inc": m_t - min_m,
                    }
                )
        state.update((t, cum_md, m_t, max_m, min_m))
        if out:
            yield pd.DataFrame(out)

    keyed = events.filter("event_type = 'purchase'").withColumn(
        "metric", F.lit("purchase_mean")
    )
    return keyed.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=(
            "metric string, d date, mean_quanta long, m_t long, "
            "ph_dec long, ph_inc long"
        ),
        stateStructType=(
            "t long, cum_md long, m_t long, max_m long, min_m long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Multi-source connectors — the reference's "integrating multiple data
sources" surface, expressed as DataSource V2 reader/writer configs.

File formats (parquet/csv/json/orc) work anywhere and are exercised by the
a_sink_* keys and tests. Service-backed connectors (JDBC/Kafka/Hive) have
no live endpoints in this sandbox, so they are config recipes validated for
*shape* only: ``build_reader`` constructs the reader without triggering a
connection (Spark connects lazily on action), and tests assert the plumbing
raises cleanly when the endpoint is absent.

At 100 TB the connector choices that matter:
- JDBC: always set partitionColumn/lowerBound/upperBound/numPartitions —
  a single-partition JDBC read serializes the whole table through one task.
- Kafka: one Spark partition per Kafka partition; minPartitions to fan out.
- files: spark.sql.files.maxPartitionBytes (default 128m) controls split
  granularity; prefer fewer, larger parquet files with row-group ~128m.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

FILE_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def build_reader(spark: SparkSession, cfg: dict[str, Any]):
    """Build a DataFrameReader from a declarative source config.

    cfg: {"format": ..., "path": ..., "options": {...}, "schema": ddl?}
    Returns the reader (lazy); call ``.load()`` to materialize.
    """
    fmt = cfg["format"]
    reader = spark.read.format(fmt)
    if "schema" in cfg:
        reader = reader.schema(cfg["schema"])
    for k, v in cfg.get("options", {}).items():
        reader = reader.option(k, str(v))
    return reader


def load_source(spark: SparkSession, cfg: dict[str, Any]) -> DataFrame:
    reader = build_reader(spark, cfg)
    path = cfg.get("path")
    return reader.load(path) if path else reader.load()


def jdbc_config(url: str, table: str, partition_column: str,
                lower: int, upper: int, num_partitions: int = 32,
                **options: str) -> dict[str, Any]:
    """Partitioned-JDBC recipe — the only JDBC shape that scales."""
    return {
        "format": "jdbc",
        "options": {
            "url": url,
            "dbtable": table,
            "partitionColumn": partition_column,
            "lowerBound": lower,
            "upperBound": upper,
            "numPartitions": num_partitions,
            **options,
        },
    }


def kafka_config(bootstrap: str, topic: str, starting: str = "earliest",
                 min_partitions: int | None = None) -> dict[str, Any]:
    """Kafka batch/stream source recipe (value is binary; pair with
    ``from_json(CAST(value AS STRING), schema)`` downstream)."""
    options = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting,
    }
    if min_partitions:
        options["minPartitions"] = min_partitions
    return {"format": "kafka", "options": options}


# --------------------------------------------------------------------------
# Custom Python data source (Spark 4 DataSource V2 Python API) — how a
# bespoke feed (an internal API, a proprietary format) plugs into the same
# DataFrame surface as parquet/JDBC. Partition planning happens in
# ``partitions()`` (N independent splits → N tasks, executor-side reads),
# so the source scales out like any file format.


def register_synthetic_source(spark: SparkSession) -> None:
    """Register the 'dss_synth' format: deterministic generated rows
    (id, mod97, tag), split into ``parts`` input partitions."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.parts = int(options.get("parts", 4))

        def partitions(self):
            step = max(1, self.n // self.parts)
            bounds = list(range(0, self.n, step))
            return [
                InputPartition((lo, min(lo + step, self.n))) for lo in bounds
            ]

        def read(self, partition):
            # Yield one Arrow batch per split instead of per-row tuples —
            # the vectorized path through the Python worker (~10× less
            # serialization overhead).
            import pyarrow as pa

            lo, hi = partition.value
            ids = list(range(lo, hi))
            yield pa.record_batch(
                {
                    "id": pa.array(ids, pa.int64()),
                    "mod97": pa.array([i * i % 97 for i in ids], pa.int64()),
                    "tag": pa.array([f"row{i}" for i in ids]),
                }
            )

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "dss_synth"

        def schema(self):
            return "id long, mod97 long, tag string"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthSource)


def register_synthetic_pushdown_source(spark: SparkSession) -> None:
    """Register 'dss_synth_push': the same deterministic generator as
    ``dss_synth`` but with FILTER PUSHDOWN (Spark 4.1 ``pushFilters``).

    Kept as a separate format on purpose: a reader that implements
    ``pushFilters`` refuses to run unless
    ``spark.sql.python.filterPushdown.enabled`` is true, so the pushdown
    capability must not leak into the plain source that every session can
    read under default confs.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
    )

    class SynthPushReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.parts = int(options.get("parts", 4))
            # Range narrowed by pushed filters; default = full table.
            self.lo_bound = 0
            self.hi_bound = self.n

        def pushFilters(self, filters):
            # Range predicates on the generator key narrow the PLANNED id
            # range, so pruned rows are never generated, serialized, or
            # scanned — the Python-source equivalent of parquet row-group
            # skipping, and the contract that makes a JDBC/REST-backed
            # source scale. Fully-handled filters are consumed; everything
            # else is yielded back for Spark to evaluate post-scan.
            for f in filters:
                if getattr(f, "attribute", None) == ("id",) and isinstance(
                    getattr(f, "value", None), int
                ):
                    if isinstance(f, GreaterThan):
                        self.lo_bound = max(self.lo_bound, f.value + 1)
                        continue
                    if isinstance(f, GreaterThanOrEqual):
                        self.lo_bound = max(self.lo_bound, f.value)
                        continue
                    if isinstance(f, LessThan):
                        self.hi_bound = min(self.hi_bound, f.value)
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.hi_bound = min(self.hi_bound, f.value + 1)
                        continue
                yield f

        def partitions(self):
            lo0, hi0 = self.lo_bound, min(self.hi_bound, self.n)
            span = max(0, hi0 - lo0)
            if span == 0:
                return [InputPartition((lo0, lo0))]
            step = max(1, span // self.parts)
            bounds = list(range(lo0, hi0, step))
            return [
                InputPartition((lo, min(lo + step, hi0))) for lo in bounds
            ]

        def read(self, partition):
            import pyarrow as pa

            lo, hi = partition.value
            ids = list(range(lo, hi))
            yield pa.record_batch(
                {
                    "id": pa.array(ids, pa.int64()),
                    "mod97": pa.array([i * i % 97 for i in ids], pa.int64()),
                    "tag": pa.array([f"row{i}" for i in ids]),
                }
            )

    class SynthPushSource(DataSource):
        @classmethod
        def name(cls):
            return "dss_synth_push"

        def schema(self):
            return "id long, mod97 long, tag string"

        def reader(self, schema):
            return SynthPushReader(self.options)

    spark.dataSource.register(SynthPushSource)


def register_synthetic_stream_source(spark: SparkSession) -> None:
    """Register 'dss_synth_stream': the STREAMING Python data source
    emitting the same deterministic rows as ``dss_synth`` incrementally,
    with BOTH Spark 4 reader shapes behind one format name:

    - default: the partition-based ``streamReader`` (full
      ``DataSourceStreamReader`` offset contract). ``latestOffset``
      reports everything available; ``partitions(start, end)`` splits the
      offset range into ``chunk``-row InputPartitions that read
      EXECUTOR-side — one task per chunk, exactly like a batch scan, the
      shape a high-volume feed needs. Because the batch end is planned
      from the offset log, ``Trigger.AvailableNow`` drains the whole
      source deterministically (Spark snapshots ``latestOffset`` at start
      and runs to it) — no processingTime poll loop. Restart replay
      re-plans ``partitions(committed, end)`` from the checkpoint: same
      offsets → same partitions → same rows, which is the exactly-once
      replay argument.
    - ``option("mode", "simple")``: the driver-side prefetch
      ``SimpleDataSourceStreamReader`` (``read(start)`` →
      ``readBetweenOffsets`` replay) — the low-volume control-feed shape,
      kept for the incremental processingTime cadence its restart test
      exercises. (``availableNow`` on this shape drains only the first
      prefetched chunk — probed; that limitation is why the full reader
      above is the default.)

    Offset JSON is ``{"pos": next_row_index}`` for both shapes.
    """
    from pyspark.errors import PySparkNotImplementedError
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    def _rows(lo: int, hi: int):
        return [(i, i * i % 97, f"row{i}") for i in range(lo, hi)]

    class SynthRange(InputPartition):
        def __init__(self, lo: int, hi: int):
            self.lo = lo
            self.hi = hi

    class SynthStreamV2Reader(DataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.chunk = int(options.get("chunk", 256))

        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            # Everything the bounded feed holds is available; admission
            # control (how much of it one micro-batch takes) is the
            # engine's call, and partitions() below fans the granted
            # range out chunk-wise regardless of batch size.
            return {"pos": self.n}

        def partitions(self, start, end):
            return [
                SynthRange(lo, min(lo + self.chunk, end["pos"]))
                for lo in range(start["pos"], end["pos"], self.chunk)
            ]

        def read(self, partition):
            return iter(_rows(partition.lo, partition.hi))

        def commit(self, end):
            pass  # nothing to GC: the synthetic feed is stateless

    class SynthStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.chunk = int(options.get("chunk", 256))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            lo = start["pos"]
            hi = min(lo + self.chunk, self.n)
            return iter(_rows(lo, hi)), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return iter(_rows(start["pos"], end["pos"]))

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "dss_synth_stream"

        def schema(self):
            return "id long, mod97 long, tag string"

        def streamReader(self, schema):
            if self.options.get("mode") == "simple":
                # Raising the typed error routes pyspark's reader
                # selection to simpleStreamReader (datasource_internal
                # _streamReader's documented fallback).
                raise PySparkNotImplementedError(
                    errorClass="NOT_IMPLEMENTED",
                    messageParameters={"feature": "streamReader"},
                )
            return SynthStreamV2Reader(self.options)

        def simpleStreamReader(self, schema):
            return SynthStreamReader(self.options)

    spark.dataSource.register(SynthStreamSource)


def register_jsonl_sink(spark: SparkSession) -> None:
    """Register 'dss_jsonl': a Python data source WRITER (DataSource V2
    write path). Each task serializes its partition to one JSON-lines file
    executor-side and returns a commit message; the driver-side commit()
    publishes a manifest only after every task succeeded — the same
    two-phase contract that makes file sinks atomic at 1000-executor scale
    (no partial output visible on failure; abort() discards orphans).
    """
    import json
    import os
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class JsonlCommit(WriterCommitMessage):
        file: str
        n: int

    class JsonlWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, rows):
            os.makedirs(self.path, exist_ok=True)
            fn = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(fn, "w") as f:
                for r in rows:
                    f.write(json.dumps(r.asDict()) + "\n")
                    n += 1
            return JsonlCommit(fn, n)

        def commit(self, messages):
            manifest = {
                "files": sorted(
                    os.path.basename(m.file) for m in messages
                ),
                "rows": sum(m.n for m in messages),
            }
            with open(os.path.join(self.path, "_manifest.json"), "w") as f:
                json.dump(manifest, f)

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.file):
                    os.remove(m.file)

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "dss_jsonl"

        def writer(self, schema, overwrite: bool):
            return JsonlWriter(self.options, overwrite)

    spark.dataSource.register(JsonlSink)


def register_kafka_shaped_source(spark: SparkSession) -> None:
    """Register 'kafka_shaped': a Python data source emitting the EXACT
    schema and partitioning contract of Spark's Kafka batch source
    (key/value binary, topic, partition, offset, timestamp, timestampType),
    backed by a parquet file twin — no broker runs in this sandbox, so this
    wrapper pins the consumer-side code path a real ``format("kafka")``
    read would exercise: one Spark partition per Kafka partition (here:
    per ``sliceRows``-row slice of a parquet row group, so a single-file
    corpus still scans in parallel), monotone offsets from 0 within each
    partition, JSON payloads decoded with ``CAST(value AS STRING)`` +
    ``from_json``. Reads are Arrow-vectorized end to end (pandas to_json
    → RecordBatch yields — no per-row Python objects). Swapping the
    format string for "kafka" + bootstrap options (see ``kafka_config``)
    is the only change a live cluster needs.
    """
    import datetime  # noqa: F401 — epoch literal for null-ts corpora

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RowGroupPartition(InputPartition):
        def __init__(self, path: str, group: int, part_id: int,
                     lo: int, hi: int):
            self.path = path
            self.group = group
            self.part_id = part_id
            self.lo = lo
            self.hi = hi

    class KafkaShapedReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.topic = options.get("topic", "events")
            # Rows per emitted partition. A single-file corpus ships ONE
            # row group, which would otherwise serialize the whole scan
            # through one Python worker (the load_parallel lesson —
            # maxPartitionBytes can't split inside a row group either).
            # Slicing the group into row ranges fans the decode across
            # workers; each slice presents as its own Kafka partition
            # (ids dense, offsets 0..len-1 within each — the contract is
            # about shape, not about how the broker sharded the topic).
            self.slice_rows = int(options.get("sliceRows", 16384))

        def partitions(self):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(self.path)
            parts = []
            for g in range(pf.num_row_groups):
                rows = pf.metadata.row_group(g).num_rows
                for lo in range(0, max(rows, 1), self.slice_rows):
                    parts.append(
                        RowGroupPartition(
                            self.path, g, len(parts),
                            lo, min(lo + self.slice_rows, rows),
                        )
                    )
            return parts

        def read(self, partition):
            # Arrow-vectorized with EXACT per-dtype serialization: ints
            # serialize via an Arrow int→string cast (never through
            # float64 — a pandas to_pandas on a nullable int column would
            # emit 7.0 and null whole from_json structs), doubles and
            # strings via json.dumps (shortest-round-trip repr for
            # finite doubles — unlike pandas to_json's 15-digit cap —
            # NaN/Infinity extension tokens for non-finite, \u escaping
            # for strings), timestamps via an Arrow µs-int64 cast with
            # nulls preserved as JSON null (NOT the int64 NaT
            # sentinel). The only per-row Python
            # is repr/json.dumps over the float and string columns; the
            # old per-row dict+json.dumps+pickle loop was a 2.4 s floor
            # at sf0.1. Yielding RecordBatches hands Spark the columns
            # Arrow-native instead of re-pickling tuples.
            import json as _json

            import pandas as pd
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tbl = (
                pq.ParquetFile(partition.path)
                .read_row_group(partition.group)
                .slice(partition.lo, partition.hi - partition.lo)
            )
            n = tbl.num_rows
            # serialized field name per column: timestamps rename to
            # '<name>_us'; a duplicate in the RENAMED namespace (e.g. a
            # non-timestamp column literally named 'ts_us' next to
            # timestamp 'ts') would silently clobber — fail loudly. A
            # 'ts_us' that is ITSELF a timestamp renames to 'ts_us_us'
            # and does not collide.
            out_names = [
                name + "_us" if pa.types.is_timestamp(col.type) else name
                for name, col in zip(tbl.schema.names, tbl.columns)
            ]
            dup = {nm for nm in out_names if out_names.count(nm) > 1}
            if dup:
                raise ValueError(
                    f"serialized field name collision {sorted(dup)!r} "
                    f"between a timestamp '_us' rename and an existing "
                    f"column"
                )
            fields: dict[str, object] = {}
            ts_src = None
            for out, (name, col) in zip(
                out_names, zip(tbl.schema.names, tbl.columns)
            ):
                if pa.types.is_timestamp(col.type):
                    # exact integer micros (float total_seconds() loses
                    # sub-µs precision at 2026 epochs); safe=False keeps
                    # the legacy truncating behavior for ns-precision
                    # sources instead of raising ArrowInvalid
                    fields[out] = col.cast(
                        pa.timestamp("us"), safe=False
                    ).cast(pa.int64())
                    if name == "ts":
                        ts_src = col
                else:
                    fields[out] = col
            # Sorted keys ≙ json.dumps(sort_keys=True) key order.
            value_ser = None
            for key in sorted(fields):
                col = fields[key]
                if pa.types.is_integer(col.type):
                    sv = pd.Series(
                        col.cast(pa.string()).to_pylist(), dtype="object"
                    ).fillna("null")
                else:
                    # floats and strings both serialize correctly through
                    # json.dumps: shortest-round-trip repr for finite
                    # doubles (unlike pandas to_json's 15-digit cap),
                    # NaN/Infinity extension tokens for non-finite, \u
                    # escaping for strings
                    sv = pd.Series(
                        [
                            "null" if v is None else _json.dumps(v)
                            for v in col.to_pylist()
                        ],
                        dtype="object",
                    )
                # json.dumps(key) escapes quotes/backslashes/non-ASCII in
                # column names exactly like the legacy sort_keys serializer
                piece = _json.dumps(key) + ":" + sv
                value_ser = (
                    piece if value_ser is None else value_ser + "," + piece
                )
            if value_ser is None:
                # zero-column slice: every row serializes to the empty object
                values = ["{}"] * n
            else:
                values = ("{" + value_ser + "}").tolist()
            if "user_id" in fields:
                keys = pc.fill_null(
                    fields["user_id"].cast(pa.string()), "None"
                )
            else:
                keys = pa.array([str(i) for i in range(n)], pa.string())
            if ts_src is None:
                ts_arr = pa.array(
                    [datetime.datetime(1970, 1, 1)] * n,
                    pa.timestamp("us"),
                )
            else:
                ts_arr = pc.fill_null(
                    ts_src.cast(pa.timestamp("us"), safe=False),
                    pa.scalar(
                        datetime.datetime(1970, 1, 1), pa.timestamp("us")
                    ),
                )
            def _flat(arr):
                # RecordBatch.from_arrays needs Arrays; parquet columns
                # arrive as (single-chunk) ChunkedArrays
                return (
                    arr.combine_chunks()
                    if isinstance(arr, pa.ChunkedArray)
                    else arr
                )

            yield pa.RecordBatch.from_arrays(
                [
                    _flat(keys.cast(pa.binary())),
                    pa.array(values, pa.string()).cast(pa.binary()),
                    pa.array([self.topic] * n, pa.string()),
                    pa.array([partition.part_id] * n, pa.int32()),
                    pa.array(range(n), pa.int64()),
                    _flat(ts_arr),
                    pa.array([0] * n, pa.int32()),  # CREATE_TIME
                ],
                names=[
                    "key", "value", "topic", "partition", "offset",
                    "timestamp", "timestampType",
                ],
            )

    class KafkaShapedSource(DataSource):
        @classmethod
        def name(cls):
            return "kafka_shaped"

        def schema(self):
            return (
                "key BINARY, value BINARY, topic STRING, partition INT,"
                " offset BIGINT, timestamp TIMESTAMP, timestampType INT"
            )

        def reader(self, schema):
            return KafkaShapedReader(self.options)

    spark.dataSource.register(KafkaShapedSource)


def register_rest_paged_source(spark: SparkSession) -> None:
    """Register 'dss_rest_paged': a REST-pagination-SHAPED batch source —
    the connector pattern for a paginated HTTP API (offset/limit or
    page-token), with the fetch step replaced by a deterministic local
    response builder (this sandbox has no network; the PLUMBING — one
    InputPartition per page so pages fetch in parallel, a short last
    page, a JSON response body parsed executor-side — is the real
    contract a production REST reader needs).

    Page planning happens on the driver from (n, page_size) exactly the
    way a real connector derives it from a count endpoint or a
    Link/next-token probe; each task then "fetches" ONLY its page and
    parses the body with the stdlib json parser, so per-record values
    round-trip through an actual serialized payload rather than being
    fabricated post-parse.
    """
    import json

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RestPagedReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.page_size = int(options.get("page_size", 88))

        def partitions(self):
            pages = (self.n + self.page_size - 1) // self.page_size
            return [InputPartition(p) for p in range(pages)]

        def read(self, partition):
            import pyarrow as pa

            page = partition.value
            lo = page * self.page_size
            hi = min(lo + self.page_size, self.n)
            # Simulated GET /records?offset={lo}&limit={page_size}:
            # build the body a REST API would return, then PARSE it —
            # the parse path (not the fabrication) feeds the rows.
            body = json.dumps(
                [{"id": i, "v": (i * 7) % 13} for i in range(lo, hi)]
            )
            recs = json.loads(body)
            yield pa.record_batch(
                {
                    "rec_id": pa.array([r["id"] for r in recs], pa.int64()),
                    "page": pa.array([page] * len(recs), pa.int64()),
                    "v": pa.array([r["v"] for r in recs], pa.int64()),
                    "payload_chars": pa.array(
                        [
                            len(json.dumps({"id": r["id"], "v": r["v"]}))
                            for r in recs
                        ],
                        pa.int64(),
                    ),
                }
            )

    class RestPagedSource(DataSource):
        @classmethod
        def name(cls):
            return "dss_rest_paged"

        def schema(self):
            return "rec_id long, page long, v long, payload_chars long"

        def reader(self, schema):
            return RestPagedReader(self.options)

    spark.dataSource.register(RestPagedSource)

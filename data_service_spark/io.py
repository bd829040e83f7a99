"""Source/sink helpers over the test corpus.

The corpus (TESTDATA.md) is one parquet file per table under a scale-factor
directory. Loading is always ``spark.read.parquet`` — schema travels with the
file, Catalyst gets pushdown/pruning for free, and at cluster scale the same
call transparently reads a multi-file partitioned dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. ``name`` must be in TABLES.

    ``events.ts`` has shipped as both parquet TIMESTAMP(MICROS) and
    TIMESTAMP(NANOS) across corpus generations. Spark 4.x rejects NANOS
    outright (PARQUET_TYPE_ILLEGAL) unless the legacy ``nanosAsLong`` conf
    is on, in which case the column arrives as raw int64 nanos. Rather than
    pinning one corpus shape, adapt to what the footer actually says: read,
    and if the read fails on the nanos type, enable the conf for this
    session and retry; if ``ts`` then arrives as a long, rebuild a
    TimestampType column at µs precision — the same truncation DuckDB
    applies, so oracle parity holds. All of this is schema-resolution-time
    work plus (at most) one distributed projection; no driver roundtrip.

    The conf is only turned on when the corpus actually needs it, so a
    µs-precision corpus never observes the legacy flag (a nanos source in
    the same session would otherwise silently come back as raw longs).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        path = f"{sf_dir}/events.parquet"
        try:
            df = spark.read.parquet(path)
        except Exception:
            # NANOS corpus with the legacy flag off: enable and retry.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_parallel(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """``load`` + hash-repartition on ``key`` for fan-out pipelines.

    The corpus ships one parquet file per table with a single row group, so
    a scan yields ONE partition no matter how many cores exist —
    ``maxPartitionBytes`` can't split inside a row group. Any operator that
    fans each row out (shingling, per-token explode, per-vector hashing)
    would then run its whole map side on one core. One small shuffle of the
    pre-fan-out rows buys full parallelism for everything downstream. At
    cluster scale a real multi-file table already arrives parallel and this
    repartition is a no-op-sized pass that also co-locates by ``key``.

    The partition count is EXPLICIT: AQE coalesces a bare
    ``repartition(col)`` back to one partition when the bytes are small —
    exactly wrong here, where per-row downstream CPU (hashing, shingling),
    not input bytes, is the cost. An explicit count pins the exchange.
    """
    n = spark.sparkContext.defaultParallelism
    return load(spark, sf_dir, name).repartition(n, F.col(key))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all corpus tables as temp views for ``spark.sql`` entry points."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# Per-key batches of uuid-suffixed managed-table names created by builders
# that write the session catalog (see registry.EFFECTFUL). Keeping the last
# few batches alive (instead of dropping the previous batch eagerly) leaves
# a window for concurrent invocations of the same key that are still
# consuming their result before the names age out of the GC ring.
_TABLE_GC: dict[str, list[list[str]]] = {}
_TABLE_GC_KEEP = 4


def fresh_tables(spark: SparkSession, key: str, *basenames: str) -> list[str]:
    """Per-invocation uuid-suffixed catalog table names for effectful
    builders — two concurrent invocations (service /query threads, the
    bench re-time loop) can never race on a shared table name the way the
    fixed ``dss_*`` names could. Older batches beyond the last
    ``_TABLE_GC_KEEP`` are dropped here (self-GC), so repeated calls do
    not leak warehouse space; DROP TABLE on a managed table removes its
    directory, so no rmtree on config-derived paths is needed (the uuid
    name also cannot collide with a leftover dir from a crashed run —
    the reason the old fixed-name preamble had to rmtree at all)."""
    import uuid

    names = [f"{b}_{uuid.uuid4().hex[:12]}" for b in basenames]
    batches = _TABLE_GC.setdefault(key, [])
    batches.append(names)
    while len(batches) > _TABLE_GC_KEEP:
        for tbl in batches.pop(0):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            except Exception:  # noqa: BLE001 — GC must never sink a query
                pass
    return names

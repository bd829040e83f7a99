"""Hive-metastore catalog roundtrip, run in its own process.

``spark.sql.catalogImplementation`` is a STATIC conf: a bare driver-owned
session (in-memory catalog) cannot flip to the Hive catalog in-process, so
the persistent-catalog path runs in a child process that builds its own
``enableHiveSupport()`` session against a local Derby metastore. The child
does the real thing — ``saveAsTable`` into the warehouse, ``ANALYZE TABLE``
with stats landing in the metastore, ``spark.table`` readback — and hands
the result to the caller as parquet. On a cluster the same code runs
in-session because the session is built hive-enabled from the start.

Usage: python -m data_service_spark.hive_roundtrip <warehouse> <metastore>
         <src_parquet> <handoff_dir> [--read-only]

``--read-only`` skips the write and only reads ``spark.table`` — a second
invocation with it proves the catalog entry PERSISTED across processes
(tests/test_sources.py drives both phases).
"""

from __future__ import annotations

import sys

TABLE = "dss.region_hive"


def main(argv: list[str]) -> None:
    from pyspark.sql import SparkSession

    wh, metastore, src, handoff = argv[:4]
    read_only = "--read-only" in argv[4:]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("dss-hive-roundtrip")
        .config("spark.sql.warehouse.dir", wh)
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore};create=true",
        )
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
    if not read_only:
        df = spark.read.parquet(src)
        spark.sql("CREATE DATABASE IF NOT EXISTS dss")
        df.write.mode("overwrite").saveAsTable(TABLE)
        spark.sql(f"ANALYZE TABLE {TABLE} COMPUTE STATISTICS")
    # stats must be readable back out of the metastore
    described = spark.sql(f"DESCRIBE EXTENDED {TABLE}").collect()
    stats = [r.data_type for r in described if r.col_name == "Statistics"]
    if not (stats and "rows" in stats[0]):
        raise SystemExit(f"ANALYZE stats missing from metastore: {stats}")
    spark.table(TABLE).write.mode("overwrite").parquet(handoff)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])

"""Benchmark runner — one warm SparkSession, every registered query timed at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {key: sec, ...}, "sf": ...}

Each query is materialized through the noop sink (full computation, no
driver collect, no result pruning — a bare count() would let Catalyst drop
computed columns). Session is shared across keys (SURVEY.md §6: per-query
JVM startup would dominate at sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_service_spark.registry import QUERIES, load_all
from data_service_spark.session import get_spark


def main() -> None:
    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    keys = sorted(QUERIES)
    only = sys.argv[1:]
    if only:
        keys = [k for k in keys if k in only]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file-listing caches once so per-key timings measure the
    # query, not session bring-up.
    QUERIES["a_scan_prune"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for key in keys:
        t0 = time.perf_counter()
        try:
            QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[key] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one bad key must not sink the whole run
            failures[key] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "wallclock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **({"failures": failures} if failures else {}),
            }
        )
    )


if __name__ == "__main__":
    main()

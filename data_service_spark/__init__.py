"""data_service_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference service `wangpy1995/data-service` (a Spark-SQL
based web service integrating multiple data sources; see SURVEY.md §0 — the
reference checkout at /root/reference was empty at survey time, so parity is
defined by SURVEY.md §2's operator inventory rather than file:line citations).

Layout:
    session.py        SparkSession factory (AQE + Arrow on, tuned local mode)
    io.py             table loading helpers over the parquet corpus
    registry.py       query/oracle registration (the driver contract)
    queries/          one module per SURVEY.md §2 category (A..K)
    streaming/        Structured Streaming operators (pytest-verified)
    service/          REST layer: POST /sql -> JSON rows (reference parity)
"""

from data_service_spark.registry import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register"]
__version__ = "0.1.0"

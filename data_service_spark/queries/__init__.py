"""Import every category module so @register side effects populate the
registry. Order mirrors SURVEY.md §2 (A..K)."""

from data_service_spark.queries import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
    scalars,
    streaming_batch,
    udfs,
    llm,
    llm_text,
    tpch,
    training,
    linalg,
    metrics,
    corpus_stats,
    graph,
    monitoring,
    sketches,
    inference,
)

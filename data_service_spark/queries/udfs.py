"""§2.J — UDF / UDAF / UDTF surface.

UDFs are the slow path (JVM↔Python boundary); the point of this category is
that the *plumbing* is right, not that UDFs are preferred: each op has a
pure-SQL twin the oracle hashes. Hierarchy demonstrated here, fastest first:
pandas UDFs (Arrow-batched, j_pandas_*) ≫ row-at-a-time Python UDFs
(j_udf_scalar, kept deliberately tiny). Rounding is applied Spark-side
(F.round, HALF_UP) — never inside pandas (numpy rounds half-even).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from data_service_spark.io import load
from data_service_spark.registry import register


@register(
    "j_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket
    FROM orders
    """,
)
def j_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-at-a-time Python UDF — the anti-pattern kept as surface coverage.
    @F.udf(returnType=StringType())
    def bucket(price: float) -> str:
        if price < 100000:
            return "low"
        if price < 300000:
            return "mid"
        return "high"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", bucket("o_totalprice").alias("bucket"))


@register(
    "j_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem
    """,
)
def j_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched Series->Series — the right way to run Python per-row math.
    # Deliberately UNROUNDED: per-row IEEE products are bitwise identical
    # across pandas/JVM/DuckDB, while round() itself diverges on half-boundary
    # values (Spark rounds the shortest decimal repr, DuckDB the binary value
    # — e.g. 37081.645 → .65 vs .64). Rounding here would *introduce*
    # mismatches. Only multi-row sums need rounding (SURVEY.md §7.4.1).
    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net"),
    )


@register(
    "j_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_discount * l_quantity) / sum(l_quantity), 4) AS wavg_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def j_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-agg pandas UDF (Series -> scalar inside .agg).
    @F.pandas_udf("double")
    def wavg(discount: pd.Series, qty: pd.Series) -> float:
        return float((discount * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_discount", "l_quantity"), 4).alias("wavg_disc")
    )


@register(
    "j_grouped_map",
    oracle="""
    -- + 0.0 canonicalizes IEEE -0.0 (DuckDB round of a tiny negative)
    SELECT o_orderkey, round((o_totalprice - m) / sd, 4) + 0.0 AS z FROM (
      SELECT o_orderkey, o_totalprice,
             avg(o_totalprice) OVER (PARTITION BY o_custkey) AS m,
             stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey) AS sd,
             count(*) OVER (PARTITION BY o_custkey) AS n
      FROM orders)
    WHERE n >= 2 AND sd > 0
    """,
)
def j_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-map applyInPandas: per-customer z-score of order price.
    # Single-order customers (sd undefined) are dropped on both sides so no
    # NaN-vs-NULL hash ambiguity exists.
    #
    # Grouping key is a BUCKET of customers (pmod 256), not the raw custkey:
    # per-group Python dispatch costs ~1ms, so 100k tiny groups would spend
    # 10×  longer in overhead than in math. Each bucket arrives as one Arrow
    # batch and the per-customer stats vectorize via pandas groupby.transform
    # inside it — same result, 256 dispatches instead of |customers|, and at
    # 100 TB the bucket count scales with the cluster, bounding batch memory.
    def zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("o_custkey")["o_totalprice"]
        m = g.transform("mean")
        sd = g.transform("std")  # ddof=1 == stddev_samp
        n = g.transform("size")
        keep = (n >= 2) & (sd > 0)
        return pd.DataFrame(
            {
                "o_orderkey": pdf.loc[keep, "o_orderkey"],
                "z": (pdf.loc[keep, "o_totalprice"] - m[keep]) / sd[keep],
            }
        )

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    raw = o.groupBy(F.pmod("o_custkey", F.lit(256))).applyInPandas(
        zscore_bucket, "o_orderkey long, z double"
    )
    # + 0.0: canonicalize IEEE -0.0 so both engines hash identically
    return raw.select("o_orderkey", (F.round("z", 4) + F.lit(0.0)).alias("z"))


@register(
    "j_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity > 45
    """,
)
def j_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partition-wise iterator transform — the shape used for batch scoring /
    # model inference at scale (one Arrow batch in, one out, bounded memory).
    # Column pruning does NOT push through mapInPandas (the function is a
    # black box to the optimizer), so the projection must sit BEFORE the
    # Arrow boundary: ship the 3 columns the function touches, not all 16.
    def keep_bulk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf[pdf["l_quantity"] > 45]

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.mapInPandas(
        keep_bulk, "l_orderkey long, l_linenumber int, l_quantity double"
    )


@register(
    "j_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word,
           CAST(len(unnest(string_split(text, ' '))) AS INTEGER) AS wlen
    FROM documents
    """,
)
def j_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF (Spark 4.x): one input row -> N output rows, used via
    # LATERAL join in SQL — the table-function entry point of the engine.
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, wlen int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:  # null-tolerant like the SQL-side operators
                return
            for w in text.split(" "):
                yield w, len(w)

    spark.udtf.register("dss_split_words", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("dss_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.wlen
        FROM dss_docs_udtf d, LATERAL dss_split_words(d.text) t
        """
    )


@register(
    "j_cogroup",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS k, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS sum_orders
      FROM orders GROUP BY o_custkey
    ), e AS (
      SELECT user_id AS k, count(*) AS n_events,
             round(sum(value), 2) AS sum_events
      FROM events GROUP BY user_id
    )
    SELECT coalesce(o.k, e.k) AS k,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(sum_orders, 0.0) AS sum_orders,
           coalesce(n_events, 0) AS n_events,
           coalesce(sum_events, 0.0) AS sum_events
    FROM o FULL OUTER JOIN e ON o.k = e.k
    """,
)
def j_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: both sides grouped on the key, each
    (orders-group, events-group) pair lands in one Python call — the API
    for custom merge logic (feature joins, interval alignment) that plain
    SQL joins can't express. Here the merge is deliberately SQL-expressible
    so the oracle can hash it. Arrives pre-shuffled per key; at 100 TB the
    cost is the same single co-partitioned shuffle as a join.
    """
    from data_service_spark.io import load as _load

    o = _load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )
    e = _load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "value"
    )

    # Cogroup on a key BUCKET (pmod 64), not the raw key — same rationale as
    # j_grouped_map: per-call dispatch would dominate with one call per
    # customer; per-key merge logic vectorizes inside the bucket.
    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lo = (
            left.groupby("k")["o_totalprice"].agg(["size", "sum"])
            if len(left)
            else pd.DataFrame(columns=["size", "sum"])
        )
        ro = (
            right.groupby("k")["value"].agg(["size", "sum"])
            if len(right)
            else pd.DataFrame(columns=["size", "sum"])
        )
        m = lo.join(ro, how="outer", lsuffix="_o", rsuffix="_e").fillna(0)
        return pd.DataFrame(
            {
                "k": m.index.astype("int64"),
                "n_orders": m["size_o"].astype("int64"),
                "sum_orders": m["sum_o"],
                "n_events": m["size_e"].astype("int64"),
                "sum_events": m["sum_e"],
            }
        )

    bucket = lambda df: df.groupby(F.pmod("k", F.lit(64)))  # noqa: E731
    raw = bucket(o).cogroup(bucket(e)).applyInPandas(
        merge,
        "k long, n_orders long, sum_orders double, n_events long, sum_events double",
    )
    # Round Spark-side per the module convention (pandas rounds half-even).
    return raw.select(
        "k",
        "n_orders",
        F.round("sum_orders", 2).alias("sum_orders"),
        "n_events",
        F.round("sum_events", 2).alias("sum_events"),
    )


@register(
    "j_sql_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def j_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`):
    the function body is pure SQL, so unlike Python UDFs Catalyst INLINES it
    — the plan is identical to writing the expression by hand (whole-stage
    codegen, pushdown, no Python worker). The right tool whenever a "UDF"
    is really just a reusable expression; the oracle states the inlined
    form, proving the equivalence.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_revenue(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_revenue(l_extendedprice, l_discount)), 2)
                 AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "j_pandas_on_spark",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    WHERE n_chars > 50
    GROUP BY lang, source
    """,
)
def j_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``): pandas idioms —
    boolean-mask filter, groupby-agg, reset_index — compile to the same
    Catalyst plans as DataFrame code, giving pandas users the whole engine
    without a rewrite. ``to_spark()`` hands the logical plan back (no
    materialization), so the result behaves like any other DataFrame here.
    Distributed by construction: nothing collects to the driver; the
    groupby is one hash shuffle like its SQL twin.
    """
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        psdf = ps.DataFrame(load(spark, sf_dir, "documents"))
        out = (
            psdf[psdf.n_chars > 50]
            .groupby(["lang", "source"])
            .agg(
                n_docs=("doc_id", "count"),
                total_chars=("n_chars", "sum"),
                avg_chars=("n_chars", "mean"),
            )
            .reset_index()
        )
        sdf = out.to_spark()
    return sdf.select(
        "lang",
        "source",
        F.col("n_docs").cast("long"),
        F.col("total_chars").cast("long"),
        F.round("avg_chars", 2).alias("avg_chars"),
    )


@register(
    "j_udtf_analyze",
    oracle="""
    SELECT doc_id,
           list_aggr(words[1:3], 'string_agg', ' ') AS gram_3,
           CAST(3 AS INTEGER) AS width
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    WHERE len(words) >= 3
    """,
)
def j_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF (Spark 4 ``analyze()``): the output schema is
    COMPUTED at plan time from the constant argument — here the leading
    n-gram width names its own column (``gram_3``), the pattern for
    table functions whose shape depends on configuration (pivot-like
    expanders, configurable feature extractors). ``analyze`` runs once on
    the driver during resolution; per-row ``eval`` stays a plain
    generator, executed in parallel LATERAL fan-out like any UDTF.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType

    class LeadingGram:
        @staticmethod
        def analyze(text, n):
            width = int(n.value)
            return AnalyzeResult(
                StructType()
                .add(f"gram_{width}", StringType())
                .add("width", IntegerType())
            )

        def eval(self, text: str, n: int):
            if text is None:
                return
            words = text.split(" ")
            if len(words) >= n:
                yield " ".join(words[:n]), n

    from pyspark.sql.udtf import AnalyzeResult

    spark.udtf.register("dss_leading_gram", udtf(LeadingGram))
    load(spark, sf_dir, "documents").createOrReplaceTempView("dss_docs_gram")
    return spark.sql(
        """
        SELECT d.doc_id, t.gram_3, t.width
        FROM dss_docs_gram d, LATERAL dss_leading_gram(d.text, 3) t
        """
    )


@register(
    "j_udf_arrow",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           upper(substr(text, 1, 8)) AS head
    FROM documents
    """,
)
def j_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 ``useArrow=True``): same
    def-a-function ergonomics as a classic row UDF, but arguments arrive
    as Arrow-backed batches — serialization drops from pickle-per-row to
    columnar buffers (the ~10× middle ground between legacy UDFs and
    hand-vectorized pandas UDFs). The Python body is still per-row logic;
    only the transport changed, which is exactly the migration story for
    a codebase full of legacy UDFs.
    """
    from pyspark.sql.functions import udf

    n_words = udf(
        lambda t: len(t.split(" ")) if t is not None else None,
        "long",
        useArrow=True,
    )
    head = udf(
        lambda t: t[:8].upper() if t is not None else None,
        "string",
        useArrow=True,
    )
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_words("text").alias("n_words"),
        head("text").alias("head"),
    )


@register(
    "j_map_in_arrow",
    oracle="""
    SELECT event_id, round(value * value, 4) AS value_sq,
           CAST(len(event_type) AS INTEGER) AS type_len
    FROM events
    """,
)
def j_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: partition-at-a-time transform over raw
    ``pyarrow.RecordBatch``es — the zero-copy floor of the Python
    boundary (no pandas materialization at all), where columnar kernels
    (pyarrow.compute, numpy over buffers) run at C speed. The batch shape
    is what a custom columnar codec / tensor packer would consume.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for b in it:
            value = b.column("value")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    pc.multiply(value, value),
                    pc.cast(
                        pc.utf8_length(b.column("event_type")), pa.int32()
                    ),
                ],
                names=["event_id", "value_sq", "type_len"],
            )

    e = load(spark, sf_dir, "events").select("event_id", "value", "event_type")
    out = e.mapInArrow(
        batches, "event_id long, value_sq double, type_len int"
    )
    # Round JVM-side: pyarrow's round is bit-different from SQL ROUND on
    # doubles (half-to-even over binary representations), so the kernel
    # emits the raw product and the engine's own round keeps oracle parity.
    return out.select(
        "event_id", F.round("value_sq", 4).alias("value_sq"), "type_len"
    )


@register(
    "j_apply_in_arrow",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS vmin, round(max(value), 2) AS vmax,
           round(max(value) - min(value), 2) AS vrange
    FROM events GROUP BY event_type
    """,
)
def j_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInArrow``: grouped map over raw Arrow tables —
    the zero-pandas sibling of ``j_grouped_map`` (one pyarrow.Table in,
    one out per group). The right boundary when the per-group kernel is
    columnar math (pyarrow.compute / numpy), not row-wise logic: no
    pandas conversion cost on either side. Each group lands on one task
    after the usual single hash shuffle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_group(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value")
        vmin = pc.min(v).as_py()
        vmax = pc.max(v).as_py()
        return pa.table(
            {
                "event_type": [tbl.column("event_type")[0].as_py()],
                "n": pa.array([tbl.num_rows], pa.int64()),
                "vmin": pa.array([round(vmin, 2)], pa.float64()),
                "vmax": pa.array([round(vmax, 2)], pa.float64()),
                "vrange": pa.array([round(vmax - vmin, 2)], pa.float64()),
            }
        )

    e = load(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(
        per_group,
        "event_type string, n long, vmin double, vmax double, vrange double",
    )


@register(
    "j_udf_iterator",
    oracle="""
    SELECT doc_id,
           CAST(length(text) * 2 + 7 AS BIGINT) AS scored
    FROM documents
    """,
)
def j_udf_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Iterator[pd.Series] -> Iterator[pd.Series] pandas UDF: the
    # model-amortization shape. The expensive initialization (here a stand-in
    # "model" tuple; in production a tokenizer/ONNX session/embedding model)
    # runs ONCE PER PYTHON WORKER, then every Arrow batch reuses it — the
    # difference between loading a 2 GB model per batch and per executor,
    # i.e. the only viable way to run model inference UDFs at 100 TB.
    def scorer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weight, bias = 2, 7  # <- init cost paid once per worker
        for s in batches:
            yield s.str.len() * weight + bias

    score = F.pandas_udf(scorer, "long")
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", score("text").alias("scored"))


@register(
    "j_pandas_udaf_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(avg(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS roll_avg
    FROM orders WHERE o_custkey % 20 = 0
    """,
)
def j_pandas_udaf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-agg pandas UDF evaluated OVER a bounded window frame — the
    # third place a UDAF can run (after groupBy().agg and SQL agg): Spark
    # slices the frame PER ROW and ships each slice through Arrow — a
    # deliberate anti-pattern surface (one Arrow batch per output row). The
    # input is capped to a deterministic 5% customer slice so the plumbing
    # is pinned without paying the per-row Arrow tax on the full table; the
    # built-in avg twin is what production uses (and what the oracle hashes).
    from pyspark.sql.window import Window

    @F.pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    o = load(spark, sf_dir, "orders").filter("o_custkey % 20 = 0")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(pmean("o_totalprice").over(w), 4).alias("roll_avg"),
    )


@register(
    "j_udtf_table_arg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
             AS value_cents4,
           CAST(min(event_id) AS BIGINT) AS first_event_id
    FROM events GROUP BY event_type
    """,
)
def j_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument and PARTITION BY (Spark 4.x
    table-function calling convention, SPARK-44503): the function
    receives each ``event_type`` partition as a row stream, folds state
    across ``eval`` calls, and emits one summary row from
    ``terminate()`` — the UDTF-side equivalent of
    ``applyInPandas``-grouped processing, and the surface a SQL-first
    user reaches for windowless custom aggregation
    (``SELECT * FROM f(TABLE(t) PARTITION BY k)``). State is integer
    (counts + 1e-4-cent value mass), so the summary hash-matches the
    plain GROUP BY oracle exactly.

    Scale shape: the TABLE argument hash-partitions on the PARTITION BY
    key exactly like a groupBy — one shuffle, per-partition Python
    state, Arrow row transport. Per-row cost is the floor (r08 A/B at
    sf0.1): positional row access reads 2.2 s vs 2.65 s for named-field
    lookups, while `spark.sql.execution.pythonUDTF.arrow.enabled` is a
    measured 3.7× REGRESSION on this row-at-a-time eval (9.7 s — the
    arrow path's per-row materialization costs more than the pickled
    Row it replaces) — left off."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "event_type string, n long, value_cents4 long, first_event_id long"
    ))
    class TypeSummary:
        def __init__(self) -> None:
            self._key = None
            self._n = 0
            self._cents = 0
            self._first = None

        def eval(self, row) -> None:
            # positional: (event_type, event_id, value) per the TABLE arg
            self._key = row[0]
            self._n += 1
            self._cents += int(round(row[2] * 10000))
            eid = row[1]
            if self._first is None or eid < self._first:
                self._first = eid

        def terminate(self):
            if self._key is not None:
                yield self._key, self._n, self._cents, self._first

    spark.udtf.register("dss_type_summary", TypeSummary)
    load(spark, sf_dir, "events").createOrReplaceTempView("dss_events_udtf")
    return spark.sql(
        """
        SELECT * FROM dss_type_summary(
          TABLE(SELECT event_type, event_id, value FROM dss_events_udtf)
          PARTITION BY event_type
        )
        """
    )
